"""Training orchestration: loops, metrics, schedules, checkpoints, runner."""
