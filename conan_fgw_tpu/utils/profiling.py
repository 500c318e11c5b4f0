"""Profiling and step-timing utilities.

The reference's only instrumentation is a Lightning ``Timer`` callback and
ad-hoc per-batch solver CSVs (``dimenet.py:314-331``). Here: a ``jax.profiler``
trace context for TensorBoard-compatible device traces, a lightweight step
timer with percentile summaries, and per-batch phase logging to CSV.
"""

from __future__ import annotations

import contextlib
import csv
import os
import time

import numpy as np


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/XProf."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with summary statistics."""

    def __init__(self, skip_first: int = 1):
        self.times: list[float] = []
        self.skip_first = skip_first
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        t = np.asarray(self.times[self.skip_first :] or self.times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "max_s": float(t.max()),
        }


class PhaseCSVLogger:
    """Append per-step phase timings to a CSV (the DimeNet runtime-log analog)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._wrote_header = os.path.exists(path)

    def log(self, row: dict):
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            if not self._wrote_header:
                w.writeheader()
                self._wrote_header = True
            w.writerow(row)
