"""Logging, run-aggregation, and timing utilities."""
