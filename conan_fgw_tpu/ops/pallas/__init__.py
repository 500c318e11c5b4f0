"""Pallas TPU kernels for ops where XLA fusion leaves bandwidth on the table."""
