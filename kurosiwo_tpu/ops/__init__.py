"""Shared compute ops: losses, metrics, LR schedules, optimizers, nn helpers,
and Pallas TPU kernels for the hot paths."""
