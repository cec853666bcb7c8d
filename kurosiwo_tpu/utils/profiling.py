"""Profiling / tracing hooks.

Reference has only ad-hoc wall-clock accumulation (train_mae.py:56-63) and an
uncalled print_model_stats helper (convlstm.py:12-26). TPU-native upgrade:
  * jax.profiler trace capture around N steps (XPlane, viewable in
    TensorBoard's profiler or xprof);
  * a StepTimer that reports step time and patches/sec/chip — the
    north-star metric — with correct device synchronization (on the axon
    tunnel, block_until_ready can return early; we force a host fetch);
  * param/FLOP accounting for model cards.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/kurosiwo_trace"):
    """Capture a jax.profiler trace for everything inside the block."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def sync(x) -> float:
    """Force real device completion by fetching a scalar to host."""
    return float(jnp.asarray(x).reshape(-1)[0])


class StepTimer:
    """Rolling step-time / throughput tracker."""

    def __init__(self, batch_size: int, num_chips: int = 1, window: int = 50):
        self.batch_size = batch_size
        self.num_chips = max(num_chips, 1)
        self.window = window
        self._times: list[float] = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            sync(sync_value)
        dt = time.perf_counter() - self._last
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    @property
    def mean_step_time(self) -> float:
        return float(np.mean(self._times)) if self._times else 0.0

    @property
    def patches_per_sec_per_chip(self) -> float:
        t = self.mean_step_time
        return self.batch_size / t / self.num_chips if t > 0 else 0.0

    def summary(self) -> dict:
        return {
            "mean_step_time_s": self.mean_step_time,
            "patches_per_sec_per_chip": self.patches_per_sec_per_chip,
            "steps_measured": len(self._times),
        }


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def param_bytes(params) -> int:
    return sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in jax.tree.leaves(params))


def model_stats(params, batch_stats=None) -> dict:
    """print_model_stats parity (convlstm.py:12-21), TPU flavor."""
    stats = {
        "num_params": count_params(params),
        "param_bytes": param_bytes(params),
    }
    if batch_stats:
        stats["num_batch_stats"] = count_params(batch_stats)
    for dev in jax.local_devices():
        ms = getattr(dev, "memory_stats", None)
        if callable(ms):
            m = ms() or {}
            stats[f"{dev.id}_bytes_in_use"] = m.get("bytes_in_use")
            stats[f"{dev.id}_peak_bytes"] = m.get("peak_bytes_in_use")
    return stats
