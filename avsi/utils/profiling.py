"""Profiling / tracing hooks (the reference has none — SURVEY.md §5).

Two tools:
  * `trace(logdir)` context manager around `jax.profiler` — produces a
    TensorBoard-compatible device trace of the jitted steps;
  * `StepTimer` — cheap wall-clock accounting with percentile summary,
    used by the training loop and bench.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self._times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "p99_s": float(np.percentile(arr, 99)),
        }
