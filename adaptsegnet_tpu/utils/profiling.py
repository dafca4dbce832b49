"""Step timing + jax.profiler trace hooks (reference has none — SURVEY §5.1)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


class StepTimer:
    """Wall-clock per-step timing with warmup discard and percentiles."""

    def __init__(self, warmup: int = 2):
        self._warmup = warmup
        self._times: list[float] = []
        self._seen = 0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self._warmup:
            self._times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self._times)) if self._times else float("nan")

    @property
    def p50(self) -> float:
        return float(np.median(self._times)) if self._times else float("nan")

    @property
    def best(self) -> float:
        return float(np.min(self._times)) if self._times else float("nan")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
