"""Profiling / observability helpers (absent in the reference, which only
uses ad-hoc time.time() in demos — SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with warmup discard and simple stats.

    On async runtimes call ``mark`` with a value you've forced to host
    (e.g. float(loss)) so the clock covers real execution.
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._t = None
        self._n = 0

    def start(self):
        self._t = time.perf_counter()

    def mark(self):
        if self._t is None:
            self.start()
            return
        dt = time.perf_counter() - self._t
        self._t = time.perf_counter()
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")

    def steps_per_sec(self) -> float:
        m = self.mean
        return 1.0 / m if m > 0 else float("nan")
