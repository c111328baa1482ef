"""Profiling / observability hooks.

The reference has only ad-hoc wall-clock prints (SURVEY.md §5.1); here:
  - start_profiler_server(): persistent jax.profiler endpoint for
    tensorboard-profile / xprof capture;
  - trace(): context manager writing a profiler trace for N steps;
  - Throughput: rolling rays/s / steps/s counter used by the trainers.
"""
from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import jax


def start_profiler_server(port: int = 9999) -> None:
    jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Rolling-window throughput counter."""

    def __init__(self, window: int = 50):
        self._times = deque(maxlen=window)
        self._units = deque(maxlen=window)

    def tick(self, units: float) -> None:
        self._times.append(time.time())
        self._units.append(units)

    def per_second(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        if dt <= 0:
            return None
        return sum(list(self._units)[1:]) / dt
