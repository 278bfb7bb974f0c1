"""Profiling & step-timing instrumentation.

The reference has no tracing at all (SURVEY §5) — only progress percentages.
This module adds the TPU-native equivalents:

  * :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard-compatible trace directory;
  * :class:`StepTimer` — lightweight wall-clock step timing with a rolling
    window, used by the trainer when ``--profile_dir`` is set and available for
    services.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace if a directory is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step statistics."""

    def __init__(self, window: int = 100):
        self.times = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def steps_per_second(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    @property
    def mean_step_ms(self) -> float:
        if not self.times:
            return 0.0
        return sum(self.times) / len(self.times) * 1000.0

    def summary(self) -> dict:
        return {"steps_per_second": round(self.steps_per_second, 3),
                "mean_step_ms": round(self.mean_step_ms, 2)}
