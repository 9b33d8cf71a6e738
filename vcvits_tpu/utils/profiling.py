"""Profiling / tracing hooks (SURVEY.md §5.1 — the reference imports
Lightning profilers but never wires them; here they work).

* `trace(logdir)` — context manager around jax.profiler traces; view in
  TensorBoard's profile plugin or Perfetto.
* `StepTimer` — host-side EMA of step wall time + tokens/sec style rates.
* `start_server(port)` — live profiling endpoint for `jax.profiler`.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._avg: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        """Call once per step; returns EMA step seconds (None on first)."""
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self._avg = dt if self._avg is None else (
                self.ema * self._avg + (1 - self.ema) * dt
            )
        self._last = now
        return self._avg

    @property
    def steps_per_sec(self) -> Optional[float]:
        return None if not self._avg else 1.0 / self._avg
