"""Profiling / tracing utilities.

Replaces the reference's observability hooks (SURVEY §5): Lightning's
`profiler="simple"` (run.py:113,133) becomes `jax.profiler` traces, the
`record_function("encoder_index")` spans (encoder_pn.py:111-115) become
`annotate(...)` scopes visible in the trace viewer, and per-step throughput
is tracked by `ThroughputMeter` (rays/sec logging).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/TPU profile into `log_dir` (view with TensorBoard or
    xprof). Usage: `with trace("/tmp/profile"): run_steps()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope appearing in profiler traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class ThroughputMeter:
    """Sliding-window rays/sec (and steps/sec) tracker."""

    def __init__(self, window: int = 50):
        self.window = window
        self._events = []  # (time, rays)

    def update(self, rays: int):
        self._events.append((time.time(), rays))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def rays_per_sec(self) -> Optional[float]:
        if len(self._events) < 2:
            return None
        dt = self._events[-1][0] - self._events[0][0]
        rays = sum(r for _, r in self._events[1:])
        return rays / dt if dt > 0 else None

    @property
    def steps_per_sec(self) -> Optional[float]:
        if len(self._events) < 2:
            return None
        dt = self._events[-1][0] - self._events[0][0]
        return (len(self._events) - 1) / dt if dt > 0 else None
