"""Profiling helpers — mmdet/utils/profiling.py + IterTimerHook equivalent:
jax.profiler traces and a simple timing context."""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_time(name: str, log=print):
    """Wall-clock a block with a device sync at the end
    (mmdet profile_time equivalent; NVTX ranges → trace annotations)."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.time()
        yield
        log(f"{name}: {(time.time() - t0) * 1000:.2f} ms")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class IterTimer:
    """Rolling per-iteration timing (IterTimerHook equivalent)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._last = time.time()

    def tick(self) -> float:
        now = time.time()
        dt = now - self._last
        self._last = now
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def avg(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
