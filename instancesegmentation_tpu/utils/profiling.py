"""Profiling helpers: jax.profiler traces + step timing.

The reference has no tracing/profiling at all (SURVEY.md §5 — its only
artifact is a wall-clock ms in a viewer window title); this module
supplies the TPU-native equivalents: XLA profiler traces viewable in
TensorBoard/Perfetto and a cheap steady-state step timer.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block.

    View with ``tensorboard --logdir <log_dir>`` or upload the
    .trace.json.gz to Perfetto.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Images/sec + step-time EMA for the training loop."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.step_time: float | None = None
        self._last: float | None = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.step_time = (
                dt
                if self.step_time is None
                else self.ema * self.step_time + (1 - self.ema) * dt
            )
        self._last = now
        return self.step_time

    def images_per_sec(self, batch_size: int) -> float | None:
        if self.step_time is None:
            return None
        return batch_size / self.step_time


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median wall-time of ``fn(*args)`` with block_until_ready."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
