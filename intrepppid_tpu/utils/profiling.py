"""Profiling & tracing (the reference has none — SURVEY.md §5 row 1).

``trace(logdir)``: context manager around ``jax.profiler`` producing a
TensorBoard-loadable trace of device execution.

``StepTimer``: lightweight wall-clock step/throughput counters; the Trainer
logs ``epoch_time_s`` and ``seq_pairs_per_s`` from the same mechanism.

NOTE on timing JAX on detached/tunnelled platforms: always force a real
sync (e.g. ``float(loss)``) before reading a timer — ``block_until_ready``
has been observed not to block through remote-device tunnels.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Profile a region onto ``logdir`` (view with TensorBoard's profile
    plugin). No-op fallback if the profiler is unavailable."""
    import jax

    try:
        jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


class StepTimer:
    """Accumulates step wall times; reports mean step time and items/s."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0: Optional[float] = None
        self.total_items = 0
        self.total_time = 0.0
        self.steps = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n_items: int = 0) -> float:
        dt = time.perf_counter() - self._t0
        self.total_time += dt
        self.total_items += n_items
        self.steps += 1
        return dt

    @property
    def mean_step_s(self) -> float:
        return self.total_time / max(self.steps, 1)

    @property
    def items_per_s(self) -> float:
        return self.total_items / max(self.total_time, 1e-9)
