"""Tracing / profiling helpers.

The reference has no profiling support beyond ad-hoc ``time.time()`` prints
and a forced ``CUDA_LAUNCH_BLOCKING=1`` (SURVEY §5).  The TPU-native
replacement: ``jax.profiler`` traces viewable in TensorBoard / Perfetto,
named-scope annotations for the hot regions, and a tiny step timer that
feeds the MetricWriter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace into ``logdir`` (open with TensorBoard's
    profile plugin or Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up in profiler timelines; usable as a context
    manager or decorator."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-time / throughput tracker for the train loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean_step_time(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def throughput(self, items_per_step: int) -> float:
        st = self.mean_step_time
        return items_per_step / st if st > 0 else 0.0


def enable_debug_nans(enable: bool = True):
    """Opt-in NaN tracing (the TPU-era equivalent of the reference's
    always-on ``torch.autograd.set_detect_anomaly(True)``,
    diffusion_architecture.py:22 — which taxes every step; here it is a
    switch)."""
    jax.config.update("jax_debug_nans", enable)
