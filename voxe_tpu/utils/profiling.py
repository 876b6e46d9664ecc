"""Profiling/tracing helpers.

The reference has no formal tracing (SURVEY.md section 5: ad-hoc
perf_counter accounting only). This framework exposes the JAX/TPU profiler
as first-class utilities: a context manager writing TensorBoard-viewable
traces, and a step timer that separates compile from steady-state.
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path

from voxe_tpu.utils.logging import log


@contextlib.contextmanager
def trace(logdir: Path, enabled: bool = True):
    """Capture an XLA/TPU profiler trace into `logdir` (view with
    TensorBoard's profile plugin or xprof)."""
    if not enabled:
        yield
        return
    import jax

    logdir = str(logdir)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info(f"profiler trace written to {logdir}")


class StepTimer:
    """Wall-clock accounting that excludes logging/feedback time, in the style
    of the reference's 'actual training time' (trainers.py:232-277) but
    reusable. Also tracks the first (compile) step separately."""

    def __init__(self):
        self.total = 0.0
        self.first_step = None
        self._last = time.perf_counter()

    def mark_step(self):
        now = time.perf_counter()
        delta = now - self._last
        if self.first_step is None:
            self.first_step = delta
        else:
            self.total += delta
        self._last = now

    def pause_done(self):
        """Call after doing non-training work (logging/rendering) to exclude
        it from the accounting."""
        self._last = time.perf_counter()

    def steady_state_per_step(self, num_steps: int) -> float:
        return self.total / max(num_steps - 1, 1)
