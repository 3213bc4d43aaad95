"""Tracing / profiling hooks.

The reference's only instrumentation is performance.py's wall-clock mean
(SURVEY.md §5 tracing row).  Here:

  * `trace(log_dir)` — context manager around jax.profiler for XLA/TPU
    traces viewable in TensorBoard/Perfetto/XProf.
  * `StepTimer` — cheap rolling wall-clock stats the Trainer feeds
    (steps/s and samples/s scalars land in metrics.jsonl).
  * `annotate(name)` — TraceAnnotation passthrough for labeling host-side
    phases inside a trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the duration of the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a host-side region inside a profiler trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling steps/s / samples/s estimator (window of `horizon` marks)."""

    def __init__(self, samples_per_step: int = 0, horizon: int = 50):
        self.samples_per_step = samples_per_step
        self.horizon = horizon
        self._marks = []

    def mark(self) -> None:
        now = time.perf_counter()
        self._marks.append(now)
        if len(self._marks) > self.horizon:
            self._marks.pop(0)

    @property
    def steps_per_s(self) -> Optional[float]:
        if len(self._marks) < 2:
            return None
        span = self._marks[-1] - self._marks[0]
        return (len(self._marks) - 1) / span if span > 0 else None

    @property
    def samples_per_s(self) -> Optional[float]:
        sps = self.steps_per_s
        return None if sps is None else sps * self.samples_per_step
