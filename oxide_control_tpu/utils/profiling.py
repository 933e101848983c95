"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference has no instrumentation; here the engine exposes jax.profiler
trace capture + named scopes around the pipeline phases, plus a simple
step-rate meter for the BASELINE env-steps/s metric.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope; shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepRateMeter:
    """Env-steps/s counter (the BASELINE.md primary metric)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def add(self, env_steps: int):
        self._steps += env_steps

    @property
    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0
