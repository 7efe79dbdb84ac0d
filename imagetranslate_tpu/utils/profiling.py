"""Profiling hooks (SURVEY §5: the reference has none — observability was
print statements). Wraps the JAX profiler so any trainer can capture a trace
of a few hot steps for XProf/TensorBoard analysis."""

from __future__ import annotations

import contextlib
import os
from typing import Optional


class StepProfiler:
    """Captures a JAX profiler trace covering steps [start, stop).

    Usage:
        prof = StepProfiler(logdir, start=10, stop=15)
        for step in ...:
            prof.tick(step)
            ...
        prof.close()
    """

    def __init__(self, logdir: Optional[str], start: int = 10, stop: int = 15):
        self.logdir = logdir
        self.start = start
        self.stop = stop
        self.active = False

    def tick(self, step: int):
        if self.logdir is None:
            return
        import jax

        if not self.active and step == self.start:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self.active = True
        elif self.active and step >= self.stop:
            jax.profiler.stop_trace()
            self.active = False
            print(f"profiler trace written to {self.logdir}", flush=True)

    def close(self):
        if self.active:
            import jax

            jax.profiler.stop_trace()
            self.active = False


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
