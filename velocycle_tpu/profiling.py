"""Profiling / observability utilities.

The reference's only instrumentation is wall-clock deltas in notebooks and
a per-step host-synced loss list (SURVEY.md §5.1, §5.5).  Here:

  * `trace(logdir)` — context manager around the JAX profiler: captures an
    xplane trace of everything dispatched inside (view with TensorBoard or
    xprof).
  * `StepTimer` — wall-clock step timing with compile-time separation
    (first call = compile+run) and steps/s summaries: the BASELINE metric.
  * `annotate(name)` — TraceAnnotation wrapper so named regions show up in
    the profile.
  * `device_memory_stats()` — per-device memory snapshot where the backend
    exposes it.
"""
from __future__ import annotations

import contextlib
import time

import numpy as np
import jax

__all__ = ["trace", "annotate", "StepTimer", "device_memory_stats"]


@contextlib.contextmanager
def trace(logdir):
    """Capture a JAX profiler trace of the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing that separates the compile step.

    Example::

        timer = StepTimer()
        for i in range(n):
            with timer:
                state, loss = svi.update(state, data)
                jax.block_until_ready(loss)
        print(timer.summary())
    """

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def compile_time(self):
        return self.times[0] if self.times else None

    @property
    def steady_times(self):
        return self.times[1:] if len(self.times) > 1 else self.times

    def steps_per_second(self):
        ts = self.steady_times
        return 1.0 / float(np.mean(ts)) if ts else float("nan")

    def summary(self):
        ts = np.asarray(self.steady_times)
        if len(ts) == 0:
            return {"steps": 0}
        return {
            "steps": len(self.times),
            "compile_s": self.compile_time,
            "mean_ms": float(ts.mean() * 1e3),
            "p50_ms": float(np.percentile(ts, 50) * 1e3),
            "p95_ms": float(np.percentile(ts, 95) * 1e3),
            "steps_per_s": self.steps_per_second(),
        }


def device_memory_stats():
    """{device: memory_stats dict} for backends that expose it."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
