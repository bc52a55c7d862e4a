"""Profiling / tracing helpers (SURVEY.md §5: the reference has only
chrono/rdtsc micro-timers in its benchmark mains — tests/tools.h:28-33,
FastGaussianNoise.hpp:116-122; the TPU-native equivalents are jax.profiler
device traces plus the chain-differenced wall timers used by bench.py and
tools/bench_ops.py)."""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class WallTimer:
    """Chrono-style accumulator (reference tests/tools.h:28-33)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total += time.perf_counter() - t0
            self.count += 1

    @property
    def mean_us(self) -> float:
        return (self.total / self.count) * 1e6 if self.count else 0.0
