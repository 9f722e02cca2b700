"""Profiling / tracing hooks.

The reference's only observability is wall-clock prints in its loops
(train.py:62-68, test.py:127-133). Here: a jax.profiler trace context, a
step timer with MP/s accounting (the framework's north-star metric), and a
compiled-cost probe.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof) when a
    log dir is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput accounting in megapixels/sec (the BASELINE.md metric)."""

    def __init__(self, pixels_per_step: int, warmup: int = 2):
        self.pixels_per_step = pixels_per_step
        self.warmup = warmup
        self.steps = 0
        self.elapsed = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.steps += 1
        if self.steps > self.warmup:
            self.elapsed += dt

    @property
    def mps(self) -> float:
        counted = max(self.steps - self.warmup, 0)
        if counted == 0 or self.elapsed == 0:
            return 0.0
        return counted * self.pixels_per_step / 1e6 / self.elapsed


def compiled_cost(fn, *args) -> Dict[str, float]:
    """FLOPs / bytes-accessed estimate of a jitted function (XLA's analytical
    cost model; treat as indicative)."""
    compiled = jax.jit(fn).lower(*args).compile()
    analysis = compiled.cost_analysis() or {}
    return {
        "flops": float(analysis.get("flops", 0.0)),
        "bytes_accessed": float(analysis.get("bytes accessed", 0.0)),
    }
