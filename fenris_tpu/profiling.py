"""Profiling and observability helpers.

The reference measures performance externally via criterion benchmarks
(SURVEY §5); fenris-tpu makes tracing first-class: JAX profiler traces
(viewable in TensorBoard/Perfetto), wall-clock timers with device
synchronization, and solver telemetry (CG/Newton iteration counts are
returned in their result structs).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax

__all__ = ["trace", "Timer", "benchmark"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler trace (open with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Timer:
    """Accumulating wall-clock timer with device synchronization."""

    times: Dict[str, List[float]] = field(default_factory=dict)

    @contextlib.contextmanager
    def section(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self.times.items()}


def benchmark(fn, *args, warmup: int = 2, iters: int = 20) -> float:
    """Steady-state seconds per call of a device function.

    Compiles/warms, then times ``iters`` dispatches with one trailing
    device sync.  NOTE: pass device arrays as *arguments*; values captured
    as closure constants hit an XLA:TPU slow path (see sparse/cg.py).
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
