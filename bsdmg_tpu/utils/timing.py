"""Timing helpers for benchmarks and phase metrics.

Replaces the reference's observability mechanisms — nvtx ranges
(src/cuda/mod.rs:354,370), ``cuProfilerStart`` (src/main.rs:37) and per-ray
``clock64()`` cycle counters (cuda/includes/ray_marching.cu:25,46) — with
host-side wall timing around ``jax.block_until_ready`` boundaries plus
``jax.profiler`` trace hooks (see utils/profiling.py).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class Timer:
    """Accumulates named phase durations (seconds)."""

    phases: dict = field(default_factory=dict)

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        return "; ".join(f"{k}={v * 1e3:.2f}ms" for k, v in self.phases.items())


def block_and_time(fn, *args, iters: int = 1, warmup: int = 1, **kwargs):
    """Run ``fn`` with device-sync timing. Returns (result, best_seconds).

    Uses ``jax.block_until_ready`` at measurement boundaries only — XLA's
    async dispatch stays intact inside the measured region.
    """
    import jax

    result = None
    for _ in range(max(warmup, 0)):
        result = jax.block_until_ready(fn(*args, **kwargs))
    best = float("inf")
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        result = jax.block_until_ready(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - t0)
    return result, best
