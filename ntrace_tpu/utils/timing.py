"""Wall/device timing harness (~ base/Timer.* + CudaKernel event timing).

The reference reports kernel-only Mrays/s from CUDA event timing around the
launch. The JAX equivalent: call the jitted fn, `block_until_ready` the
outputs, and use perf_counter deltas; warmup calls absorb compilation.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


def device_time(fn, *args, warmup: int = 1, iters: int = 3, **kw):
    """Median wall time (seconds) of fn(*args) with device sync."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out


class StageTimer:
    """Accumulates per-stage wall times for a frame (build/raygen/trace/shade).

    Times and plain counters are separate dicts: `ms()` scales only the
    times, so counters (ray counts, ...) pass through unchanged.
    """

    def __init__(self):
        self.stages: dict[str, float] = {}
        self.counts: dict[str, float] = {}

    @contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def add(self, name: str, seconds: float):
        self.stages[name] = self.stages.get(name, 0.0) + seconds

    def count(self, name: str, n: float):
        self.counts[name] = self.counts.get(name, 0.0) + n

    def ms(self) -> dict[str, float]:
        return {**{k: v * 1e3 for k, v in self.stages.items()}, **self.counts}
