"""Kernel registry: reference kernel names -> engine configurations.

The reference selects a traversal kernel by compilation-unit name
(~ rt/cuda/CudaTracer.cpp loading rt/kernels/<name>.cu and reading its
KernelConfig). The rebuild keeps those names as aliases so reference
benchmark scripts translate directly; each maps onto a TPU engine variant.

CUDA-variant -> TPU-engine correspondence (SURVEY.md SS3.3):
  persistent threads      ~ the batch lockstep loop itself (all rays in
                            flight advance per step; chunking = warp pool)
  while-while             ~ the unified node/leaf state machine step
  speculative while-while ~ phase masking (every step evaluates both
                            phases vectorized -- speculation is implicit)
  dynamic ray fetch       ~ chunked batches (finished chunks retire and
                            the next chunk launches; in-engine refill
                            lands with the wavefront engine)
  packet                  ~ Morton-ordered pixel batches (screen-coherent
                            chunks ARE packets at batch granularity)
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class KernelSpec:
    engine: str          # stack | wavefront | cpu_golden
    chunk: int           # in-flight rays per launch
    note: str = ""


_REGISTRY = {
    # Reference kernel names (aliases for script compatibility):
    "tesla_persistent_while_while": KernelSpec("stack", 1 << 16),
    "tesla_persistent_packet": KernelSpec("packet", 1 << 22,
                                          "Pallas shared-stack packet kernel"),
    "tesla_persistent_speculative_while_while": KernelSpec("stack2", 1 << 16),
    "fermi_speculative_while_while": KernelSpec("packet", 1 << 22,
                                                "fastest engine on TPU"),
    "kepler_dynamic_fetch": KernelSpec("stack2", 1 << 16),
    "fermi_kdtree_while_while": KernelSpec("kdtree", 1 << 13,
                                           "pair with --builder=kdtree"),
    # Native names:
    "stack": KernelSpec("stack", 1 << 16, "v1 two-table engine"),
    "stack2": KernelSpec("stack2", 1 << 16, "unified-table macro-step engine"),
    "bvh8": KernelSpec("bvh8", 1 << 13, "8-wide one-dispatch engine"),
    "kdtree": KernelSpec("kdtree", 1 << 13, "interval-stack kd engine"),
    "packet": KernelSpec("packet", 1 << 22,
                         "Pallas VMEM shared-stack packet kernel"),
    "wavefront": KernelSpec("stack2", 1 << 16,
                            "sorted wavefront pending (PERF_NOTES.md)"),
    "cpu_golden": KernelSpec("cpu_golden", 1 << 30),
    "auto": KernelSpec("stack2", 1 << 16),
}


def resolve_kernel(name: str) -> KernelSpec:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown kernel {name!r}; known: {sorted(_REGISTRY)}"
        ) from None


def kernel_names() -> list[str]:
    return sorted(_REGISTRY)
