"""Morton-chunked BVH forest: the packet engine's large-scene path.

The Pallas packet kernel (trace/packet_pallas.py) requires its node +
triangle tables VMEM-resident (~96 MB budget). Scenes past ~1.5M
triangle references (hairball 2.9M, San Miguel 10M) cannot fit, and the
reference's answer -- per-thread global-memory fetches through the
texture cache (expected rt/kernels/*.cu, SURVEY.md SS3.3) -- has no TPU
equivalent (no per-lane HBM gather).

TPU-first redesign: partition triangles into K Morton-contiguous chunks
(spatially coherent blobs), build an independent accel per chunk with the
same builder config, and trace the chunks SEQUENTIALLY inside one jit,
threading per-ray hit state between passes:
  - closest-hit: pass k receives tmax = best-so-far t, so later chunks
    traverse with tight rays (near chunks come first in Morton order for
    the origin-agnostic average case);
  - any-hit: rays that already hit are killed (tmax = tmin) and cost the
    later chunks ~nothing (dead-lane masks).
HBM holds all chunk tables (~64 B/ref); VMEM holds one chunk at a time --
the pallas grid loop re-fills VMEM per chunk exactly like the single-chunk
path does per dispatch.
"""

from __future__ import annotations

import numpy as np

from ntrace_tpu.core import Scene
from ntrace_tpu.ops.morton import morton_codes_3d

# Per-ref packed bytes at tpr=12/npr=1 with fat leaves (~24 refs/node row):
# 512/12 (tri rows) + 512/24 (node rows) = ~64 B; 1.2M refs ~= 77 MB.
DEFAULT_CHUNK_REFS = 1_200_000


def morton_partition(scene: Scene, max_refs: int = DEFAULT_CHUNK_REFS):
    """Split scene tris into Morton-contiguous chunks of <= max_refs.

    Returns a list of int64 arrays of GLOBAL triangle ids (each spatially
    coherent; concatenation is a permutation of arange(num_tris)).
    """
    tv = scene.tri_verts()
    cent = tv.mean(axis=1)
    lo, hi = scene.bbox()
    codes = morton_codes_3d(np, cent.astype(np.float32),
                            lo.astype(np.float32), hi.astype(np.float32))
    order = np.argsort(codes, kind="stable")
    k = max(1, -(-scene.num_tris // max_refs))
    return [np.sort(c) for c in np.array_split(order, k)]


def sub_scene(scene: Scene, tri_ids: np.ndarray, tag: int) -> Scene:
    """Vertex-compacted sub-scene over the given global triangle ids."""
    idx = scene.indices[tri_ids]                      # (m, 3) global verts
    uniq, inv = np.unique(idx, return_inverse=True)
    return Scene(
        positions=scene.positions[uniq],
        indices=inv.reshape(-1, 3).astype(np.int32),
        normals=None if scene.normals is None else scene.normals[uniq],
        mat_ids=scene.mat_ids[tri_ids],
        materials=scene.materials,
        name=f"{scene.name}.chunk{tag}x{len(tri_ids)}",
        uvs=None if scene.uvs is None else scene.uvs[tri_ids],
    )
