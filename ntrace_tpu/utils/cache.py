"""Content-hashed on-disk caches for built acceleration structures.

~ the reference's binary mesh cache + saved BVH idea (SURVEY.md SS6.4):
`.npz` caches keyed by (scene content, builder config) so the 10M-triangle
SBVH builds once per scene revision.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import numpy as np

from ntrace_tpu.bvh.flatten import FlatBVH
from ntrace_tpu.core import BuildConfig, Scene


def cache_dir() -> Path:
    d = Path(os.environ.get("NTRACE_CACHE", Path.home() / ".cache" / "ntrace_tpu"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def scene_hash(scene: Scene) -> str:
    # Memoized ON the Scene object: a dict keyed by id() can hand a
    # recycled address a stale digest after the original Scene is
    # garbage-collected (silent wrong cache hits).
    digest = getattr(scene, "_content_hash", None)
    if digest is not None:
        return digest
    h = hashlib.sha1()
    h.update(scene.positions.tobytes())
    h.update(scene.indices.tobytes())
    digest = h.hexdigest()[:16]
    try:
        object.__setattr__(scene, "_content_hash", digest)
    except (AttributeError, TypeError):
        pass  # frozen/slots Scene: recompute next call
    return digest


def accel_cache_key(scene: Scene, cfg: BuildConfig) -> str:
    cfg_sig = (
        f"{cfg.builder}|{cfg.max_leaf_size}|{cfg.min_leaf_size}|{cfg.max_depth}"
        f"|{cfg.sbvh_alpha}|{cfg.num_spatial_bins}|{cfg.num_object_bins}"
        f"|{cfg.morton_bits}|{cfg.hlbvh_top_bits}"
        f"|{cfg.sah_node_cost}|{cfg.sah_tri_cost}|{cfg.sbvh_unsplit}"
        f"|{cfg.object_sweep}|v6"
    )
    if cfg.builder in ("sbvh", "binned_sah"):
        # Native and Python builders emit equally valid but not
        # bit-identical trees; the cache must not serve one as the other.
        from ntrace_tpu.bvh.sbvh import sbvh_impl_tag

        cfg_sig += f"|{sbvh_impl_tag(scene.num_tris, cfg)}"
    return hashlib.sha1((scene_hash(scene) + cfg_sig).encode()).hexdigest()[:16]


def load_accel(scene: Scene, cfg: BuildConfig) -> FlatBVH | None:
    p = cache_dir() / f"accel_{accel_cache_key(scene, cfg)}.npz"
    if not p.exists():
        return None
    z = np.load(p)
    if "root_lo" in z:  # kd-tree accel (distinct dataclass + extra fields)
        from ntrace_tpu.bvh.kdtree import FlatKDTree

        return FlatKDTree(
            nodes=z["nodes"], woop=z["woop"], tri_index=z["tri_index"],
            root_lo=z["root_lo"], root_hi=z["root_hi"],
            num_tris=int(z["num_tris"]),
        )
    return FlatBVH(
        nodes=z["nodes"], woop=z["woop"], tri_index=z["tri_index"],
        num_tris=int(z["num_tris"]), sah_cost=float(z["sah_cost"]),
    )


def save_accel(scene: Scene, cfg: BuildConfig, flat) -> None:
    p = cache_dir() / f"accel_{accel_cache_key(scene, cfg)}.npz"
    tmp = p.with_suffix(".tmp.npz")
    extra = {}
    if hasattr(flat, "root_lo"):  # FlatKDTree
        extra = dict(root_lo=flat.root_lo, root_hi=flat.root_hi)
    np.savez(tmp, nodes=flat.nodes, woop=flat.woop, tri_index=flat.tri_index,
             num_tris=flat.num_tris,
             sah_cost=getattr(flat, "sah_cost", 0.0), **extra)
    os.replace(tmp, p)
