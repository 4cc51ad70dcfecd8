"""Diagnose the 8 full-frame golden mismatches of the dense engine
(results_r4_dense5.json golden_full). For every mismatching ray, print
the dense (tri, t) vs CPU-golden (tri, t), the relative t gap, and a
re-intersection of BOTH triangles on the CPU to classify:

  tie        both tris truly intersect with |t_d - t_g| <= few ulp
             (traversal-order tie -- acceptable per image-exact policy)
  miss       dense returned -1 or a tri the CPU says the ray misses /
             hits at larger t (coverage bug: bin clip, cap overflow)
  wrong-t    dense tri hits but at t > golden t + ulp (z-order /
             early-out bug)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace import binraster_dense as bd

W, H, TILE = 1024, 768, 16


def mt_cpu(orig, d, v0, e1, e2):
    """Scalar Moller-Trumbore in float32, mirrors trace/cpu.py."""
    pv = np.cross(d, e2).astype(np.float32)
    det = np.float32(np.dot(e1, pv))
    if det == 0:
        return None
    inv = np.float32(1.0) / det
    tv = (orig - v0).astype(np.float32)
    u = np.float32(np.dot(tv, pv)) * inv
    qv = np.cross(tv, e1).astype(np.float32)
    v = np.float32(np.dot(d, qv)) * inv
    t = np.float32(np.dot(e2, qv)) * inv
    if u < 0 or v < 0 or (u + v) > 1:
        return None
    return float(t), float(u), float(v)


def main():
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    R = batch.num_rays

    from ntrace_tpu.core import BuildConfig
    from ntrace_tpu.render.renderer import build_accel
    from ntrace_tpu.trace.cpu import trace_cpu_golden

    flat = build_accel(scene, BuildConfig(
        builder="binned_sah", sah_tri_cost=0.02, max_leaf_size=48),
        use_cache=True)

    tri_d, t_d, _, _ = (np.asarray(x) for x in bd.trace_dense_primary(
        verts, ca, batch.dirn, width=W, height=H, tile=TILE,
        k_cap=64, ez_chunk=0))

    rec = trace_cpu_golden(
        flat, np.asarray(batch.orig), np.asarray(batch.dirn),
        np.asarray(batch.tmin), np.asarray(batch.tmax))

    bad = np.nonzero(tri_d != rec.tri)[0]
    print(f"mismatches: {len(bad)} / {R}")
    orig = np.asarray(batch.orig)
    dirn = np.asarray(batch.dirn)
    tv = np.asarray(scene.tri_verts())  # (N, 3, 3)

    for i in bad[:32]:
        td, tg = int(tri_d[i]), int(rec.tri[i])
        o, d = orig[i], dirn[i]
        row = {"ray": int(i), "dense_tri": td, "golden_tri": tg,
               "dense_t": float(t_d[i]), "golden_t": float(rec.t[i])}
        for name, tri in (("dense", td), ("golden", tg)):
            if tri < 0:
                row[f"{name}_reint"] = None
                continue
            v0 = tv[tri, 0]
            e1 = tv[tri, 1] - v0
            e2 = tv[tri, 2] - v0
            row[f"{name}_reint"] = mt_cpu(o, d, v0, e1, e2)
        if td >= 0 and tg >= 0:
            gap = abs(float(t_d[i]) - float(rec.t[i]))
            row["rel_gap"] = gap / max(abs(float(rec.t[i])), 1e-30)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
