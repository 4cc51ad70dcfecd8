"""Diagnose the 8/786432 full-frame golden mismatches of the dense
engine (results_r4_dense3.json golden_full).

For every mismatching ray: device (tri, t) vs CPU golden (tri, t) vs a
brute-force exact MT re-check of BOTH candidate triangles on that ray.
Classifies each as
  tie        -- both tris hit at bit-identical t (lex rule should pick
                the smaller id; if the golden picked the larger, the
                golden's tie rule diverges, not the engine)
  engine_miss -- the golden's tri genuinely hits nearer (engine bug:
                binning dropped a triangle)
  golden_miss -- the engine's tri hits nearer (CPU golden bug)
  float_diff -- hits differ by <= 2 ulp (op-order rounding)
Appends to results_dense_mismatch.json.
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

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_dense_mismatch.json")
W, H, TILE = 1024, 768, 16


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def mt_exact(v0, e1, e2, o, d, tn):
    """Reference MT in f64 AND the kernel's f32 op order."""
    out = {}
    for dt in (np.float32, np.float64):
        v0d, e1d, e2d = v0.astype(dt), e1.astype(dt), e2.astype(dt)
        od, dd = o.astype(dt), d.astype(dt)
        tv = od - v0d
        q = np.cross(tv, e1d)
        p = np.cross(dd, e2d)
        det = (e1d * p).sum()
        if det == 0:
            out[dt] = None
            continue
        inv = dt(1.0) / det
        u = (tv * p).sum() * inv
        v = (dd * q).sum() * inv
        t = (e2d * q).sum() * inv
        ok = (u >= 0) and (v >= 0) and (u + v <= 1) and (t > tn)
        out[dt] = float(t) if ok else None
    return out[np.float32], out[np.float64]


def main():
    scene = get_scene("conference", n_tris=280_000)
    verts = np.asarray(scene.tri_verts())
    vd = jax.device_put(jnp.asarray(verts))
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))

    tri_dev, t_dev, _, _ = bd.trace_dense_primary(
        vd, ca, batch.dirn, width=W, height=H, tile=TILE, ez_chunk=0)
    tri_dev = np.asarray(jax.block_until_ready(tri_dev))
    t_dev = np.asarray(t_dev)

    from ntrace_tpu.core import BuildConfig
    from ntrace_tpu.render.renderer import build_accel
    from ntrace_tpu.trace.cpu import trace_cpu_golden

    flat = build_accel(scene, BuildConfig(
        builder="binned_sah", sah_tri_cost=0.02, max_leaf_size=48),
        use_cache=True)
    orig = np.asarray(batch.orig)
    dirn = np.asarray(batch.dirn)
    tmin = np.asarray(batch.tmin)
    rec = trace_cpu_golden(flat, orig, dirn, tmin, np.asarray(batch.tmax))

    bad = np.nonzero(tri_dev != rec.tri)[0]
    emit({"stage": "summary", "mismatches": int(len(bad)),
          "rays": int(tri_dev.shape[0])})
    for r in bad[:64]:
        o, d, tn = orig[r], dirn[r], float(tmin[r])
        td, tg = int(tri_dev[r]), int(rec.tri[r])
        row = {"ray": int(r), "tri_dev": td, "tri_gold": tg,
               "t_dev": float(t_dev[r]), "t_gold": float(rec.t[r])}
        ts = {}
        for tag, tri in (("dev", td), ("gold", tg)):
            if tri >= 0:
                v0 = verts[tri, 0]
                e1 = verts[tri, 1] - v0
                e2 = verts[tri, 2] - v0
                f32t, f64t = mt_exact(v0, e1, e2, o, d, tn)
                row[f"recheck_{tag}_f32"] = f32t
                row[f"recheck_{tag}_f64"] = f64t
                ts[tag] = (f32t, f64t)
        # classification
        dev64 = ts.get("dev", (None, None))[1]
        gold64 = ts.get("gold", (None, None))[1]
        if td >= 0 and tg >= 0 and dev64 and gold64:
            if abs(dev64 - gold64) < 1e-12:
                row["class"] = "tie"
            elif dev64 < gold64:
                row["class"] = "golden_miss"
            elif np.float32(dev64) == np.float32(gold64):
                row["class"] = "float_tie_f32"
            else:
                row["class"] = ("engine_miss"
                                if gold64 < dev64 else "float_diff")
        elif td < 0 and gold64:
            row["class"] = "engine_miss_nohit"
        elif tg < 0 and dev64:
            row["class"] = "golden_miss_nohit"
        else:
            row["class"] = "unclear"
        emit(row)


if __name__ == "__main__":
    main()
