"""Round-5: hairball AO intrinsic-difficulty evidence (CPU only).

Quantifies what an EXACT any-hit AO trace must prove in hairball-class
density: for sampled AO ray origins (surface hit points), count the
triangles whose bboxes intersect the ao_radius ball, and per sampled
UNOCCLUDED ray (the expensive class: no hit to stop at), the number of
leaf/node tests the CPU golden pays. Together with the engine A/Bs this
pins whether r2's 78.5 Mrays/s (8.7 ns/ray) was physically possible for
a correct trace. Appends JSONL to results_r5_session4.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ntrace_tpu.core import BuildConfig, RenderConfig
from ntrace_tpu.scenes import default_camera, get_scene

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_r5_session4.json")


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    scene = get_scene("hairball", n_tris=2_900_000)
    tv = scene.tri_verts()                      # (n, 3, 3)
    lo = tv.min(axis=1)
    hi = tv.max(axis=1)
    rng = np.random.RandomState(7)

    # Sample AO origins: random triangle centroids (surface points).
    ids = rng.randint(0, scene.num_tris, size=256)
    pts = tv[ids].mean(axis=1)
    R = 1.0                                     # cfg.ao_radius default
    counts = []
    for p in pts:
        near = ((hi >= p - R) & (lo <= p + R)).all(axis=1)
        counts.append(int(near.sum()))
    counts = np.array(counts)
    emit({"stage": "hb_density", "ao_radius": R,
          "tris_in_ball_mean": float(counts.mean()),
          "tris_in_ball_p50": int(np.percentile(counts, 50)),
          "tris_in_ball_p90": int(np.percentile(counts, 90)),
          "samples": len(counts)})

    # Per-ray traversal work of the EXACT any-hit trace (CPU golden
    # steps): occluded vs unoccluded classes.
    import jax.numpy as jnp

    from ntrace_tpu.ray import pixel_table, raygen
    from ntrace_tpu.render.renderer import Renderer, build_accel

    W = H = 256
    cam = default_camera("hairball")
    ca = raygen.camera_arrays(cam, W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    bcfg = BuildConfig(builder="binned_sah", max_leaf_size=32,
                       sah_tri_cost=0.02)
    flat = build_accel(scene, bcfg, use_cache=True)
    r = Renderer(scene, bcfg, RenderConfig(
        width=W, height=H, mode="ao", samples=1, engine="cpu_golden"),
        flat=flat)
    tri0, t0_, *_ = r._tracer(batch.orig, batch.dirn, batch.tmin,
                              batch.tmax, False)
    sec, any_hit = r.gen_secondary(cam, "ao", batch, np.asarray(tri0),
                                   np.asarray(t0_))
    sub = np.arange(0, sec.num_rays, max(sec.num_rays // 512, 1))
    from ntrace_tpu.trace.cpu import trace_cpu_golden

    o = np.asarray(sec.orig)[sub]
    d = np.asarray(sec.dirn)[sub]
    tn = np.asarray(sec.tmin)[sub]
    tx = np.asarray(sec.tmax)[sub]
    live = tx > tn
    rec = trace_cpu_golden(flat, o, d, tn, tx, any_hit=True)
    occ = rec.tri >= 0
    emit({"stage": "hb_ao_classes", "sampled": int(len(sub)),
          "live_frac": float(live.mean()),
          "occluded_frac_of_live": float(occ[live].mean())})


if __name__ == "__main__":
    main()
