"""Classify sibenik's 3/786432 tie-aware golden residue (r5 matrix).

The sibenik config runs the PACKET engine (dense not armed for the
binned_sah golden-path config) vs the CPU golden -- both Woop
arithmetic, so raw diffs should be 0 and a tie-aware residue of 3 needs
a per-ray explanation (expected classes: coplanar duplicate geometry
with |t| gap just past 4 ulps, or boundary u/v on shared edges).
Dumps full per-ray detail for every raw diff. nohup, no shell timeout.
Appends JSONL to results_r5_session3.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.core import BuildConfig, RenderConfig
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.render.renderer import Renderer, build_accel
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace.cpu import trace_cpu_golden

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_r5_session3.json")
W, H = 1024, 768


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def diag(scene_name, n_tris, builder, bkw):
    scene = get_scene(scene_name, n_tris=n_tris)
    bcfg = BuildConfig(builder=builder, **bkw)
    flat = build_accel(scene, bcfg, use_cache=True)
    r = Renderer(scene, bcfg, RenderConfig(
        width=W, height=H, mode="primary", packet_rows=16,
        engine="auto"), flat=flat)
    cam = default_camera(scene_name)
    ca = raygen.camera_arrays(cam, W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    r.prepare_primary(ca, W, H)
    tri, t, u, v = (np.asarray(x) for x in jax.block_until_ready(
        r.trace_primary(batch.orig, batch.dirn, batch.tmin, batch.tmax,
                        cam=ca)))
    gflat = r.flat if r.flat is not None else flat
    rec = trace_cpu_golden(
        gflat, np.asarray(batch.orig), np.asarray(batch.dirn),
        np.asarray(batch.tmin), np.asarray(batch.tmax))
    diff = np.nonzero(tri != rec.tri)[0]
    emit({"stage": f"{scene_name}_diag", "engine": r.engine,
          "builder": builder, "raw_diffs": int(len(diff))})
    tv = scene.tri_verts()
    # brute-force arbitration on the differing rays: the EXACT answer
    # under raw-MT arithmetic (the dense/packet formulation), telling
    # us which side's formulation-t ordering flipped the winner
    from ntrace_tpu.bvh.golden import brute_force_mt

    for i in diff[:32]:
        td, tg = int(tri[i]), int(rec.tri[i])
        bf = brute_force_mt(
            scene, np.asarray(batch.orig)[i:i + 1],
            np.asarray(batch.dirn)[i:i + 1],
            np.asarray(batch.tmin)[i:i + 1],
            np.asarray(batch.tmax)[i:i + 1])
        ulps = (abs(int(np.float32(t[i]).view(np.int32))
                    - int(np.float32(rec.t[i]).view(np.int32)))
                if td >= 0 and tg >= 0 and np.isfinite(rec.t[i])
                else None)
        emit({"stage": f"{scene_name}_diag_ray", "ray": int(i),
              "dev": [td, float(t[i]), float(u[i]), float(v[i])],
              "gold": [tg, float(rec.t[i]), float(rec.u[i]),
                       float(rec.v[i])],
              "brute_mt": [int(bf.tri[0]), float(bf.t[0])],
              "t_ulps": ulps,
              "shared_verts": (int(len(
                  set(map(tuple, tv[td].tolist()))
                  & set(map(tuple, tv[tg].tolist()))))
                  if td >= 0 and tg >= 0 else None)})


CONFIGS = {
    "sibenik": ("sibenik", 80_000, "binned_sah",
                dict(sah_tri_cost=0.02, max_leaf_size=48)),
    "conference": ("conference", 280_000, "lbvh",
                   dict(max_leaf_size=32, sah_tri_cost=0.02)),
    "fairy": ("fairy", 170_000, "hlbvh",
              dict(max_leaf_size=32, sah_tri_cost=0.02)),
    "hairball": ("hairball", 2_900_000, "lbvh",
                 dict(max_leaf_size=32, sah_tri_cost=0.02)),
    "san_miguel": ("san_miguel", 10_000_000, "sbvh",
                   dict(sah_tri_cost=0.02, max_leaf_size=48)),
}


def main():
    only = os.environ.get("NTRACE_DIAG_ONLY", "sibenik,conference")
    for name in only.split(","):
        diag(*CONFIGS[name])


if __name__ == "__main__":
    main()
