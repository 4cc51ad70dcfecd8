"""Round-4 packet-kernel roofline: price the plateau before spending on it.

VERDICT.md round-3 #1: commit a measured step-cost budget -- chained-
marginal frame cost at rows {8,16} x ilv {1,2,4,8} (the "interleaved
chains overlap nearly free" claim in packet_pallas.py has never been
priced on device), plus steps/packet and leafrows/packet from stats=True,
and the derived ns/unit decomposition. Appends JSON records to
results_r4_roofline.json.

Protocol: PERF_NOTES.md metrology -- chained-marginal (K=1 vs K=5 traces
inside one jit, serialized via tmin), best of 3 walls each, so the ~26-31
ms tunnel RPC floor cancels.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.bvh.packed import pack_bvh
from ntrace_tpu.core import BuildConfig
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.render.renderer import build_accel
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace.packet_pallas import trace_packet

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_r4_roofline.json")


def emit(rec):
    rec = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    W, H, K = 1024, 768, 5
    scene = get_scene("conference", n_tris=280_000)
    flat = build_accel(scene, BuildConfig(
        builder="binned_sah", sah_tri_cost=0.02, max_leaf_size=48),
        use_cache=True)
    packed = pack_bvh(flat, scene.tri_verts(), tris_per_row=12,
                      nodes_per_row=8)
    nodes_dev = jax.device_put(jnp.asarray(packed.nodes8))
    tris_dev = jax.device_put(jnp.asarray(packed.tris12))
    cam = default_camera(scene.name)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(raygen.camera_arrays(cam, W, H), W, H,
                           jnp.asarray(order_px))
    R = batch.num_rays
    args = (batch.orig, batch.dirn, batch.tmin, batch.tmax)

    # --- stats pass: units per packet at rows 8 / 16 (ilv=1 only) ------
    unit_counts = {}
    for rows in (8, 16):
        tri, t, u, v, st = jax.block_until_ready(trace_packet(
            nodes_dev, tris_dev, *args, rows=rows, stats=True, slabbc=True))
        st = np.asarray(st)  # (packets, 2): [steps, leafrows]
        unit_counts[rows] = (float(st[:, 0].mean()), float(st[:, 1].mean()),
                             int(st[:, 0].sum()), int(st[:, 1].sum()))
        emit({"stage": "stats", "rows": rows,
              "steps_per_packet": unit_counts[rows][0],
              "leafrows_per_packet": unit_counts[rows][1],
              "steps_frame": unit_counts[rows][2],
              "leafrows_frame": unit_counts[rows][3],
              "packets": int(st.shape[0]),
              "steps_per_ray": unit_counts[rows][2] / R,
              "mt_tests_per_ray": unit_counts[rows][3] * rows * 128 * 12 / R})

    # --- chained-marginal timing: rows x ilv grid ----------------------
    def chained(k, rows, ilv):
        @jax.jit
        def run(o, d, tn, tx):
            acc = jnp.float32(0)
            tn2 = tn
            for _ in range(k):
                tri, t, _, _ = trace_packet(
                    nodes_dev, tris_dev, o, d, tn2, tx,
                    rows=rows, interleave=ilv, slabbc=True)
                acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                tn2 = tn + 1e-12 * acc
            return acc
        return run

    ref = None
    for rows in (8, 16):
        for ilv in (1, 2, 4, 8):
            t0 = time.time()
            try:
                r1 = chained(1, rows, ilv)
                a1 = float(jax.block_until_ready(r1(*args)))
            except Exception as e:
                emit({"stage": "marginal", "rows": rows, "ilv": ilv,
                      "failed": f"{type(e).__name__}: {str(e)[:160]}"})
                continue
            compile_s = time.time() - t0
            if ref is None:
                ref = a1
            walls = {}
            for k, run in ((1, r1), (K, chained(K, rows, ilv))):
                jax.block_until_ready(run(*args))
                best = 1e30
                for _ in range(3):
                    t1 = time.time()
                    jax.block_until_ready(run(*args))
                    best = min(best, time.time() - t1)
                walls[k] = best
            marg = (walls[K] - walls[1]) / (K - 1)
            rec = {"stage": "marginal", "rows": rows, "ilv": ilv,
                   "marginal_ms": marg * 1e3, "mrays": R / 1e6 / marg,
                   "wall1_ms": walls[1] * 1e3, "wallK_ms": walls[K] * 1e3,
                   "checksum_ok": abs(a1 - ref) < max(1e-6 * abs(ref), 1e-3),
                   "compile_s": compile_s}
            # ns per traversal unit from the stats pass (ilv shares units).
            if rows in unit_counts:
                units = unit_counts[rows][2] + unit_counts[rows][3]
                rec["ns_per_unit"] = marg * 1e9 / units
            emit(rec)


if __name__ == "__main__":
    main()
