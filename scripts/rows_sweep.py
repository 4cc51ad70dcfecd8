#!/usr/bin/env python
"""Sweep packet size (rows) for the cond packet kernel on conference primary.

Motivation (PERF_NOTES.md round-2 findings): the packet step is bound by the
per-step SERIAL scalar chain, which is independent of lane count ("fat vs
thin bodies add ~0"). A bigger packet shares ONE chain across more rays; the
only cost is union growth (a packet visits the union of its rays' nodes).
This measures where the trade turns over, and records units/packet (stats
mode) to calibrate the treelet-kernel design.

Protocol: chained scalar-output jits (K=1 vs K=5 marginal), PERF_NOTES
metrology. Run with nohup, never under a killing timeout. One TPU process.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.bvh.packed import pack_bvh, pick_layout
from ntrace_tpu.core import BuildConfig
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.render.renderer import build_accel
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace.packet_pallas import trace_packet

t0 = time.time()
scene = get_scene("conference", n_tris=280_000)
bcfg = BuildConfig(builder="binned_sah", sah_tri_cost=0.02, max_leaf_size=48)
flat = build_accel(scene, bcfg, use_cache=True)
n_refs = int((flat.tri_index >= 0).sum())
enc = np.ascontiguousarray(flat.nodes[:, 12:14]).view(np.int32)
avg_leaf = n_refs / max(int((enc < 0).sum()), 1)
tpr, npr = pick_layout(flat.nodes.shape[0], n_refs, avg_leaf=avg_leaf)
pk = pack_bvh(flat, scene.tri_verts(), tris_per_row=tpr, nodes_per_row=npr)
nodes_d = jax.device_put(jnp.asarray(pk.nodes8))
tris_d = jax.device_put(jnp.asarray(pk.tris12))
lu = 4 if avg_leaf >= 6.0 else 1
print(f"[sweep] nodes={flat.nodes.shape[0]} sah={flat.sah_cost:.1f} "
      f"avg_leaf={avg_leaf:.1f} tpr={tpr} npr={npr} lu={lu} "
      f"({time.time()-t0:.0f}s)", flush=True)

W, H = 1024, 768
order_px, _ = pixel_table(W, H)
batch = raygen.primary(raygen.camera_arrays(default_camera("conference"), W, H),
                       W, H, jnp.asarray(order_px))
R = batch.num_rays
args = (batch.orig, batch.dirn, batch.tmin, batch.tmax)

results = []
for rows in (8, 16, 32, 64):
    def chained(k, rows=rows):
        @jax.jit
        def run(o, d, tn, tx):
            acc = jnp.float32(0)
            tn2 = tn
            for _ in range(k):
                tri, t, u, v = trace_packet(
                    nodes_d, tris_d, o, d, tn2, tx, rows=rows, order="code",
                    tris_per_row=tpr, nodes_per_row=npr, leaf_unroll=lu)
                acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                tn2 = tn + 1e-12 * acc
            return acc
        return run

    walls = {}
    for k in (1, 5):
        run = chained(k)
        jax.block_until_ready(run(*args))
        best = 1e30
        for _ in range(3):
            t1 = time.time()
            jax.block_until_ready(run(*args))
            best = min(best, time.time() - t1)
        walls[k] = best
    marg = (walls[5] - walls[1]) / 4
    mrays = R / 1e6 / marg

    # Unit counts (stats mode: lane0 = inner steps, lane1 = leaf rows).
    st = trace_packet(nodes_d, tris_d, *args, rows=rows, order="code",
                      tris_per_row=tpr, nodes_per_row=npr, stats=True)[4]
    st = np.asarray(st)
    packets = st.shape[0]
    steps, leafrows = st[:, 0].astype(np.int64), st[:, 1].astype(np.int64)
    rec = dict(rows=rows, rays_per_packet=rows * 128, packets=packets,
               wall1_ms=round(walls[1] * 1e3, 1),
               marginal_ms=round(marg * 1e3, 2), mrays=round(mrays, 1),
               steps_mean=round(float(steps.mean()), 1),
               steps_sum=int(steps.sum()),
               leafrows_mean=round(float(leafrows.mean()), 1),
               leafrows_sum=int(leafrows.sum()),
               ns_per_unit=round(marg * 1e9 / max(steps.sum() + leafrows.sum(), 1), 1))
    results.append(rec)
    print(f"[sweep] {json.dumps(rec)}", flush=True)

with open("results_rows_sweep.json", "w") as f:
    json.dump(results, f, indent=2)
print("SWEEP DONE", flush=True)
