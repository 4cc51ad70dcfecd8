"""Benchmark the Pallas packet engine on the real TPU.

Usage: python scripts/bench_packet.py [scene] [mode] [rows ...]

Timing protocol per PERF_NOTES.md metrology: the traced outputs are reduced
to scalars INSIDE one jit so the measurement never ships a large array
through the axon tunnel. Run serialized (nothing else may own the chip).
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
from ntrace_tpu.core import BuildConfig, RenderConfig
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.render.renderer import build_accel
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace.packet_pallas import trace_packet

scene_name = sys.argv[1] if len(sys.argv) > 1 else "conference"
mode = sys.argv[2] if len(sys.argv) > 2 else "primary"
rows_list = [int(x) for x in sys.argv[3:]] or [8, 16]

W, H = 1024, 768
scene = get_scene(scene_name)
print(f"scene {scene.name}: {scene.num_tris} tris", flush=True)
t0 = time.time()
flat = build_accel(scene, BuildConfig(builder="binned_sah"), use_cache=True)
print(f"build/cache: {time.time()-t0:.1f}s sah={flat.sah_cost:.1f}", flush=True)
packed = pack_bvh(flat, scene.tri_verts())
print(f"packed: nodes8 {packed.nodes8.shape} ({packed.nodes8.nbytes/1e6:.1f} MB) "
      f"tris12 {packed.tris12.shape} ({packed.tris12.nbytes/1e6:.1f} MB)", flush=True)

cam = default_camera(scene.name)
order, _ = pixel_table(W, H)
batch = raygen.primary(raygen.camera_arrays(cam, W, H), W, H, jnp.asarray(order))
R = batch.num_rays

nodes_dev = jax.device_put(jnp.asarray(packed.nodes8))
tris_dev = jax.device_put(jnp.asarray(packed.tris12))
o = jax.device_put(batch.orig)
d = jax.device_put(batch.dirn)
tn = jax.device_put(batch.tmin)
tx = jax.device_put(batch.tmax)

results = {}
for rows in rows_list:
    @jax.jit
    def run_scalar(o, d, tn, tx):
        tri, t, u, v = trace_packet(nodes_dev, tris_dev, o, d, tn, tx,
                                    any_hit=False, rows=rows)
        return tri.sum(), jnp.where(tri >= 0, t, 0.0).sum(), (tri >= 0).sum()

    print(f"--- rows={rows} compiling...", flush=True)
    t0 = time.time()
    s1, s2, nhit = jax.block_until_ready(run_scalar(o, d, tn, tx))
    print(f"compile+first: {time.time()-t0:.1f}s  hits={int(nhit)}/{R} "
          f"id_sum={int(s1)} t_sum={float(s2):.3f}", flush=True)
    best = 1e30
    for rep in range(5):
        t0 = time.time()
        jax.block_until_ready(run_scalar(o, d, tn, tx))
        dt = time.time() - t0
        best = min(best, dt)
        print(f"  rep {rep}: {dt*1e3:.1f} ms -> {R/1e6/dt:.2f} Mrays/s", flush=True)
    results[rows] = {"ms": best * 1e3, "mrays": R / 1e6 / best,
                     "hits": int(nhit)}

print(json.dumps({"scene": scene.name, "mode": mode, "rays": R,
                  "results": results}))
