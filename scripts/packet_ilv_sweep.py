"""Sweep packet-kernel interleave factors (rows x ilv x order) on the TPU."""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ntrace_tpu.bvh.packed import pack_bvh
from ntrace_tpu.core import BuildConfig
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.render.renderer import build_accel
from ntrace_tpu.scenes import default_camera, get_scene

from ntrace_tpu.trace.packet_pallas import trace_packet

scene_name = sys.argv[1] if len(sys.argv) > 1 else "conference"
# combo format: rows x ilv [x tpr x npr]; tpr/npr default 12/8
combos = sys.argv[2] if len(sys.argv) > 2 else (
    "16x1x12x8,16x1x4x8,16x1x4x1,8x1x4x1,16x2x4x1,8x4x4x1")
W, H = 1024, 768
scene = get_scene(scene_name)
flat = build_accel(scene, BuildConfig(builder="binned_sah"), use_cache=True)
packs = {}
def get_pack(tpr, npr):
    if (tpr, npr) not in packs:
        packs[(tpr, npr)] = pack_bvh(flat, scene.tri_verts(),
                                     tris_per_row=tpr, nodes_per_row=npr)
        p = packs[(tpr, npr)]
        print(f"layout t{tpr}n{npr}: nodes8 {p.nodes8.nbytes/1e6:.1f} MB, "
              f"tris12 {p.tris12.nbytes/1e6:.1f} MB", flush=True)
    return packs[(tpr, npr)]
cam = default_camera(scene.name)
order_px, _ = pixel_table(W, H)
batch = raygen.primary(raygen.camera_arrays(cam, W, H), W, H,
                       jnp.asarray(order_px))
R = batch.num_rays
args = (batch.orig, batch.dirn, batch.tmin, batch.tmax)

ref_sums = None
results = {}
for combo, order in itertools.product(combos.split(","), ("code",)):
    parts = list(map(int, combo.split("x")))
    rows, ilv = parts[0], parts[1]
    tpr = parts[2] if len(parts) > 2 else 12
    npr = parts[3] if len(parts) > 3 else 8
    packed = get_pack(tpr, npr)
    nodes_dev = jax.device_put(jnp.asarray(packed.nodes8))
    tris_dev = jax.device_put(jnp.asarray(packed.tris12))

    @jax.jit
    def run(o, d, tn, tx):
        tri, t, u, v = trace_packet(nodes_dev, tris_dev, o, d, tn, tx,
                                    rows=rows, order=order, interleave=ilv,
                                    tris_per_row=tpr, nodes_per_row=npr)
        return (tri.astype(jnp.int64).sum(),
                jnp.where(tri >= 0, t, 0.0).sum(), (tri >= 0).sum())

    t0 = time.time()
    try:
        sums = tuple(map(float, jax.block_until_ready(run(*args))))
    except Exception as e:
        print(f"rows={rows} ilv={ilv}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        continue
    compile_s = time.time() - t0
    if ref_sums is None:
        ref_sums = sums
    match = "OK" if all(abs(a - b) < max(1e-6 * abs(a), 1e-3)
                        for a, b in zip(sums, ref_sums)) else "MISMATCH"
    best = 1e30
    for _ in range(4):
        t0 = time.time()
        jax.block_until_ready(run(*args))
        best = min(best, time.time() - t0)
    mrays = R / 1e6 / best
    results[f"r{rows}_i{ilv}_t{tpr}_n{npr}"] = round(mrays, 2)
    print(f"rows={rows:2d} ilv={ilv} t{tpr:2d} n{npr}: {best*1e3:6.1f} ms "
          f"{mrays:6.2f} Mrays/s  checksums {match} (compile {compile_s:.0f}s)",
          flush=True)

print(json.dumps({"scene": scene.name, "rays": R, "mrays": results}))
