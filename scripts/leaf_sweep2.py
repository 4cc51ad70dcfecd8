#!/usr/bin/env python
"""Extended leaf-fatness x row-layout sweep for the packet engine."""

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

W, H = 1024, 768
scene = get_scene(os.environ.get("SCENE", "conference"))
cam = default_camera(scene.name)
order_px, _ = pixel_table(W, H)
batch = raygen.primary(raygen.camera_arrays(cam, W, H), W, H,
                       jnp.asarray(order_px))
R = batch.num_rays
args = (batch.orig, batch.dirn, batch.tmin, batch.tmax)

# (tri_cost, max_leaf, tpr, rows, leaf_unroll)
import ast
CONFIGS = ast.literal_eval(os.environ.get("CONFIGS", "[]")) or [
    (0.05, 32, 12, 16, 1),
    (0.05, 32, 12, 16, 2),
    (0.05, 32, 12, 16, 4),
    (0.02, 48, 12, 16, 2),
    (0.02, 48, 12, 16, 4),
    (0.01, 64, 12, 16, 4),
]

ref = None
for tri_cost, max_leaf, tpr, rows, lu in CONFIGS:
    cfg = BuildConfig(builder=os.environ.get("BUILDER", "binned_sah"),
                      sah_tri_cost=tri_cost, max_leaf_size=max_leaf)
    t0 = time.time()
    flat = build_accel(scene, cfg, use_cache=True)
    n_refs = int((flat.tri_index >= 0).sum())
    packed = pack_bvh(flat, scene.tri_verts(), tris_per_row=tpr,
                      nodes_per_row=1)
    nodes_dev = jax.device_put(jnp.asarray(packed.nodes8))
    tris_dev = jax.device_put(jnp.asarray(packed.tris12))
    build_s = time.time() - t0

    def chained(k):
        @jax.jit
        def run(o, d, tn, tx):
            acc = jnp.float32(0)
            tn2 = tn
            tri = None
            for _ in range(k):
                tri, t, u, v = trace_packet(
                    nodes_dev, tris_dev, o, d, tn2, tx, rows=rows,
                    order="code", tris_per_row=packed.tris_per_row,
                    nodes_per_row=1)
                acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                tn2 = tn + 1e-12 * acc
            return acc, tri
        return run

    walls = {}
    sums = None
    for k in (1, 4):
        run = chained(k)
        acc, tri = run(*args)
        jax.block_until_ready(acc)
        sums = float(acc) / k
        best = 1e30
        for _ in range(3):
            t1 = time.time()
            jax.block_until_ready(run(*args)[0])
            best = min(best, time.time() - t1)
        walls[k] = best
    marg = (walls[4] - walls[1]) / 3.0
    mrays = R / 1e6 / marg
    if ref is None:
        ref = sums
    ok = abs(sums - ref) < 1e-3 * abs(ref)
    mb = (nodes_dev.nbytes + tris_dev.nbytes) / 1e6
    print(f"tc={tri_cost:4.2f} leaf={max_leaf:2d} tpr={tpr:2d} rows={rows:2d} lu={lu}: "
          f"nodes={flat.nodes.shape[0]:6d} sah={flat.sah_cost:6.1f} "
          f"vmem={mb:5.1f}MB marg={marg*1e3:6.1f} ms  {mrays:6.2f} Mrays/s "
          f"build={build_s:.0f}s sum_ok={ok}", flush=True)
