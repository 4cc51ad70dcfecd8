#!/usr/bin/env python
"""Leaf-fatness sweep for the packet engine (conference primary).

The packet kernel's node step and leaf row cost roughly the same
(~350-400 ns serial, PERF_NOTES.md); a 12-slot leaf row tests 12 tris for
one step's price, so SAH's per-tri leaf cost model (tri_cost=1) over-splits
for this engine. Sweep (sah_tri_cost, max_leaf_size) and measure the
steady-state marginal frame + kernel unit counts.
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

W, H = 1024, 768
ROWS = 16
scene = get_scene(os.environ.get("SCENE", "conference"))
cam = default_camera(scene.name)
order_px, _ = pixel_table(W, H)
batch = raygen.primary(raygen.camera_arrays(cam, W, H), W, H,
                       jnp.asarray(order_px))
R = batch.num_rays
args = (batch.orig, batch.dirn, batch.tmin, batch.tmax)

CONFIGS = [
    (1.0, 8),    # current bench baseline
    (0.5, 8),
    (0.3, 12),
    (0.2, 16),
    (0.1, 16),
    (0.1, 24),
]

ref = None
for tri_cost, max_leaf in CONFIGS:
    cfg = BuildConfig(builder="binned_sah", sah_tri_cost=tri_cost,
                      max_leaf_size=max_leaf)
    t0 = time.time()
    flat = build_accel(scene, cfg, use_cache=True)
    n_refs = int((flat.tri_index >= 0).sum())
    tpr, npr = pick_layout(flat.nodes.shape[0], n_refs)
    packed = pack_bvh(flat, scene.tri_verts(), tris_per_row=tpr,
                      nodes_per_row=npr)
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
                    nodes_dev, tris_dev, o, d, tn2, tx, rows=ROWS,
                    order="code", tris_per_row=packed.tris_per_row,
                    nodes_per_row=packed.nodes_per_row)
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
    print(f"tri_cost={tri_cost:4.2f} leaf={max_leaf:2d}: "
          f"nodes={flat.nodes.shape[0]:7d} refs={n_refs:7d} "
          f"sah={flat.sah_cost:6.1f} tpr={tpr} "
          f"marg={marg*1e3:6.1f} ms  {mrays:6.2f} Mrays/s "
          f"build={build_s:.0f}s sum_ok={ok}", flush=True)
