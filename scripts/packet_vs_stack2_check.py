#!/usr/bin/env python
"""On-chip correctness check: packet kernel vs stack2 on the same tree.

Counts mismatched hit ids/t on full-conference primary rays for several
(leaf, lu) configs. Small output arrays only (counts), tunnel-safe.
"""

import os
import sys

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
from ntrace_tpu.trace.stack2_jax import trace_stack2
from ntrace_tpu.trace.unified import unify_tables

W, H = 1024, 768
scene = get_scene("conference")
cam = default_camera("conference")
order_px, _ = pixel_table(W, H)
b = raygen.primary(raygen.camera_arrays(cam, W, H), W, H,
                   jnp.asarray(order_px))

for builder, tc, ml, lu in [("lbvh", 0.02, 32, 4), ("lbvh", 0.02, 48, 4),
                            ("lbvh", 0.02, 48, 1), ("lbvh", 0.02, 64, 4),
                            ("binned_sah", 0.02, 48, 4)]:
    cfg = BuildConfig(builder=builder, sah_tri_cost=tc, max_leaf_size=ml)
    flat = build_accel(scene, cfg, use_cache=True)
    packed = pack_bvh(flat, scene.tri_verts(), tris_per_row=12,
                      nodes_per_row=1)
    nd = jax.device_put(jnp.asarray(packed.nodes8))
    td = jax.device_put(jnp.asarray(packed.tris12))
    ut, n_nodes = unify_tables(flat)
    utd = jax.device_put(jnp.asarray(ut))

    @jax.jit
    def check(o, d, tn, tx):
        tri_p, t_p, u_p, v_p = trace_packet(
            nd, td, o, d, tn, tx, rows=16, order="code", tris_per_row=12,
            nodes_per_row=1, leaf_unroll=lu)
        # stack2 chunks of 8k inside one jit
        R = o.shape[0]
        outs = []
        CH = 1 << 13
        for s in range(0, R, CH):
            outs.append(trace_stack2(utd, n_nodes, o[s:s+CH], d[s:s+CH],
                                     tn[s:s+CH], tx[s:s+CH]))
        tri_s = jnp.concatenate([x[0] for x in outs])
        t_s = jnp.concatenate([x[1] for x in outs])
        id_bad = (tri_p != tri_s).sum()
        t_bad = (jnp.abs(t_p - t_s) > 1e-5 * jnp.maximum(
            jnp.abs(t_s), 1.0)).sum()
        return id_bad, t_bad, (tri_p >= 0).sum(), (tri_s >= 0).sum()

    ib, tb, hp, hs = check(b.orig, b.dirn, b.tmin, b.tmax)
    print(f"{builder} leaf={ml} lu={lu}: id_mismatch={int(ib)} "
          f"t_mismatch={int(tb)} hits packet={int(hp)} stack2={int(hs)} "
          f"/ {b.num_rays}", flush=True)
