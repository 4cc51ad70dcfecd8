#!/usr/bin/env python
"""Sort-key variants for incoherent (diffuse) rays: fairy, packet engine.

Generates one real diffuse bounce batch (primary hits + cosine bounce),
then traces it under different coherence orderings and measures the
steady-state marginal cost of the trace alone.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.bvh.packed import pack_bvh
from ntrace_tpu.core import BuildConfig, RenderConfig
from ntrace_tpu.ops.morton import morton_codes_3d
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.render.renderer import Renderer, build_accel
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace.packet_pallas import trace_packet

W, H = 1024, 768
scene = get_scene("fairy", n_tris=170_000)
bcfg = BuildConfig(builder="hlbvh", max_leaf_size=32)
flat = build_accel(scene, bcfg, use_cache=True)
r = Renderer(scene, bcfg, RenderConfig(width=W, height=H, engine="packet",
                                       packet_rows=16), flat=flat)
cam = default_camera("fairy")
order_px, _ = pixel_table(W, H)
batch = raygen.primary(raygen.camera_arrays(cam, W, H), W, H,
                       jnp.asarray(order_px))
tri, t, u, v = r._tracer(batch.orig, batch.dirn, batch.tmin, batch.tmax,
                         False)
alive = tri >= 0
normals = r._unit_normals(tri, batch.dirn)
hit = batch.orig + jnp.where(alive, t, 0.0)[:, None] * batch.dirn
key = jax.random.PRNGKey(7)
d = raygen.cosine_hemisphere(key, normals, (batch.num_rays,))
o = hit + normals * r.eps
tmin = jnp.zeros((batch.num_rays,), jnp.float32)
tmax = jnp.where(alive, jnp.float32(r.scene_scale * 10), 0.0)
print(f"bounce batch: {batch.num_rays} rays, alive {float(alive.mean()):.2f}",
      flush=True)

lo, hi = r.scene_lo, r.scene_hi
oc = morton_codes_3d(jnp, o, lo, hi)          # 30-bit origin morton
dn = d / jnp.linalg.norm(d, axis=1, keepdims=True)
q = jnp.clip(((dn + 1.0) * 2.0).astype(jnp.int32), 0, 3)   # 2 bits/axis


def interleave2(x, y, z):
    out = jnp.zeros_like(x)
    for b in range(2):
        out = (out
               | ((x >> b) & 1) << (3 * b + 2)
               | ((y >> b) & 1) << (3 * b + 1)
               | ((z >> b) & 1) << (3 * b + 0))
    return out


dir6 = interleave2(q[:, 0], q[:, 1], q[:, 2])
oct3 = ((dn[:, 0] >= 0).astype(jnp.int32) << 2
        | (dn[:, 1] >= 0).astype(jnp.int32) << 1
        | (dn[:, 2] >= 0).astype(jnp.int32))
dead = ~alive

q3 = jnp.clip(((dn + 1.0) * 4.0).astype(jnp.int32), 0, 7)   # 3 bits/axis
q4 = jnp.clip(((dn + 1.0) * 8.0).astype(jnp.int32), 0, 15)  # 4 bits/axis


def interleave_b(x, y, z, bits):
    out = jnp.zeros_like(x)
    for b in range(bits):
        out = (out
               | ((x >> b) & 1) << (3 * b + 2)
               | ((y >> b) & 1) << (3 * b + 1)
               | ((z >> b) & 1) << (3 * b + 0))
    return out


dir9 = interleave_b(q3[:, 0], q3[:, 1], q3[:, 2], 3)
dir12 = interleave_b(q4[:, 0], q4[:, 1], q4[:, 2], 4)
KEYS = {
    "dir6_first": (dir6 << 25) | (oc >> 5),
    "dir9_first": (dir9 << 22) | (oc >> 8),
    "dir12_first": (dir12 << 19) | (oc >> 11),
}

args_base = (o, d, tmin, tmax)
for name, k in KEYS.items():
    if k is None:
        perm = jnp.arange(batch.num_rays)
    else:
        k = jnp.where(dead, jnp.int32(0x7FFFFFFF), k)
        perm = jnp.argsort(k)
    oo, dd, tn, tx = (a[perm] for a in args_base)

    def chained(kk):
        @jax.jit
        def run(o, d, tn, tx):
            acc = jnp.float32(0)
            tn2 = tn
            for _ in range(kk):
                tri, t, u, v = trace_packet(
                    r.packed_nodes, r.packed_tris, o, d, tn2, tx,
                    rows=16, order="code",
                    tris_per_row=r.packed.tris_per_row,
                    nodes_per_row=r.packed.nodes_per_row,
                    leaf_unroll=r.leaf_unroll)
                acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                tn2 = tn + 1e-12 * acc
            return acc
        return run

    walls = {}
    for kk in (1, 4):
        run = chained(kk)
        jax.block_until_ready(run(oo, dd, tn, tx))
        best = 1e30
        for _ in range(3):
            t1 = time.time()
            jax.block_until_ready(run(oo, dd, tn, tx))
            best = min(best, time.time() - t1)
        walls[kk] = best
    marg = (walls[4] - walls[1]) / 3.0
    print(f"{name:14s}: marg {marg*1e3:7.1f} ms  "
          f"{batch.num_rays/1e6/marg:6.2f} Mrays/s", flush=True)
