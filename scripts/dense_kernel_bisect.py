"""Where do the dense kernel's milliseconds go? (conference, tile=16)

The r4 dense probe measured the full frame at 37.1 ms marginal while the
pure MT arithmetic floor is ~4.4 ms (92.9M pair-tests x ~45 VPU ops /
1024 lanes / 0.94 GHz) -- an ~8x overhead. This chains trace_dense_rows
ALONE (prep hoisted out; serialized via the tmin scalar) across knockout
variants to split the cost:

  base_ez{0,4}   -- the real kernel (early-z off/on)
  nowalk_ez0     -- zero tile visits: per-bin fixed cost (drep concats,
                    acc init, 8->1 roll reduce, output stores, loop ctl)
  groups1_ez0    -- 1 of 11 tri groups per visit: per-visit cost (row
                    load + index math) vs per-group MT arithmetic

Appends to results_dense_kernel_bisect.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace import binraster_dense as bd

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_dense_kernel_bisect.json")
W, H, TILE, K = 1024, 768, 16, 4


def emit(rec):
    rec = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    R = batch.num_rays
    ray_rows = TILE * TILE // 128
    txn, tyn = W // TILE, H // TILE
    nb = txn * tyn
    mcodes = jnp.asarray(bd.bin_mcodes(txn, tyn, 12))
    total, n_mid, n_g = (int(x) for x in bd.count_pairs_dense(
        verts, ca, width=W, height=H, tile=TILE, k_slots=8))
    p_max = bd.pick_quant(total, bd.TPT, 8 * bd.TPT)
    g_max = bd.pick_quant(n_mid + n_g, bd.TPT, 16 * bd.TPT)
    g2_max = bd.pick_quant(n_g, bd.TPT, 2 * bd.TPT)
    rows, row0, row1, g_r1, ok = jax.block_until_ready(
        bd.binraster_prep_dense(
            verts, ca, mcodes, width=W, height=H, tile=TILE, k_slots=8,
            g_max=g_max, p_max=p_max, g2_max=g2_max, z_bits=19))
    dirs = jnp.transpose(batch.dirn).reshape(3 * nb * ray_rows, 128)
    base_scalars = jnp.concatenate([
        ca["pos"].astype(jnp.float32),
        jnp.stack([ca["znear"], ca["zfar"], jnp.float32(0),
                   jnp.float32(0), jnp.float32(0)])])

    for tag, probe, ez in (("base_ez0", None, 0),
                           ("nowalk_ez0", "nowalk", 0),
                           ("groups1_ez0", "groups1", 0),
                           ("store0_ez0", "store0", 0)):
        def chain(k):
            @jax.jit
            def run(tn):
                acc = jnp.float32(0)
                for _ in range(k):
                    sc = base_scalars.at[3].set(tn + 1e-12 * acc)
                    tri, t, u, v = bd.trace_dense_rows(
                        rows, row0, row1, dirs, sc, g_r1, n_bins=nb,
                        ray_rows=ray_rows, ez_chunk=ez, probe=probe)
                    acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                return acc
            return run

        try:
            t0 = time.time()
            jax.block_until_ready(chain(1)(ca["znear"]))
            compile_s = time.time() - t0
            walls = {}
            for k in (1, K):
                run = chain(k)
                jax.block_until_ready(run(ca["znear"]))
                best = 1e30
                for _ in range(3):
                    t1 = time.time()
                    jax.block_until_ready(run(ca["znear"]))
                    best = min(best, time.time() - t1)
                walls[k] = best
            marg = (walls[K] - walls[1]) / (K - 1)
            emit({"stage": tag, "marginal_ms": marg * 1e3,
                  "mrays": R / 1e6 / marg, "wall1_ms": walls[1] * 1e3,
                  "compile_s": compile_s})
        except Exception as e:
            emit({"stage": tag,
                  "failed": f"{type(e).__name__}: {str(e)[:300]}"})


if __name__ == "__main__":
    main()
