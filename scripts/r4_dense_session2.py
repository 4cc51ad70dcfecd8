"""Round-4 dense-engine device session 2.

Stages (appends JSON lines to results_r4_dense2.json):
  kernel_grouped -- the grouped-aligned-store kernel (this session's
                    restructure) vs the r4 bisect's 4.20 ms baseline,
                    t16_ez0 and t32_ez0, kernel-only chained marginal.
  sortcost       -- lax.sort cost: (key + 10 payload f32) at 2.33M (the
                    current prep's tier-stack size) and at 462k (the
                    compact-then-sort candidate), plus key+idx-only at
                    both sizes. All outputs consumed (no sort-operand
                    DCE -- the r4 full_fori 9.5 ms vs in-frame ~26 ms
                    gap was exactly DCE'd sort operands).
  fullframe      -- prep + grouped kernel chained (the honest
                    prep-included frame) at t16_ez0.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace import binraster_dense as bd

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_r4_dense2.json")
W, H, K = 1024, 768, 4


def emit(rec):
    rec = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def marginal(chain, args, k_hi=K, reps=3):
    t0 = time.time()
    jax.block_until_ready(chain(1)(*args))
    compile_s = time.time() - t0
    walls = {}
    for k in (1, k_hi):
        run = chain(k)
        jax.block_until_ready(run(*args))
        best = 1e30
        for _ in range(reps):
            t1 = time.time()
            jax.block_until_ready(run(*args))
            best = min(best, time.time() - t1)
        walls[k] = best
    return ((walls[k_hi] - walls[1]) / (k_hi - 1), walls[1], compile_s)


def main():
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    R = batch.num_rays

    # CPU golden stride sample for correctness gating of the new kernel.
    from ntrace_tpu.core import BuildConfig
    from ntrace_tpu.render.renderer import build_accel
    from ntrace_tpu.trace.cpu import trace_cpu_golden

    flat = build_accel(scene, BuildConfig(
        builder="binned_sah", sah_tri_cost=0.02, max_leaf_size=48),
        use_cache=True)
    sub = np.arange(0, R, max(R // 2048, 1))
    rec_g = trace_cpu_golden(
        flat, np.asarray(batch.orig)[sub], np.asarray(batch.dirn)[sub],
        np.asarray(batch.tmin)[sub], np.asarray(batch.tmax)[sub])

    for tile in (16, 32):
        ray_rows = tile * tile // 128
        txn, tyn = W // tile, H // tile
        nb = txn * tyn
        mcodes = jnp.asarray(bd.bin_mcodes(txn, tyn, 12))
        total, n_mid, n_g = (int(x) for x in bd.count_pairs_dense(
            verts, ca, width=W, height=H, tile=tile, k_slots=8))
        p_max = bd.pick_quant(total, bd.TPT, 8 * bd.TPT)
        g_max = bd.pick_quant(n_mid + n_g, bd.TPT, 16 * bd.TPT)
        g2_max = bd.pick_quant(n_g, bd.TPT, 2 * bd.TPT)
        prep_out = jax.block_until_ready(bd.binraster_prep_dense(
            verts, ca, mcodes, width=W, height=H, tile=tile, k_slots=8,
            g_max=g_max, p_max=p_max, g2_max=g2_max, z_bits=19))
        rows, row0, row1, g_r1, ok = prep_out
        dirs = jnp.transpose(batch.dirn).reshape(3 * nb * ray_rows, 128)
        base_scalars = jnp.concatenate([
            ca["pos"].astype(jnp.float32),
            jnp.stack([ca["znear"], ca["zfar"], jnp.float32(0),
                       jnp.float32(0), jnp.float32(0)])])

        def kchain(k):
            @jax.jit
            def run(tn):
                acc = jnp.float32(0)
                tri = None
                for _ in range(k):
                    sc = base_scalars.at[3].set(tn + 1e-12 * acc)
                    tri, t, u, v = bd.trace_dense_rows(
                        rows, row0, row1, dirs, sc, g_r1, n_bins=nb,
                        ray_rows=ray_rows, ez_chunk=0)
                    acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                return acc, tri
            return run

        try:
            marg, w1, cs = marginal(kchain, (ca["znear"],))
            _, tri1 = kchain(1)(ca["znear"])
            mism = int((np.asarray(tri1)[sub] != rec_g.tri).sum())
            emit({"stage": "kernel_grouped", "tile": tile,
                  "marginal_ms": marg * 1e3, "mrays": R / 1e6 / marg,
                  "wall1_ms": w1 * 1e3, "compile_s": cs,
                  "golden_mismatches": mism, "golden_match": mism == 0})
        except Exception as e:
            emit({"stage": "kernel_grouped", "tile": tile,
                  "failed": f"{type(e).__name__}: {str(e)[:300]}"})
        if tile != 16:
            continue

        # Honest full frame: prep + grouped kernel chained.
        def fchain(k):
            @jax.jit
            def run(tn):
                acc = jnp.float32(0)
                tri = None
                for _ in range(k):
                    rws, r0, r1, g1, okk = bd.binraster_prep_dense(
                        verts + 1e-30 * acc, ca, mcodes, width=W,
                        height=H, tile=tile, k_slots=8, g_max=g_max,
                        p_max=p_max, g2_max=g2_max, z_bits=19)
                    sc = base_scalars.at[3].set(tn + 1e-12 * acc)
                    tri, t, u, v = bd.trace_dense_rows(
                        rws, r0, r1, dirs, sc, g1, n_bins=nb,
                        ray_rows=ray_rows, ez_chunk=0)
                    acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                return acc, tri
            return run

        try:
            marg, w1, cs = marginal(fchain, (ca["znear"],))
            emit({"stage": "fullframe", "tile": tile,
                  "marginal_ms": marg * 1e3, "mrays": R / 1e6 / marg,
                  "wall1_ms": w1 * 1e3, "compile_s": cs})
        except Exception as e:
            emit({"stage": "fullframe", "tile": tile,
                  "failed": f"{type(e).__name__}: {str(e)[:300]}"})

    # ---- raw sort costs (prep-v2 design input) -----------------------
    rng = np.random.default_rng(0)
    for n_el, n_pay, tag in ((2_333_000, 10, "sort_2.3M_11op"),
                             (462_440, 10, "sort_462k_11op"),
                             (2_333_000, 1, "sort_2.3M_2op"),
                             (462_440, 1, "sort_462k_2op")):
        keys0 = jnp.asarray(rng.integers(0, 1 << 30, n_el, np.int32))
        pays = [jnp.asarray(rng.normal(size=n_el).astype(np.float32))
                for _ in range(n_pay)]

        def schain(k):
            @jax.jit
            def run(key0):
                acc = jnp.float32(0)
                kk = key0
                for _ in range(k):
                    srt = jax.lax.sort((kk,) + tuple(pays), num_keys=1)
                    acc = acc + sum(s.sum() for s in srt[1:]) * 1e-9
                    acc = acc + srt[0].sum().astype(jnp.float32) * 1e-12
                    kk = key0 ^ acc.astype(jnp.int32)
                return acc
            return run

        try:
            marg, w1, cs = marginal(schain, (keys0,), reps=2)
            emit({"stage": tag, "marginal_ms": marg * 1e3,
                  "wall1_ms": w1 * 1e3, "compile_s": cs})
        except Exception as e:
            emit({"stage": tag,
                  "failed": f"{type(e).__name__}: {str(e)[:300]}"})


if __name__ == "__main__":
    main()
