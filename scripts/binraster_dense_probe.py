"""Device A/B: dense-lane bin-raster (v2) vs v1 vs packet on conference.

Stages (each appends a JSON record to results_binraster_dense.json):
  counts  -- pair totals per tile size (static bucket provenance)
  prep    -- chained-marginal prep cost per tile size
  full    -- chained-marginal prep+trace frame cost per (tile, ez) cfg
  golden  -- stride-sampled device hits vs the CPU golden tracer
Protocol: PERF_NOTES.md chained-marginal (K=1 vs K=4 in one jit,
serialized via tmin), best-of-3 walls.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.core import BuildConfig
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.render.renderer import build_accel
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace import binraster_dense as bd

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_binraster_dense.json")
W, H, K = 1024, 768, 4


def emit(rec):
    rec = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def marginal(run, args, k_hi=K, reps=3):
    walls = {}
    for k in (1, k_hi):
        jax.block_until_ready(run(k)(*args))
        best = 1e30
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(run(k)(*args))
            best = min(best, time.time() - t0)
        walls[k] = best
    return (walls[k_hi] - walls[1]) / (k_hi - 1), walls[1]


def main():
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    cam = default_camera(scene.name)
    ca = raygen.camera_arrays(cam, W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    R = batch.num_rays

    # CPU golden (stride sample) once.
    flat = build_accel(scene, BuildConfig(
        builder="binned_sah", sah_tri_cost=0.02, max_leaf_size=48),
        use_cache=True)
    from ntrace_tpu.trace.cpu import trace_cpu_golden

    sub = np.arange(0, R, max(R // 2048, 1))
    rec_g = trace_cpu_golden(
        flat, np.asarray(batch.orig)[sub], np.asarray(batch.dirn)[sub],
        np.asarray(batch.tmin)[sub], np.asarray(batch.tmax)[sub])

    for tile in (16, 32):
        ray_rows = tile * tile // 128
        txn, tyn = W // tile, H // tile
        nb = txn * tyn
        z_bits = 19
        mcodes = jnp.asarray(bd.bin_mcodes(txn, tyn, 31 - z_bits))
        k_slots = 8
        total, n_mid, n_g = (int(x) for x in bd.count_pairs_dense(
            verts, ca, width=W, height=H, tile=tile, k_slots=k_slots))
        p_max = bd.pick_quant(total, bd.TPT, 8 * bd.TPT)
        g_max = bd.pick_quant(n_mid + n_g, bd.TPT, 16 * bd.TPT)
        g2_max = bd.pick_quant(n_g, bd.TPT, 2 * bd.TPT)
        emit({"stage": "counts", "tile": tile, "total": total,
              "n_mid": n_mid, "n_g": n_g, "p_max": p_max,
              "g_max": g_max, "g2_max": g2_max,
              "table_mb": round((g2_max + p_max) / bd.TPT * 8 * 512 / 1e6,
                                1)})

        dirs = jnp.transpose(batch.dirn).reshape(3 * nb * ray_rows, 128)
        scalars = jnp.concatenate([
            ca["pos"].astype(jnp.float32),
            jnp.stack([ca["znear"], ca["zfar"], jnp.float32(0),
                       jnp.float32(0), jnp.float32(0)])])

        def prep(c):
            return bd.binraster_prep_dense(
                verts, c, mcodes, width=W, height=H, tile=tile,
                k_slots=k_slots, g_max=g_max, p_max=p_max,
                g2_max=g2_max, z_bits=z_bits)

        def prep_chain(k):
            @jax.jit
            def run(pos):
                acc = jnp.float32(0)
                c = dict(ca)
                for _ in range(k):
                    c = dict(c, pos=pos + 1e-12 * acc)
                    rows, *_ = prep(c)
                    acc = acc + rows[0, 0]
                return acc
            return run

        try:
            pm, pw1 = marginal(prep_chain, (ca["pos"],))
            emit({"stage": "prep", "tile": tile, "marginal_ms": pm * 1e3,
                  "wall1_ms": pw1 * 1e3})
        except Exception as e:
            emit({"stage": "prep", "tile": tile,
                  "failed": f"{type(e).__name__}: {str(e)[:200]}"})
            continue

        for ez in (4, 0, 8):
            cfg = f"t{tile}_ez{ez}"

            def full_chain(k):
                @jax.jit
                def run(tn):
                    acc = jnp.float32(0)
                    tri = None
                    for _ in range(k):
                        rows, row0, row1, g_r1, ok = prep(
                            dict(ca, znear=ca["znear"] + 1e-12 * acc))
                        sc = scalars.at[3].set(tn + 1e-12 * acc)
                        tri, t, u, v = bd.trace_dense_rows(
                            rows, row0, row1, dirs, sc, g_r1,
                            n_bins=nb, ray_rows=ray_rows, ez_chunk=ez)
                        tri = jnp.where(ok, tri, -2)
                        acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                    return acc, tri
                return run

            try:
                t0 = time.time()
                acc1, tri1 = full_chain(1)(batch.tmin[0])
                jax.block_until_ready(acc1)
                compile_s = time.time() - t0
                walls = {}
                for k in (1, K):
                    run = full_chain(k)
                    jax.block_until_ready(run(batch.tmin[0])[0])
                    best = 1e30
                    for _ in range(3):
                        t1 = time.time()
                        jax.block_until_ready(run(batch.tmin[0])[0])
                        best = min(best, time.time() - t1)
                    walls[k] = best
                marg = (walls[K] - walls[1]) / (K - 1)
                emit({"stage": "full", "cfg": cfg,
                      "marginal_ms": marg * 1e3, "mrays": R / 1e6 / marg,
                      "wall1_ms": walls[1] * 1e3, "compile_s": compile_s})
                dev_tri = np.asarray(tri1)[sub]
                mism = int((dev_tri != rec_g.tri).sum())
                emit({"stage": "golden", "cfg": cfg, "sampled": len(sub),
                      "mismatches": mism, "match": mism == 0})
            except Exception as e:
                emit({"stage": "full", "cfg": cfg,
                      "failed": f"{type(e).__name__}: {str(e)[:300]}"})


if __name__ == "__main__":
    main()
