"""Round-4 dense-engine device session 3: prep-v3 + tpv kernel knob.

Stages (appends JSON lines to results_r4_dense3.json):
  prep3          -- binraster_prep_dense3 chained marginal (the
                    gather-free delta-scatter expand + compact 11-op
                    sort), vs the v2 prep's ~27 ms.
  kernel_tpv     -- grouped kernel at tpv {1,2,4,8}, tile 16, ez0,
                    kernel-only chained marginal + golden stride gate.
  fullframe3     -- prep3 + kernel chained at the best tpv (the honest
                    prep-included frame, bench.py protocol).
  golden_full    -- full-frame device-vs-CPU-golden hit-id compare for
                    the best config (tie-aware not needed: dense engine
                    implements the same lex (t, tri) rule as the golden).
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
                   "results_r4_dense3.json")
W, H, K = 1024, 768, 4
TILE = 16


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

    ray_rows = TILE * TILE // 128
    txn, tyn = W // TILE, H // TILE
    nb = txn * tyn
    z_bits = 12
    mcodes = jnp.asarray(bd.bin_mcodes(txn, tyn, 31 - z_bits))
    total, n_mid, n_g = (int(x) for x in bd.count_pairs_dense(
        verts, ca, width=W, height=H, tile=TILE, k_slots=64, k2_slots=64))
    p_max = bd.pick_quant(total + n_mid, bd.TPT, 8 * bd.TPT)
    g2_max = bd.pick_quant(n_g, bd.TPT, bd.TPT) if n_g else 0
    emit({"stage": "counts3", "total": total, "n_mid": n_mid, "n_g": n_g,
          "p_max": p_max, "g2_max": g2_max,
          "table_mb": p_max / bd.TPT * 8 * 128 * 4 / 1e6})

    # ---- prep3 marginal --------------------------------------------------
    def pchain(k):
        @jax.jit
        def run(tn):
            acc = jnp.float32(0)
            for _ in range(k):
                rows, r0, r1, g1, ok = bd.binraster_prep_dense3(
                    verts + 1e-30 * acc, ca, mcodes, width=W, height=H,
                    tile=TILE, k_cap=64, p_max=p_max, g2_max=g2_max,
                    z_bits=z_bits)
                # FULL consumption: strided sampling invites partial
                # simplification that under-reads the cost (the
                # results_prep_primitives.json scatter lesson).
                acc = (acc + rows.sum()
                       + (r0 + r1).sum().astype(jnp.float32))
            return acc
        return run

    try:
        marg, w1, cs = marginal(pchain, (ca["znear"],))
        emit({"stage": "prep3", "marginal_ms": marg * 1e3,
              "wall1_ms": w1 * 1e3, "compile_s": cs})
    except Exception as e:
        emit({"stage": "prep3",
              "failed": f"{type(e).__name__}: {str(e)[:300]}"})
        return

    prep_out = jax.block_until_ready(bd.binraster_prep_dense3(
        verts, ca, mcodes, width=W, height=H, tile=TILE, k_cap=64,
        p_max=p_max, g2_max=g2_max, z_bits=z_bits))
    rows, row0, row1, g1, ok = prep_out
    assert bool(ok), "static buckets overflowed"
    dirs = jnp.transpose(batch.dirn).reshape(3 * nb * ray_rows, 128)
    base_scalars = jnp.concatenate([
        ca["pos"].astype(jnp.float32),
        jnp.stack([ca["znear"], ca["zfar"], jnp.float32(0),
                   jnp.float32(0), jnp.float32(0)])])

    # ---- kernel tpv sweep ------------------------------------------------
    best = (None, 1e30)
    for tpv in (1, 2, 4, 8):
        def kchain(k, tpv=tpv):
            @jax.jit
            def run(tn):
                acc = jnp.float32(0)
                tri = None
                for _ in range(k):
                    sc = base_scalars.at[3].set(tn + 1e-12 * acc)
                    tri, t, u, v = bd.trace_dense_rows(
                        rows, row0, row1, dirs, sc, g1, n_bins=nb,
                        ray_rows=ray_rows, ez_chunk=0, tpv=tpv)
                    acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                return acc, tri
            return run

        try:
            marg, w1, cs = marginal(kchain, (ca["znear"],))
            _, tri1 = kchain(1)(ca["znear"])
            mism = int((np.asarray(tri1)[sub] != rec_g.tri).sum())
            emit({"stage": "kernel_tpv", "tpv": tpv,
                  "marginal_ms": marg * 1e3, "mrays": R / 1e6 / marg,
                  "wall1_ms": w1 * 1e3, "compile_s": cs,
                  "golden_mismatches": mism, "golden_match": mism == 0})
            if mism == 0 and marg < best[1]:
                best = (tpv, marg)
        except Exception as e:
            emit({"stage": "kernel_tpv", "tpv": tpv,
                  "failed": f"{type(e).__name__}: {str(e)[:300]}"})

    if best[0] is None:
        return
    tpv = best[0]

    # ---- honest full frame: prep3 + kernel chained -----------------------
    def fchain(k):
        @jax.jit
        def run(tn):
            acc = jnp.float32(0)
            tri = None
            for _ in range(k):
                rws, r0, r1, gg1, okk = bd.binraster_prep_dense3(
                    verts + 1e-30 * acc, ca, mcodes, width=W, height=H,
                    tile=TILE, k_cap=64, p_max=p_max, g2_max=g2_max,
                    z_bits=z_bits)
                sc = base_scalars.at[3].set(tn + 1e-12 * acc)
                tri, t, u, v = bd.trace_dense_rows(
                    rws, r0, r1, dirs, sc, gg1, n_bins=nb,
                    ray_rows=ray_rows, ez_chunk=0, tpv=tpv)
                acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
            return acc, tri
        return run

    try:
        marg, w1, cs = marginal(fchain, (ca["znear"],))
        _, trif = fchain(1)(ca["znear"])
        mism = int((np.asarray(trif)[sub] != rec_g.tri).sum())
        emit({"stage": "fullframe3", "tile": TILE, "tpv": tpv,
              "marginal_ms": marg * 1e3, "mrays": R / 1e6 / marg,
              "wall1_ms": w1 * 1e3, "compile_s": cs,
              "golden_mismatches": mism, "golden_match": mism == 0,
              "cfg": f"t{TILE}_ez0_tpv{tpv}_prep3"})
    except Exception as e:
        emit({"stage": "fullframe3",
              "failed": f"{type(e).__name__}: {str(e)[:300]}"})
        return

    # ---- full-frame golden (all 786k rays, VERDICT r3 item 8) ------------
    rec_full = trace_cpu_golden(
        flat, np.asarray(batch.orig), np.asarray(batch.dirn),
        np.asarray(batch.tmin), np.asarray(batch.tmax))
    mism_full = int((np.asarray(trif) != rec_full.tri).sum())
    emit({"stage": "golden_full", "cfg": f"t{TILE}_ez0_tpv{tpv}_prep3",
          "rays": R, "mismatches": mism_full, "match": mism_full == 0})


if __name__ == "__main__":
    main()
