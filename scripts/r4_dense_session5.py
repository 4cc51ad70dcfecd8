"""Round-4 dense session 5: sort-payload A/B + tight caps
(results_r4_dense5.json).

prep3b_bisect accounting puts the 11-op pair sort + pack at ~10.6 ms of
prep-v3b's 18.1 (sum-consumption DCE poisons finer stage reads -- the
pack-anchored cumulative is the trustworthy one). Two levers, measured
here as HONEST fullframes (prep + kernel chained, bench protocol):

  tight caps   pick_cap replaces the geometric bucket: p_max 462k ->
               ~383k (-17% on every prep op).
  sort_mode    s11 (carry payload through the sort) vs sg (2-op sort +
               one post-sort (p,10)-row gather).

Each config records a stride golden; the winner records the FULL-frame
golden (786k rays).
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
                   "results_r4_dense5.json")
W, H, K, TILE = 1024, 768, 4, 16


def emit(rec):
    rec = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def marginal(chain, args, k_hi=K, reps=3):
    t0 = time.time()
    jax.block_until_ready(chain(1)(*args))
    cs = time.time() - t0
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
    return (walls[k_hi] - walls[1]) / (k_hi - 1), walls[1], cs


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
    p_max = bd.pick_cap(total + n_mid, 16 * bd.TPT)
    g2_max = bd.pick_cap(n_g, bd.TPT, pad=bd.TPT) if n_g else 0
    emit({"stage": "caps", "total": total, "p_max": p_max,
          "g2_max": g2_max})
    dirs = jnp.transpose(batch.dirn).reshape(3 * nb * ray_rows, 128)
    base_scalars = jnp.concatenate([
        ca["pos"].astype(jnp.float32),
        jnp.stack([ca["znear"], ca["zfar"], jnp.float32(0),
                   jnp.float32(0), jnp.float32(0)])])

    best = (None, 1e30, None)
    for sm in ("s11", "sg"):
        def fchain(k, sm=sm):
            @jax.jit
            def run(tn):
                acc = jnp.float32(0)
                tri = None
                for _ in range(k):
                    rws, r0, r1, g1, okk = bd.binraster_prep_dense3(
                        verts + 1e-30 * acc, ca, mcodes, width=W,
                        height=H, tile=TILE, k_cap=64, p_max=p_max,
                        g2_max=g2_max, z_bits=z_bits, sort_mode=sm)
                    sc = base_scalars.at[3].set(tn + 1e-12 * acc)
                    tri, t, u, v = bd.trace_dense_rows(
                        rws, r0, r1, dirs, sc, g1, n_bins=nb,
                        ray_rows=ray_rows, ez_chunk=0, tpv=1)
                    acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                return acc, tri
            return run

        try:
            marg, w1, cs = marginal(fchain, (ca["znear"],))
            _, trif = fchain(1)(ca["znear"])
            trif = np.asarray(trif)
            mism = int((trif[sub] != rec_g.tri).sum())
            emit({"stage": "fullframe5", "sort_mode": sm,
                  "marginal_ms": marg * 1e3, "mrays": R / 1e6 / marg,
                  "wall1_ms": w1 * 1e3, "compile_s": cs,
                  "golden_mismatches": mism, "golden_match": mism == 0,
                  "cfg": f"t{TILE}_ez0_tpv1_prep3{sm}"})
            if mism == 0 and marg < best[1]:
                best = (sm, marg, trif)
        except Exception as e:
            emit({"stage": "fullframe5", "sort_mode": sm,
                  "failed": f"{type(e).__name__}: {str(e)[:300]}"})

    if best[0] is None:
        return
    rec_full = trace_cpu_golden(
        flat, np.asarray(batch.orig), np.asarray(batch.dirn),
        np.asarray(batch.tmin), np.asarray(batch.tmax))
    mism_full = int((best[2] != rec_full.tri).sum())
    emit({"stage": "golden_full", "cfg": f"t{TILE}_ez0_tpv1_prep3{best[0]}",
          "rays": R, "mismatches": mism_full, "match": mism_full == 0})


if __name__ == "__main__":
    main()
