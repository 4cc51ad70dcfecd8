"""Round-5 arming session 2: the DMA walk kernel A/B -> results_r5_arm.json.

Session-1 anatomy: the walk kernel is ~80% per-visit dynamic-load cost.
trace_dense_rows_dma double-buffers those loads with explicit async DMA
from an HBM-resident table. Measures, conference 280k / t16 / sg prep:
  * frozen-structure kernel marginal: walk vs dma (the bench `value`)
  * prep-in-frame fullframe marginal with the dma kernel (fullframe_r5
    record with explicit knobs + tie-aware sampled golden for
    pick_tuned). nohup, no shell timeout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace import binraster_dense as bd

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_r5_arm.json")
W, H, TILE = 1024, 768, 16
Z_BITS = 12


def emit(rec):
    rec = {k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    print(f"[r5arm2] devices={jax.devices()}", file=sys.stderr)
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    txn, tyn = W // TILE, H // TILE
    nb = txn * tyn
    mcodes = jnp.asarray(bd.bin_mcodes(txn, tyn, 31 - Z_BITS))
    total, n_mid, n_g = (int(x) for x in bd.count_pairs_dense(
        verts, ca, width=W, height=H, tile=TILE, k_slots=64, k2_slots=64))
    p_max = bd.pick_cap(total + n_mid, 16 * bd.TPT)
    g2_max = bd.pick_cap(n_g, bd.TPT, pad=bd.TPT) if n_g else 0
    kw = dict(width=W, height=H, tile=TILE, k_cap=64, p_max=p_max,
              g2_max=g2_max, z_bits=Z_BITS)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    R = batch.num_rays
    ray_rows = TILE * TILE // 128
    dirs = jnp.transpose(batch.dirn).reshape(3 * nb * ray_rows, 128)
    scalars = jnp.concatenate([
        ca["pos"].astype(jnp.float32),
        jnp.stack([ca["znear"], jnp.float32(1e8), jnp.float32(0),
                   jnp.float32(0), jnp.float32(0)])])
    frozen = jax.block_until_ready(bd.binraster_prep_dense3(
        verts, ca, mcodes, sort_mode="sg", **kw))
    rows_f, r0_f, r1_f, g1_f, ok_f = frozen

    def trace(kernel, rows, r0, r1, g1, sc):
        if kernel == "dma":
            return bd.trace_dense_rows_dma(
                rows, r0, r1, dirs, sc, g1, n_bins=nb, ray_rows=ray_rows)
        return bd.trace_dense_rows(
            rows, r0, r1, dirs, sc, g1, n_bins=nb, ray_rows=ray_rows,
            ez_chunk=0, tpv=1)

    # frozen-structure kernel marginal A/B
    tri_by = {}
    for kernel in ("dma", "walk"):
        try:
            walls = {}
            cs = 0.0
            for k in (1, 4):
                @jax.jit
                def run(tn, k=k, kernel=kernel):
                    acc = jnp.float32(0)
                    tn2 = tn
                    for _ in range(k):
                        sc = scalars.at[3].set(tn2)
                        tri, t, u, v = trace(kernel, rows_f, r0_f, r1_f,
                                             g1_f, sc)
                        acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                        tn2 = tn + 1e-12 * acc
                    return acc, tri
                t0 = time.time()
                acc, tri = jax.block_until_ready(run(
                    jnp.float32(float(ca["znear"]))))
                cs += time.time() - t0
                if k == 1:
                    tri_by[kernel] = np.asarray(tri)
                best = 1e30
                for _ in range(3):
                    t0 = time.time()
                    jax.block_until_ready(run(
                        jnp.float32(float(ca["znear"])))[0])
                    best = min(best, time.time() - t0)
                walls[k] = best
            marg = (walls[4] - walls[1]) / 3
            emit({"stage": f"frozen_kernel_{kernel}",
                  "marginal_ms": marg * 1e3, "mrays": R / 1e6 / marg,
                  "wall1_ms": walls[1] * 1e3, "compile_s": cs})
        except Exception as e:
            emit({"stage": f"frozen_kernel_{kernel}",
                  "failed": f"{type(e).__name__}: {str(e)[:300]}"})
    if len(tri_by) == 2:
        emit({"stage": "dma_agree",
              "id_diffs": int((tri_by["dma"] != tri_by["walk"]).sum()),
              "rays": R})

    # fullframe with the dma kernel
    from ntrace_tpu.core import BuildConfig
    from ntrace_tpu.render.renderer import build_accel
    from ntrace_tpu.trace.cpu import golden_mismatches, trace_cpu_golden

    flat = build_accel(scene, BuildConfig(
        builder="binned_sah", sah_tri_cost=0.02, max_leaf_size=48),
        use_cache=True)
    sub = np.arange(0, R, max(R // 4096, 1))
    rec_g = trace_cpu_golden(
        flat, np.asarray(batch.orig)[sub], np.asarray(batch.dirn)[sub],
        np.asarray(batch.tmin)[sub], np.asarray(batch.tmax)[sub])
    try:
        walls = {}
        tri1 = t1 = None
        for k in (1, 4):
            @jax.jit
            def run(tn, k=k):
                acc = jnp.float32(0)
                tn2 = tn
                for _ in range(k):
                    veff = verts + 1e-30 * tn2
                    rows, r0, r1, g1, ok = bd.binraster_prep_dense3(
                        veff, ca, mcodes, sort_mode="sg", **kw)
                    sc = scalars.at[3].set(tn2)
                    tri, t, u, v = trace("dma", rows, r0, r1, g1, sc)
                    tri = jnp.where(ok, tri, -2)
                    acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                    tn2 = tn + 1e-12 * acc
                return acc, tri, t
            acc, tri, t = jax.block_until_ready(run(
                jnp.float32(float(ca["znear"]))))
            if tri1 is None:
                tri1, t1 = np.asarray(tri), np.asarray(t)
            best = 1e30
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(run(
                    jnp.float32(float(ca["znear"])))[0])
                best = min(best, time.time() - t0)
            walls[k] = best
        marg = (walls[4] - walls[1]) / 3
        mism = golden_mismatches(tri1[sub], t1[sub], rec_g.tri, rec_g.t)
        emit({"stage": "fullframe_r5", "cfg": "t16_sg_dma",
              "br2_tile": TILE, "br2_ez": 0, "br2_tpv": 1,
              "br2_sort": "sg", "br2_kernel": "dma",
              "marginal_ms": marg * 1e3, "mrays": R / 1e6 / marg,
              "wall1_ms": walls[1] * 1e3,
              "golden_sampled": int(len(sub)),
              "golden_mismatches": mism, "golden_match": mism == 0,
              "hit_rate": float((tri1 >= 0).mean())})
    except Exception as e:
        emit({"stage": "fullframe_r5", "cfg": "t16_sg_dma",
              "failed": f"{type(e).__name__}: {str(e)[:300]}"})


if __name__ == "__main__":
    main()
