"""Round-5 session 2b: visit-list kernel device A/B (conference).

Session 1 localized the walk kernel's cost in its per-visit dynamic
VMEM loads (~2.9 of 3.67 ms). trace_dense_visits replaces them with
pipeline-delivered blocks (scalar-prefetch index maps). Measures, with
frozen prep rows (kernel-only marginal):
  * kernel_walk    (baseline: 3.67 ms in session 1)
  * kernel_visits
and the prep-in-frame fullframe marginal prep3-sg + visits, with a
sampled golden. Appends JSONL to results_r5_session2.json.
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
                   "results_r5_session2.json")
W, H, TILE = 1024, 768, 16
Z_BITS = 12


def emit(rec):
    rec = {k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    print(f"[r5s2b] devices={jax.devices()}", file=sys.stderr)
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
    v_cap = bd.visit_cap(p_max, nb, g2_max)
    emit({"stage": "caps2b", "total": total, "p_max": p_max,
          "v_cap": v_cap})
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
    vt_f, bv_f = jax.block_until_ready(bd.build_visit_list(
        r0_f, r1_f, g1_f, v_cap=v_cap, nb=nb))
    emit({"stage": "frozen_ok", "ok": bool(ok_f),
          "visits_used": int(jnp.sum(jnp.maximum(r1_f - r0_f, 1)))})

    def kchain(kernel):
        def build(k):
            @jax.jit
            def run(tn):
                acc = jnp.float32(0)
                tn2 = tn
                for _ in range(k):
                    sc = scalars.at[3].set(tn2)
                    if kernel == "visits":
                        tri, t, u, v = bd.trace_dense_visits(
                            rows_f, vt_f, bv_f, dirs, sc, n_bins=nb,
                            ray_rows=ray_rows)
                    else:
                        tri, t, u, v = bd.trace_dense_rows(
                            rows_f, r0_f, r1_f, dirs, sc, g1_f,
                            n_bins=nb, ray_rows=ray_rows, ez_chunk=0,
                            tpv=1)
                    acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                    tn2 = tn + 1e-12 * acc
                return acc, tri
            return run
        return build

    tri_by = {}
    for kernel in ("walk", "visits"):
        try:
            walls = {}
            cs = 0.0
            for k in (1, 4):
                run = kchain(kernel)(k)
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
            emit({"stage": f"kernel_{kernel}", "marginal_ms": marg * 1e3,
                  "mrays": R / 1e6 / marg, "wall1_ms": walls[1] * 1e3,
                  "compile_s": cs})
        except Exception as e:
            emit({"stage": f"kernel_{kernel}",
                  "failed": f"{type(e).__name__}: {str(e)[:300]}"})

    if "walk" in tri_by and "visits" in tri_by:
        emit({"stage": "kernel_agree",
              "id_diffs": int((tri_by["walk"] != tri_by["visits"]).sum()),
              "rays": R})

    # fullframe: prep3-sg + visit build + visits kernel, all in-chain
    def ffchain(k):
        @jax.jit
        def run(tn):
            acc = jnp.float32(0)
            tn2 = tn
            for _ in range(k):
                veff = verts + 1e-30 * tn2
                rows, r0, r1, g1, ok = bd.binraster_prep_dense3(
                    veff, ca, mcodes, sort_mode="sg", **kw)
                vt, bv = bd.build_visit_list(r0, r1, g1, v_cap=v_cap,
                                             nb=nb)
                sc = scalars.at[3].set(tn2)
                tri, t, u, v = bd.trace_dense_visits(
                    rows, vt, bv, dirs, sc, n_bins=nb, ray_rows=ray_rows)
                tri = jnp.where(ok, tri, -2)
                acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                tn2 = tn + 1e-12 * acc
            return acc, tri
        return run

    try:
        walls = {}
        tri1 = None
        for k in (1, 4):
            run = ffchain(k)
            acc, tri = jax.block_until_ready(run(
                jnp.float32(float(ca["znear"]))))
            if tri1 is None:
                tri1 = np.asarray(tri)
            best = 1e30
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(run(
                    jnp.float32(float(ca["znear"])))[0])
                best = min(best, time.time() - t0)
            walls[k] = best
        marg = (walls[4] - walls[1]) / 3
        from ntrace_tpu.core import BuildConfig
        from ntrace_tpu.render.renderer import build_accel
        from ntrace_tpu.trace.cpu import trace_cpu_golden

        flat = build_accel(scene, BuildConfig(
            builder="binned_sah", sah_tri_cost=0.02, max_leaf_size=48),
            use_cache=True)
        sub = np.arange(0, R, max(R // 4096, 1))
        rec = trace_cpu_golden(
            flat, np.asarray(batch.orig)[sub], np.asarray(batch.dirn)[sub],
            np.asarray(batch.tmin)[sub], np.asarray(batch.tmax)[sub])
        mism = int((tri1[sub] != rec.tri).sum())
        emit({"stage": "fullframe_sg_visits", "marginal_ms": marg * 1e3,
              "mrays": R / 1e6 / marg, "wall1_ms": walls[1] * 1e3,
              "golden_sampled": len(sub), "golden_raw_diffs": mism,
              "hit_rate": float((tri1 >= 0).mean())})
    except Exception as e:
        emit({"stage": "fullframe_sg_visits",
              "failed": f"{type(e).__name__}: {str(e)[:300]}"})


if __name__ == "__main__":
    main()
