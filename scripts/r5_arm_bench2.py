"""Round-5 session 2: prep v5 (zero-gather prefix-slice emission) A/B.

Measures on conference 280k / 1024x768 / t16, walk kernel:
  * prep-only chained marginal for sort_mode in {sg, v5} (the component
    the v5 redesign targets -- sg's measured 12.1 ms is two row-gathers
    + sort + pack; v5 replaces every gather with sort-riding payload);
  * fullframe (prep-in-frame) chained marginal for both, with a
    4096-ray tie-aware sampled golden each.

Appends fullframe_r5 records to results_r5_arm.json (same schema as
r5_arm_bench.py so scripts/pick_tuned.py can promote a winner) and
prep-only records to results_r5_session4.json. nohup, serialized.
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

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_ARM = os.path.join(HERE, "results_r5_arm.json")
OUT_S4 = os.path.join(HERE, "results_r5_session4.json")
W, H, TILE = 1024, 768, 16
Z_BITS = 12


def emit(path, rec):
    rec = {k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(path, "a") as f:
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
    _, hist, _ = bd.count_hist_dense(verts, ca, width=W, height=H,
                                     tile=TILE, k_cap=64)
    n_ks = bd.pick_nks(np.asarray(hist))
    p_sg = bd.pick_cap(total + n_mid, 16 * bd.TPT)
    p_v5 = bd.pick_cap(sum(n_ks), 16 * bd.TPT)
    g2 = bd.pick_cap(n_g, bd.TPT, pad=bd.TPT) if n_g else 0
    emit(OUT_S4, {"stage": "v5_caps", "total": total, "p_sg": p_sg,
                  "p_v5": p_v5, "n_slices": len(n_ks),
                  "slice_sum": sum(n_ks), "g2": g2})

    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    R = batch.num_rays
    ray_rows = TILE * TILE // 128
    dirs = jnp.transpose(batch.dirn).reshape(3 * nb * ray_rows, 128)
    scalars = jnp.concatenate([
        ca["pos"].astype(jnp.float32),
        jnp.stack([ca["znear"], jnp.float32(1e8), jnp.float32(0),
                   jnp.float32(0), jnp.float32(0)])])

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

    def prep(mode, veff):
        kw = dict(width=W, height=H, tile=TILE, k_cap=64, g2_max=g2,
                  z_bits=Z_BITS)
        if mode == "v5":
            return bd.binraster_prep_dense5(veff, ca, mcodes, n_ks=n_ks,
                                            p_max=p_v5, **kw)
        return bd.binraster_prep_dense3(veff, ca, mcodes, sort_mode=mode,
                                        p_max=p_sg, **kw)

    def meas(make_run, label, extra=None, golden=False):
        try:
            walls, cs = {}, 0.0
            tri1 = t1 = None
            for k in (1, 4):
                run = make_run(k)
                t0 = time.time()
                out = jax.block_until_ready(run(
                    jnp.float32(float(ca["znear"]))))
                cs += time.time() - t0
                if golden and tri1 is None:
                    tri1, t1 = np.asarray(out[1]), np.asarray(out[2])
                best = 1e30
                for _ in range(3):
                    t0 = time.time()
                    jax.block_until_ready(run(
                        jnp.float32(float(ca["znear"])))[0])
                    best = min(best, time.time() - t0)
                walls[k] = best
            marg = (walls[4] - walls[1]) / 3
            rec = dict(stage=label[0], cfg=label[1],
                       marginal_ms=marg * 1e3, wall1_ms=walls[1] * 1e3,
                       compile_s=cs, **(extra or {}))
            if golden:
                mism = golden_mismatches(tri1[sub], t1[sub], rec_g.tri,
                                         rec_g.t)
                rec.update(mrays=R / 1e6 / marg,
                           golden_sampled=int(len(sub)),
                           golden_mismatches=mism,
                           golden_match=mism == 0,
                           hit_rate=float((tri1 >= 0).mean()))
            return rec
        except Exception as e:
            return dict(stage=label[0], cfg=label[1],
                        failed=f"{type(e).__name__}: {str(e)[:300]}")

    # Prep-only marginals (rows consumed via a sum, key ranges via r0).
    for mode in ("sg", "v5"):
        def mk(k, mode=mode):
            @jax.jit
            def run(tn):
                acc = jnp.float32(0)
                tn2 = tn
                for _ in range(k):
                    rows, r0, r1, g1, ok = prep(mode, verts + 1e-30 * tn2)
                    acc = (acc + rows[::64].sum() * 1e-9
                           + r0.sum().astype(jnp.float32) * 1e-9)
                    tn2 = tn + 1e-12 * acc
                return (acc,)
            return run
        emit(OUT_S4, meas(mk, ("prep_only", f"t16_{mode}")))

    # Fullframe (prep-in-frame) with the walk kernel + sampled golden.
    for mode in ("sg", "v5"):
        def mk(k, mode=mode):
            @jax.jit
            def run(tn):
                acc = jnp.float32(0)
                tn2 = tn
                for _ in range(k):
                    rows, r0, r1, g1, ok = prep(mode, verts + 1e-30 * tn2)
                    sc = scalars.at[3].set(tn2)
                    tri, t, u, v = bd.trace_dense_rows(
                        rows, r0, r1, dirs, sc, g1, n_bins=nb,
                        ray_rows=ray_rows, ez_chunk=0, tpv=1)
                    tri = jnp.where(ok, tri, -2)
                    acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                    tn2 = tn + 1e-12 * acc
                return acc, tri, t
            return run
        rec = meas(mk, ("fullframe_r5", f"t16_{mode}_walk"), extra={
            "br2_tile": TILE, "br2_ez": 0, "br2_tpv": 1,
            "br2_sort": mode, "br2_kernel": "walk"}, golden=True)
        emit(OUT_ARM, rec)


if __name__ == "__main__":
    main()
