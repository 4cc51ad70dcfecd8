"""Round-5 device session 1: prep v4 pricing + kernel split re-check.

Measures (chained-marginal, conference 280k, t16, 1024x768):
  A. prep3-sg full (r4 reference point) vs prep4 full
  B. individual op prices at the live pair scale: scatter-max+cummax vs
     scatter-add+cumsum tri_of_p, (n,4) vs (n,16) row gathers, 2-op sort
  C. kernel knockouts at the armed config: full / nowalk / groups1 /
     tpv {1,2,4} -- the r4 "460 ns/visit load" figure drove the v5
     cluster design that the coverage stats just killed; re-price it.
  D. fullframe chained marginal with prep4 + kernel, sampled golden.

Appends JSONL to results_r5_session1.json.
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
                   "results_r5_session1.json")
W, H, TILE = 1024, 768, 16
Z_BITS = 12


def emit(rec):
    rec = {k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def marginal(build_chain, args, ks=(1, 4)):
    """build_chain(k) -> jitted fn; returns (marginal_s, wall1_s,
    compile_s)."""
    walls = {}
    compile_s = 0.0
    for k in ks:
        run = build_chain(k)
        t0 = time.time()
        jax.block_until_ready(run(*args))
        compile_s += time.time() - t0
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(run(*args))
            best = min(best, time.time() - t0)
        walls[k] = best
    return ((walls[ks[1]] - walls[ks[0]]) / (ks[1] - ks[0]),
            walls[ks[0]], compile_s)


def main():
    t00 = time.time()
    print(f"[r5s1] devices={jax.devices()}", file=sys.stderr)
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    n = verts.shape[0]
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    txn, tyn = W // TILE, H // TILE
    nb = txn * tyn
    mcodes = jnp.asarray(bd.bin_mcodes(txn, tyn, 31 - Z_BITS))
    total, n_mid, n_g = (int(x) for x in bd.count_pairs_dense(
        verts, ca, width=W, height=H, tile=TILE, k_slots=64, k2_slots=64))
    p_max = bd.pick_cap(total + n_mid, 16 * bd.TPT)
    g2_max = bd.pick_cap(n_g, bd.TPT, pad=bd.TPT) if n_g else 0
    emit({"stage": "caps", "total": total, "n_mid": n_mid, "n_g": n_g,
          "p_max": p_max, "g2_max": g2_max})

    pos = ca["pos"]

    # ---- A. full preps --------------------------------------------------
    def prep_chain(fn):
        def build(k):
            @jax.jit
            def run(pos):
                acc = jnp.float32(0)
                for _ in range(k):
                    c = dict(ca, pos=pos + 1e-12 * acc)
                    rows, r0, r1, g1, ok = fn(c)
                    # full-consumption guards: sums defeat any gather/
                    # scatter narrowing XLA might do on point reads
                    acc = (acc + rows[0, 0] + 1e-9 * rows[:, 9].sum()
                           + 1e-9 * (r0.sum() + r1.sum()).astype(
                               jnp.float32))
                return acc
            return run
        return build

    kw = dict(width=W, height=H, tile=TILE, k_cap=64, p_max=p_max,
              g2_max=g2_max, z_bits=Z_BITS)
    for tag, fn in (
            ("prep3_sg", lambda c: bd.binraster_prep_dense3(
                verts, c, mcodes, sort_mode="sg", **kw)),
            ("prep4", lambda c: bd.binraster_prep_dense4(
                verts, c, mcodes, **kw)),
    ):
        try:
            m, w1, cs = marginal(prep_chain(fn), (pos,))
            emit({"stage": tag, "marginal_ms": m * 1e3,
                  "wall1_ms": w1 * 1e3, "compile_s": cs})
        except Exception as e:
            emit({"stage": tag,
                  "failed": f"{type(e).__name__}: {str(e)[:200]}"})

    # ---- B. op prices ----------------------------------------------------
    key0 = np.random.RandomState(0)
    cntc_np = None  # built below from a real count pass

    from ntrace_tpu.trace.binraster import _counts

    @jax.jit
    def count_parts(c):
        tx0, tx1, ty0, ty1, cnt, zmin = _counts(
            verts, c, width=W, height=H, tile=TILE)
        over2 = cnt > 64
        incl = ~over2 & (cnt > 0)
        cntc = jnp.where(incl, cnt, 0)
        offs = jnp.cumsum(cntc) - cntc
        return incl, cntc, offs

    incl, cntc, offs = count_parts(ca)
    iota_n = jnp.arange(n, dtype=jnp.int32)

    def op_chain(op):
        # ties each iteration through a scalar; consumes one output lane
        def build(k):
            @jax.jit
            def run(x):
                acc = jnp.float32(0)
                for _ in range(k):
                    out = op(acc)
                    acc = acc + out
                return acc
            return run
        return build

    def scatmax(acc):
        o = offs + (acc * 0).astype(jnp.int32)
        t = jax.lax.cummax(
            jnp.zeros((p_max,), jnp.int32).at[o].max(iota_n, mode="drop"))
        return (t[-1] + t[123]).astype(jnp.float32) + 1e-9 * jnp.sum(
            t.astype(jnp.float32))

    def scatadd(acc):
        o = jnp.where(incl, offs, p_max) + (acc * 0).astype(jnp.int32)
        pe = jax.lax.cummax(jnp.where(incl, iota_n, -1))
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), pe[:-1]])
        delta = jnp.where(incl, iota_n - prev, 0)
        d = jnp.zeros((p_max,), jnp.int32).at[o].add(delta, mode="drop")
        t = jnp.maximum(jnp.cumsum(d) - 1, 0)
        return (t[-1] + t[123]).astype(jnp.float32) + 1e-9 * jnp.sum(
            t.astype(jnp.float32))

    tri_of_p = jnp.maximum(jax.lax.cummax(
        jnp.zeros((p_max,), jnp.int32).at[offs].max(iota_n, mode="drop")), 0)
    tbl4 = jnp.stack([iota_n, iota_n * 3, iota_n ^ 5, iota_n], axis=1)
    tbl16 = jnp.concatenate([tbl4] * 4, axis=1)
    perm = jnp.asarray(key0.permutation(p_max).astype(np.int32))

    def gather4(acc):
        idx = tri_of_p + (acc * 0).astype(jnp.int32)
        g = tbl4[idx]
        return 1e-9 * jnp.sum((g[:, 0] + g[:, 3]).astype(jnp.float32))

    def gather16(acc):
        idx = tri_of_p + (acc * 0).astype(jnp.int32)
        g = tbl16[idx]
        return 1e-9 * jnp.sum((g[:, 0] + g[:, 15]).astype(jnp.float32))

    def gather16_perm(acc):
        idx = perm * (1 + (acc * 0).astype(jnp.int32))
        g = tbl16[jnp.clip(idx, 0, n - 1)]
        return 1e-9 * jnp.sum((g[:, 0] + g[:, 15]).astype(jnp.float32))

    keys_r = jnp.asarray(key0.randint(0, 1 << 30, p_max).astype(np.int32))

    def sort2(acc):
        kk = keys_r + (acc * 0).astype(jnp.int32)
        sk, sv = jax.lax.sort((kk, jnp.arange(p_max, dtype=jnp.int32)),
                              num_keys=1)
        return (sk[3] + sv[77]).astype(jnp.float32)

    for tag, op in (("op_scatmax", scatmax), ("op_scatadd", scatadd),
                    ("op_gather4", gather4), ("op_gather16", gather16),
                    ("op_gather16_perm", gather16_perm),
                    ("op_sort2", sort2)):
        try:
            m, w1, cs = marginal(op_chain(op), (jnp.float32(0),),
                                 ks=(1, 5))
            emit({"stage": tag, "marginal_ms": m * 1e3,
                  "wall1_ms": w1 * 1e3, "compile_s": cs})
        except Exception as e:
            emit({"stage": tag,
                  "failed": f"{type(e).__name__}: {str(e)[:200]}"})

    # ---- C. kernel knockouts (frozen prep4 rows) -------------------------
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    R = batch.num_rays
    ray_rows = TILE * TILE // 128
    dirs = jnp.transpose(batch.dirn).reshape(3 * nb * ray_rows, 128)
    scalars = jnp.concatenate([
        ca["pos"].astype(jnp.float32),
        jnp.stack([ca["znear"], jnp.float32(1e8), jnp.float32(0),
                   jnp.float32(0), jnp.float32(0)])])
    frozen = jax.block_until_ready(bd.binraster_prep_dense4(
        verts, ca, mcodes, **kw))
    rows_f, r0_f, r1_f, g1_f, ok_f = frozen
    emit({"stage": "prep4_ok", "ok": bool(ok_f)})

    def kchain(probe, tpv):
        def build(k):
            @jax.jit
            def run(tn):
                acc = jnp.float32(0)
                tn2 = tn
                for _ in range(k):
                    sc = scalars.at[3].set(tn2)
                    tri, t, u, v = bd.trace_dense_rows(
                        rows_f, r0_f, r1_f, dirs, sc, g1_f, n_bins=nb,
                        ray_rows=ray_rows, ez_chunk=0, probe=probe,
                        tpv=tpv)
                    acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                    tn2 = tn + 1e-12 * acc
                return acc
            return run
        return build

    for tag, probe, tpv in (("kernel_full", None, 1),
                            ("kernel_tpv2", None, 2),
                            ("kernel_tpv4", None, 4),
                            ("kernel_nowalk", "nowalk", 1),
                            ("kernel_groups1", "groups1", 1)):
        try:
            m, w1, cs = marginal(kchain(probe, tpv),
                                 (jnp.float32(float(ca["znear"])),))
            emit({"stage": tag, "marginal_ms": m * 1e3,
                  "mrays": R / 1e6 / m, "wall1_ms": w1 * 1e3,
                  "compile_s": cs})
        except Exception as e:
            emit({"stage": tag,
                  "failed": f"{type(e).__name__}: {str(e)[:200]}"})

    # ---- D. fullframe chained with prep4 + kernel + sampled golden ------
    def ffchain(k):
        @jax.jit
        def run(tn):
            acc = jnp.float32(0)
            tn2 = tn
            for _ in range(k):
                veff = verts + 1e-30 * tn2
                rows, r0, r1, g1, ok = bd.binraster_prep_dense4(
                    veff, ca, mcodes, **kw)
                sc = scalars.at[3].set(tn2)
                tri, t, u, v = bd.trace_dense_rows(
                    rows, r0, r1, dirs, sc, g1, n_bins=nb,
                    ray_rows=ray_rows, ez_chunk=0, tpv=1)
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
        # sampled golden vs CPU reference
        from ntrace_tpu.core import BuildConfig
        from ntrace_tpu.render.renderer import build_accel
        from ntrace_tpu.trace.cpu import golden_mismatches, trace_cpu_golden

        flat = build_accel(scene, BuildConfig(
            builder="binned_sah", sah_tri_cost=0.02, max_leaf_size=48),
            use_cache=True)
        sub = np.arange(0, R, max(R // 4096, 1))
        rec = trace_cpu_golden(
            flat, np.asarray(batch.orig)[sub], np.asarray(batch.dirn)[sub],
            np.asarray(batch.tmin)[sub], np.asarray(batch.tmax)[sub])
        # device tri1 was traced at tn2 == znear exactly (k=1 chain)
        dev = tri1[sub]
        mism = int((dev != rec.tri).sum())
        emit({"stage": "fullframe_prep4", "marginal_ms": marg * 1e3,
              "mrays": R / 1e6 / marg, "wall1_ms": walls[1] * 1e3,
              "golden_sampled": len(sub), "golden_raw_diffs": mism,
              "hit_rate": float((dev >= 0).mean())})
    except Exception as e:
        emit({"stage": "fullframe_prep4",
              "failed": f"{type(e).__name__}: {str(e)[:300]}"})
    print(f"[r5s1] total {time.time()-t00:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
