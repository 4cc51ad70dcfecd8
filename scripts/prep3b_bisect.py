"""Bisect prep-v3b's 18 ms (results_prep3b_bisect.json).

Session-3 rerun measured binraster_prep_dense3 (scatter-max + cummax +
one row-gather + sort11) at 18.1 ms chained-marginal; component
estimates said ~7. Cumulative stages with full consumption localize the
overrun. Also prices drop-in alternatives for the expensive stage:
jnp.repeat for tri_of_p, scatter-add vs scatter-max, cummax vs blocked
max-scan.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.ray import raygen
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace.binraster import _counts, Z_MARGIN, INF
from ntrace_tpu.trace import binraster_dense as bd
from ntrace_tpu.ops.morton import _part1by1

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_prep3b_bisect.json")
W, H, TILE, K = 1024, 768, 16, 4
P_MAX = 462_440 // bd.TPT * bd.TPT
Z_BITS = 12


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


def stage_fn(upto, ca):
    zshift = 32 - Z_BITS
    zmask = (1 << Z_BITS) - 1
    SENT = jnp.int32(0x7FFFFFFF)

    def f(verts):
        n = verts.shape[0]
        tx0, tx1, ty0, ty1, cnt, zmin = _counts(
            verts, ca, width=W, height=H, tile=TILE)
        wbin = tx1 - tx0 + 1
        zsafe = jnp.maximum(zmin * (1.0 - Z_MARGIN), 0.0)
        zb = ((jax.lax.bitcast_convert_type(zsafe, jnp.int32) >> zshift)
              & zmask)
        over2 = cnt > 64
        incl = ~over2 & (cnt > 0)
        cntc = jnp.where(incl, cnt, 0)
        offs = jnp.cumsum(cntc) - cntc
        total = jnp.sum(cntc)
        if upto == "counts":
            return (offs + cntc + zb).sum().astype(jnp.float32)
        idx = jnp.arange(n, dtype=jnp.int32)
        scat = jnp.zeros((P_MAX,), jnp.int32).at[offs].max(
            idx, mode="drop")
        if upto == "scatmax":
            return (scat.sum() + total).astype(jnp.float32)
        if upto == "scatadd_alt":
            sa = jnp.zeros((P_MAX,), jnp.int32).at[offs].add(
                idx, mode="drop")
            return (sa.sum() + total).astype(jnp.float32)
        if upto == "repeat_alt":
            tof = jnp.repeat(idx, cntc, total_repeat_length=P_MAX)
            return (tof.sum() + total).astype(jnp.float32)
        tri_of_p = jax.lax.cummax(scat)
        if upto == "cummax":
            return (tri_of_p.sum() + total).astype(jnp.float32)
        v0 = verts[:, 0]
        cols = [v0[:, c] for c in range(3)]
        cols += [verts[:, 1, c] - v0[:, c] for c in range(3)]
        cols += [verts[:, 2, c] - v0[:, c] for c in range(3)]
        tbl = jnp.stack(
            [jax.lax.bitcast_convert_type(c, jnp.int32) for c in cols]
            + [tx0 | (ty0 << 10) | (wbin << 20), zb, offs], axis=1)
        tbl = jnp.concatenate(
            [tbl, jnp.zeros((n, 16 - tbl.shape[1]), jnp.int32)], axis=1)
        G = tbl[tri_of_p]
        if upto == "gather16":
            return G.sum().astype(jnp.float32)
        p = jnp.arange(P_MAX, dtype=jnp.int32)
        valid = p < total
        k = p - G[:, 11]
        ch1 = G[:, 9]
        tx0p, ty0p = ch1 & 1023, (ch1 >> 10) & 1023
        wp = jnp.maximum((ch1 >> 20) & 2047, 1)
        bx = tx0p + k % wp
        by = ty0p + k // wp
        mc = ((_part1by1(jnp, by) << jnp.uint32(1))
              | _part1by1(jnp, bx)).astype(jnp.int32)
        key = jnp.where(valid, (mc << Z_BITS) | G[:, 10], SENT)
        if upto == "key":
            return (key.sum() + G.sum()).astype(jnp.float32)
        srt = jax.lax.sort(
            (key,) + tuple(G[:, c] for c in range(9)) + (tri_of_p,),
            num_keys=1)
        if upto == "sort11":
            s = srt[0].sum()
            for b in srt[1:]:
                s = s + b.sum()
            return s.astype(jnp.float32)
        skey = srt[0]
        svalid = skey != SENT
        lanes = jnp.stack(
            [jax.lax.bitcast_convert_type(b, jnp.float32)
             for b in srt[1:10]]
            + [jnp.where(svalid, srt[10], -1).astype(jnp.float32)],
            axis=1)
        zdec = jax.lax.bitcast_convert_type(
            (skey & zmask) << zshift, jnp.float32)
        zdec = jnp.where(svalid, zdec, INF)
        rows_b = bd._pack_dense(skey, lanes, zdec, P_MAX)
        return rows_b.sum()

    return f


def main():
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)

    for upto in ("counts", "scatmax", "scatadd_alt", "repeat_alt",
                 "cummax", "gather16", "key", "sort11", "pack"):
        f = stage_fn(upto, ca)

        def chain(k, f=f):
            @jax.jit
            def run(v):
                acc = jnp.float32(0)
                for _ in range(k):
                    acc = acc + f(v + 1e-30 * acc)
                return acc
            return run

        try:
            marg, w1, cs = marginal(chain, (verts,))
            emit({"stage": upto, "marginal_ms": marg * 1e3,
                  "wall1_ms": w1 * 1e3, "compile_s": cs})
        except Exception as e:
            emit({"stage": upto,
                  "failed": f"{type(e).__name__}: {str(e)[:300]}"})


if __name__ == "__main__":
    main()
