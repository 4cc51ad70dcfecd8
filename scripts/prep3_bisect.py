"""Bisect binraster_prep_dense3's in-graph cost (results_prep3_bisect.json).

Session-3 measured prep3 at 39.3 ms chained-marginal while its parts
priced standalone at ~4 ms total (results_prep_primitives.json,
sort_462k_11op). Stage-cumulative chains with FULL consumption (plain
.sum() of every live output -- no strided sampling that invites partial
simplification) localize where the graph cost diverges from the
standalone probes. Conference 280k, 1024x768, tile 16, k_cap 64.
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
                   "results_prep3_bisect.json")
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


def stage_fn(upto, ca, mcodes):
    """Returns f(verts) computing prep3 up to `upto`, fully consumed."""
    zshift = 32 - Z_BITS
    zmask = (1 << Z_BITS) - 1
    SENT = jnp.int32(0x7FFFFFFF)

    def f(verts):
        n = verts.shape[0]
        tx0, tx1, ty0, ty1, cnt, zmin = _counts(
            verts, ca, width=W, height=H, tile=TILE)
        if upto == "counts":
            return (tx0 + tx1 + ty0 + ty1 + cnt).sum().astype(jnp.float32) \
                + zmin.sum()
        wbin = tx1 - tx0 + 1
        zsafe = jnp.maximum(zmin * (1.0 - Z_MARGIN), 0.0)
        zb = ((jax.lax.bitcast_convert_type(zsafe, jnp.int32) >> zshift)
              & zmask)
        over2 = cnt > 64
        incl = ~over2 & (cnt > 0)
        cntc = jnp.where(incl, cnt, 0)
        offs = jnp.cumsum(cntc) - cntc
        total = jnp.sum(cntc)
        ff = lambda a: bd._fill_forward(a.astype(jnp.int32), offs, P_MAX)
        p = jnp.arange(P_MAX, dtype=jnp.int32)
        valid = p < total
        if upto == "ff1":
            return ff(offs).sum().astype(jnp.float32)
        k = p - ff(offs)
        ch1 = ff(tx0 | (ty0 << 10) | (wbin << 20))
        zbp = ff(zb)
        v0 = verts[:, 0]
        cols = [v0[:, c] for c in range(3)]
        cols += [verts[:, 1, c] - v0[:, c] for c in range(3)]
        cols += [verts[:, 2, c] - v0[:, c] for c in range(3)]
        bits = [ff(jax.lax.bitcast_convert_type(c, jnp.int32))
                for c in cols]
        tidp = ff(jnp.arange(n, dtype=jnp.int32))
        if upto == "ff13":
            s = (k + ch1 + zbp + tidp).sum()
            for b in bits:
                s = s + b.sum()
            return s.astype(jnp.float32)
        tx0p, ty0p = ch1 & 1023, (ch1 >> 10) & 1023
        wp = jnp.maximum((ch1 >> 20) & 2047, 1)
        bx = tx0p + k % wp
        by = ty0p + k // wp
        mc = ((_part1by1(jnp, by) << jnp.uint32(1))
              | _part1by1(jnp, bx)).astype(jnp.int32)
        key = jnp.where(valid, (mc << Z_BITS) | zbp, SENT)
        if upto == "key":
            s = key.sum() + tidp.sum()
            for b in bits:
                s = s + b.sum()
            return s.astype(jnp.float32)
        if upto == "sort2":
            srt = jax.lax.sort((key, tidp), num_keys=1)
            s = srt[0].sum() + srt[1].sum()
            for b in bits:
                s = s + b.sum()
            return s.astype(jnp.float32)
        srt = jax.lax.sort((key,) + tuple(bits) + (tidp,), num_keys=1)
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
            + [jnp.where(svalid, srt[10], -1).astype(jnp.float32)], axis=1)
        zdec = jax.lax.bitcast_convert_type(
            (skey & zmask) << zshift, jnp.float32)
        zdec = jnp.where(svalid, zdec, INF)
        rows_b = bd._pack_dense(skey, lanes, zdec, P_MAX)
        if upto == "pack":
            return rows_b.sum()
        sgroup = skey >> Z_BITS
        pair0 = jnp.searchsorted(sgroup, mcodes,
                                 side="left").astype(jnp.int32)
        pair1 = jnp.searchsorted(sgroup, mcodes,
                                 side="right").astype(jnp.int32)
        return (rows_b.sum()
                + (pair0 + pair1).sum().astype(jnp.float32))

    return f


def main():
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    mcodes = jnp.asarray(bd.bin_mcodes(W // TILE, H // TILE, 31 - Z_BITS))

    for upto in ("counts", "ff1", "ff13", "key", "sort2", "sort11",
                 "pack", "full"):
        f = stage_fn(upto, ca, mcodes)

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
