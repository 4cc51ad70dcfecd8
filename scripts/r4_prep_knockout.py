"""Knockout pricing of prep-v3 (sg, tight caps) — results_r4_prep_ko.json.

The prefix-cumulative bisect (results_prep3b_bisect.json) is DCE-poisoned
below the pack anchor. This probe prices each stage by KNOCKOUT instead:
run the FULL prep with exactly one stage replaced by a same-shape cheap
fake, chained-marginal; stage price = full - knockout. Fakes are chosen
so XLA cannot restore the stage (xor'd indices, tiled rows), and every
output is consumed the same way.

Stages: counts, scatter (scatter-max+cummax), gather1 ((n,16)-row
gather), sort (2-op), gather2 ((p,10) perm gather), pack, search
(row0/row1 searchsorted).
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
                   "results_r4_prep_ko.json")
W, H, TILE, K = 1024, 768, 16, 5
Z_BITS = 12


def emit(rec):
    rec = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def marginal(chain, args, k_hi=K, reps=4):
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
    return (walls[k_hi] - walls[1]) / (k_hi - 1), walls[1], cs


def prep_ko(verts, cam, mcodes, *, p_max, ko, k_cap=64):
    """binraster_prep_dense3 (sg, no global tier) with knockout `ko`."""
    n = verts.shape[0]
    zshift = 32 - Z_BITS
    zmask = (1 << Z_BITS) - 1
    SENT = jnp.int32(0x7FFFFFFF)
    if ko == "counts":
        # Same-shape fakes from pure vector arith over (n,).
        i = jnp.arange(n, dtype=jnp.int32)
        tx0 = i % 63
        ty0 = i % 47
        wbin = 1 + (i & 1)
        cnt = wbin
        zmin = (i % 97).astype(jnp.float32) * 0.1 + 0.5
    else:
        tx0, tx1, ty0, ty1, cnt, zmin = _counts(
            verts, cam, width=W, height=H, tile=TILE)
        wbin = tx1 - tx0 + 1
        over2 = cnt > k_cap
        cnt = jnp.where(~over2 & (cnt > 0), cnt, 0)
    zsafe = jnp.maximum(zmin * (1.0 - Z_MARGIN), 0.0)
    zb = ((jax.lax.bitcast_convert_type(zsafe, jnp.int32) >> zshift)
          & zmask)
    offs = jnp.cumsum(cnt) - cnt
    total = jnp.sum(cnt)

    if ko == "scatter":
        tri_of_p = (jnp.arange(p_max, dtype=jnp.int32) * 7) % n
    else:
        tri_of_p = jax.lax.cummax(
            jnp.zeros((p_max,), jnp.int32).at[offs].max(
                jnp.arange(n, dtype=jnp.int32), mode="drop"))

    v0 = verts[:, 0]
    cols = [v0[:, c] for c in range(3)]
    cols += [verts[:, 1, c] - v0[:, c] for c in range(3)]
    cols += [verts[:, 2, c] - v0[:, c] for c in range(3)]
    tbl = jnp.stack(
        [jax.lax.bitcast_convert_type(c, jnp.int32) for c in cols]
        + [tx0 | (ty0 << 10) | (wbin << 20), zb, offs], axis=1)
    tbl = jnp.concatenate(
        [tbl, jnp.zeros((n, 16 - tbl.shape[1]), jnp.int32)], axis=1)
    if ko == "gather1":
        G = jnp.tile(tbl[:1], (p_max, 1)) + tri_of_p[:, None]
    else:
        G = tbl[tri_of_p]

    p = jnp.arange(p_max, dtype=jnp.int32)
    valid = p < total
    k = p - G[:, 11]
    ch1 = G[:, 9]
    tx0p, ty0p = ch1 & 1023, (ch1 >> 10) & 1023
    wp = jnp.maximum((ch1 >> 20) & 2047, 1)
    zbp = G[:, 10]
    bx = tx0p + k % wp
    by = ty0p + k // wp
    mc = ((_part1by1(jnp, by) << jnp.uint32(1))
          | _part1by1(jnp, bx)).astype(jnp.int32)
    key = jnp.where(valid, (mc << Z_BITS) | zbp, SENT)

    if ko == "sort":
        skey, perm = key, p ^ 127
    else:
        skey, perm = jax.lax.sort((key, p), num_keys=1)
    if ko == "gather2":
        G2 = jnp.concatenate([G[:, :9], tri_of_p[:, None]], axis=1)
        G2 = G2 + perm[:, None]
    else:
        G2 = jnp.concatenate([G[:, :9], tri_of_p[:, None]], axis=1)[perm]
    paych = [G2[:, c] for c in range(9)] + [G2[:, 9]]
    svalid = skey != SENT
    lanes = jnp.stack(
        [jax.lax.bitcast_convert_type(b, jnp.float32) for b in paych[:9]]
        + [jnp.where(svalid, paych[9], -1).astype(jnp.float32)], axis=1)
    zdec = jax.lax.bitcast_convert_type(
        (skey & zmask) << zshift, jnp.float32)
    zdec = jnp.where(svalid, zdec, INF)
    if ko == "pack":
        nt = p_max // bd.TPT
        s = (lanes.sum() + zdec.min()).astype(jnp.float32)
        rows_b = jnp.full((nt * bd.GPT, 128), 0.0, jnp.float32) + s
    else:
        rows_b = bd._pack_dense(skey, lanes, zdec, p_max)

    sgroup = skey >> Z_BITS
    if ko == "search":
        row0 = (mcodes % 7).astype(jnp.int32) + sgroup[0]
        row1 = row0 + 1
    else:
        gt = sgroup.reshape(p_max // bd.TPT, bd.TPT)
        row0 = jnp.searchsorted(gt[:, bd.TPT - 1], mcodes,
                                side="left").astype(jnp.int32)
        row1 = jnp.searchsorted(gt[:, 0], mcodes,
                                side="right").astype(jnp.int32)
    return rows_b, row0, row1


def main():
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    txn, tyn = W // TILE, H // TILE
    mcodes = jnp.asarray(bd.bin_mcodes(txn, tyn, 31 - Z_BITS))
    total, n_mid, n_g = (int(x) for x in bd.count_pairs_dense(
        verts, ca, width=W, height=H, tile=TILE, k_slots=64, k2_slots=64))
    p_max = bd.pick_cap(total + n_mid, 16 * bd.TPT)
    emit({"stage": "setup", "total": total, "p_max": p_max})

    base = None
    for ko in ("none", "counts", "scatter", "gather1", "sort", "gather2",
               "pack", "search"):
        def chain(kk, ko=ko):
            @jax.jit
            def run():
                acc = jnp.float32(0)
                for _ in range(kk):
                    rows, r0, r1 = prep_ko(
                        verts + 1e-30 * acc, ca, mcodes,
                        p_max=p_max, ko=ko)
                    acc = (acc + rows[::97, ::31].sum()
                           + r0.sum() + r1.sum())
                return acc
            return run

        try:
            marg, w1, cs = marginal(chain, ())
            rec = {"stage": "ko", "ko": ko, "marginal_ms": marg * 1e3,
                   "wall1_ms": w1 * 1e3, "compile_s": cs}
            if ko == "none":
                base = marg
            elif base is not None:
                rec["stage_ms"] = (base - marg) * 1e3
            emit(rec)
        except Exception as e:
            emit({"stage": "ko", "ko": ko,
                  "failed": f"{type(e).__name__}: {str(e)[:200]}"})


if __name__ == "__main__":
    main()
