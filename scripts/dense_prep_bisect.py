"""Stage bisect of binraster_prep_dense's pathological device cost.

The r4 dense probe measured prep at ~1.2 s marginal / 21.6 s single wall
(conference, tile=16) where v1's prep probe recorded ~0. Chains each
prefix of the prep pipeline (serialized via cam pos so nothing CSEs) and
prices the marginal of one more rep -- the first stage whose cost
explodes is the culprit. Appends to results_dense_prep_bisect.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.ops.morton import _part1by1
from ntrace_tpu.ray import raygen
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace.binraster import _counts, Z_MARGIN, INF
from ntrace_tpu.trace import binraster_dense as bd

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_dense_prep_bisect.json")
W, H, TILE = 1024, 768, 16
K_SLOTS, K2 = 8, 64
Z_BITS = 19


def emit(rec):
    rec = {k: (round(v, 2) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def stage_fn(stage, verts, cam, mcodes, p_max, g_max, g2_max):
    """Returns scalar-consuming fn(cam_pos_jitter) running the prep up to
    `stage` (mirrors binraster_prep_dense's pipeline order)."""
    n = verts.shape[0]
    zshift = 32 - Z_BITS
    zmask = (1 << Z_BITS) - 1
    SENT = jnp.int32(0x7FFFFFFF)

    def run(pos):
        cam2 = dict(cam, pos=pos)
        tx0, tx1, ty0, ty1, cnt, zmin = _counts(
            verts, cam2, width=W, height=H, tile=TILE)
        if stage == "counts":
            return (cnt.sum().astype(jnp.float32) + zmin.sum()
                    + (tx0 + tx1 + ty0 + ty1).sum().astype(jnp.float32))
        wbin = tx1 - tx0 + 1
        over = cnt > K_SLOTS
        over2 = cnt > K2
        zsafe = jnp.maximum(zmin * (1.0 - Z_MARGIN), 0.0)
        zbits = ((jax.lax.bitcast_convert_type(zsafe, jnp.int32) >> zshift)
                 & zmask)

        def slot_key(k, t0x, t0y, w, zb, valid):
            kk = jnp.int32(k)
            bx = t0x + kk % w
            by = t0y + kk // w
            mc = ((_part1by1(jnp, by) << jnp.uint32(1))
                  | _part1by1(jnp, bx)).astype(jnp.int32)
            return jnp.where(valid, (mc << Z_BITS) | zb, SENT)

        cols = [slot_key(k, tx0, ty0, wbin, zbits,
                         (~over) & (jnp.int32(k) < cnt))
                for k in range(K_SLOTS)]
        keys = jnp.stack(cols).reshape(-1)
        if stage == "keys":
            return keys.sum().astype(jnp.float32) * 1e-9
        okey = jnp.where(over, zbits, SENT)
        oidx = jnp.arange(n, dtype=jnp.int32)
        sok, sidx = jax.lax.sort((okey, oidx), num_keys=1)
        gk, gi = sok[:g_max], sidx[:g_max]
        gvalid = gk != SENT
        t0xg, t0yg = tx0[gi], ty0[gi]
        wbing, cntg = wbin[gi], cnt[gi]
        zbg = gk & zmask
        midv = gvalid & (cntg <= K2)
        gv = verts[gi]
        gv0 = gv[:, 0]
        cols2 = [slot_key(k, t0xg, t0yg, wbing, zbg,
                          midv & (jnp.int32(k) < cntg))
                 for k in range(K2)]
        keys = jnp.concatenate([keys, jnp.stack(cols2).reshape(-1)])
        if stage == "tier2":
            return keys.sum().astype(jnp.float32) * 1e-9

        def padto(a, fill):
            if a.shape[0] >= p_max:
                return a
            return jnp.concatenate(
                [a, jnp.full((p_max - a.shape[0],), fill, a.dtype)])

        keys = padto(keys, SENT)
        v0 = verts[:, 0]

        def tiers(col_all, col_g):
            return jnp.concatenate(
                [jnp.tile(col_all, K_SLOTS), jnp.tile(col_g, K2)])

        pay = [(v0[:, c], gv0[:, c]) for c in range(3)]
        pay += [(verts[:, 1, c] - v0[:, c], gv[:, 1, c] - gv0[:, c])
                for c in range(3)]
        pay += [(verts[:, 2, c] - v0[:, c], gv[:, 2, c] - gv0[:, c])
                for c in range(3)]
        tid = jnp.arange(n, dtype=jnp.int32).astype(jnp.float32)
        pay.append((tid, gi.astype(jnp.float32)))
        ops = (keys,) + tuple(padto(tiers(a, g), 0) for a, g in pay)
        if stage == "payload":
            return sum(o.sum().astype(jnp.float32) for o in ops) * 1e-9
        srt = jax.lax.sort(ops, num_keys=1)
        if stage == "sort":
            return sum(s[:p_max].sum().astype(jnp.float32)
                       for s in srt) * 1e-9
        skey = srt[0][:p_max]
        spay = [s[:p_max] for s in srt[1:]]
        svalid = skey != SENT
        spay[9] = jnp.where(svalid, spay[9], jnp.float32(-1.0))
        lanes = jnp.stack(spay, axis=1)
        zdec = jax.lax.bitcast_convert_type(
            (skey & zmask) << zshift, jnp.float32)
        zdec = jnp.where(svalid, zdec, INF)
        rows_b = bd._pack_dense(skey, lanes, zdec, p_max)
        if stage == "pack":
            return rows_b.sum() * 1e-9
        sgroup = skey >> Z_BITS
        pair0 = jnp.searchsorted(sgroup, mcodes, side="left")
        pair1 = jnp.searchsorted(sgroup, mcodes, side="right")
        if stage == "ranges":
            return (rows_b.sum() * 1e-9
                    + (pair0 + pair1).sum().astype(jnp.float32) * 1e-9)
        raise ValueError(stage)

    return run


def main():
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    cam = raygen.camera_arrays(default_camera(scene.name), W, H)
    txn, tyn = W // TILE, H // TILE
    mcodes = jnp.asarray(bd.bin_mcodes(txn, tyn, 31 - Z_BITS))
    total, n_mid, n_g = (int(x) for x in bd.count_pairs_dense(
        verts, cam, width=W, height=H, tile=TILE, k_slots=K_SLOTS))
    p_max = bd.pick_quant(total, bd.TPT, 8 * bd.TPT)
    g_max = bd.pick_quant(n_mid + n_g, bd.TPT, 16 * bd.TPT)
    g2_max = bd.pick_quant(n_g, bd.TPT, 2 * bd.TPT)
    emit({"stage": "sizes", "p_max": p_max, "g_max": g_max,
          "g2_max": g2_max})

    for stage in ("counts", "keys", "tier2", "payload", "sort", "pack",
                  "ranges"):
        fn = stage_fn(stage, verts, cam, mcodes, p_max, g_max, g2_max)

        def chain(k):
            @jax.jit
            def run(pos):
                def body(i, acc):
                    return acc + fn(pos + acc * 1e-30) * 1e-6
                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
            return run

        try:
            walls = {}
            for k in (1, 3):
                r = chain(k)
                float(jax.block_until_ready(r(cam["pos"])))
                best = 1e30
                for _ in range(2):
                    t0 = time.time()
                    float(jax.block_until_ready(r(cam["pos"])))
                    best = min(best, time.time() - t0)
                walls[k] = best
            emit({"stage": stage, "marginal_ms": (walls[3] - walls[1])
                  / 2 * 1e3, "wall1_ms": walls[1] * 1e3})
        except Exception as e:
            emit({"stage": stage,
                  "failed": f"{type(e).__name__}: {str(e)[:200]}"})


if __name__ == "__main__":
    main()
