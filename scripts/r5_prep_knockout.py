"""Round-5 session 2a: IN-CONTEXT knockouts of prep3-sg's 12.1 ms.

Session 1 proved every core op is ~free in isolation (gathers, 2-op
sort, scatters all <= 0.25 ms marginal at the live scale) while the full
prep3-sg pipeline costs 12.1 ms -- the cost is in COMPOSITION, not ops.
This probe rebuilds prep3-sg stage by stage as REAL subsets (everything
upstream kept, one stage knocked out or the pipeline truncated), all
chained-marginal, so consecutive differences localize the missing
~11 ms. Appends JSONL to results_r5_session2.json.
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
from ntrace_tpu.trace import binraster_dense as bd
from ntrace_tpu.trace.binraster import _counts, Z_MARGIN, INF
from ntrace_tpu.ops.morton import _part1by1

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


def prep_stages(verts, cam, mcodes, *, p_max, stop="full", pack_mode="v3"):
    """prep3-sg truncated at `stop`; returns a dict of arrays to consume.

    stop in: counts, expand, gather16, key, sort, postgather, lanes,
    pack, ranges(=full). pack_mode: v3 = the (p,11)->(nt*8,121) reshape
    pack; chmajor = channel-major (p,)->(p/128,128) reshapes only (the
    layout a lane-major kernel would consume -- prices pack relayout).
    """
    n = verts.shape[0]
    zshift = 32 - Z_BITS
    zmask = (1 << Z_BITS) - 1
    SENT = jnp.int32(0x7FFFFFFF)
    tx0, tx1, ty0, ty1, cnt, zmin = _counts(
        verts, cam, width=W, height=H, tile=TILE)
    wbin = tx1 - tx0 + 1
    zsafe = jnp.maximum(zmin * (1.0 - Z_MARGIN), 0.0)
    zb = ((jax.lax.bitcast_convert_type(zsafe, jnp.int32) >> zshift)
          & zmask)
    over2 = cnt > 64
    incl = ~over2 & (cnt > 0)
    cntc = jnp.where(incl, cnt, 0)
    offs = jnp.cumsum(cntc) - cntc
    total = jnp.sum(cntc)
    if stop == "counts":
        return dict(a=offs.astype(jnp.float32), b=zb.astype(jnp.float32))

    tri_of_p = jax.lax.cummax(
        jnp.zeros((p_max,), jnp.int32).at[offs].max(
            jnp.arange(n, dtype=jnp.int32), mode="drop"))
    if stop == "expand":
        return dict(a=tri_of_p.astype(jnp.float32))

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
    if stop == "gather16":
        return dict(a=(G[:, 0] + G[:, 11]).astype(jnp.float32))

    p = jnp.arange(p_max, dtype=jnp.int32)
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
    if stop == "key":
        return dict(a=key.astype(jnp.float32))

    skey, perm = jax.lax.sort((key, p), num_keys=1)
    if stop == "sort":
        return dict(a=skey.astype(jnp.float32), b=perm.astype(jnp.float32))

    G2 = jnp.concatenate([G[:, :9], tri_of_p[:, None]], axis=1)[perm]
    if stop == "postgather":
        return dict(a=(G2[:, 0] + G2[:, 9]).astype(jnp.float32))

    svalid = skey != SENT
    paych = [G2[:, c] for c in range(10)]
    lanes = jnp.stack(
        [jax.lax.bitcast_convert_type(b, jnp.float32) for b in paych[:9]]
        + [jnp.where(svalid, paych[9], -1).astype(jnp.float32)], axis=1)
    zdec = jax.lax.bitcast_convert_type(
        (skey & zmask) << zshift, jnp.float32)
    zdec = jnp.where(svalid, zdec, INF)
    if stop == "lanes":
        return dict(a=lanes[:, 0], b=zdec)

    if pack_mode == "chmajor":
        # channel-major pack: each channel (p,) -> (p/128, 128) pure
        # reshape, stacked along sublanes -> (p/128 * 16, 128)
        chs = paych[:9] + [jnp.where(svalid, paych[9], -1),
                           jax.lax.bitcast_convert_type(zdec, jnp.int32)]
        chs += [jnp.zeros((p_max,), jnp.int32)] * (16 - len(chs))
        rows = jnp.concatenate(
            [c.reshape(p_max // 128, 1, 128) for c in chs], axis=1
        ).reshape(p_max // 128 * 16, 128)
        rows = jax.lax.bitcast_convert_type(rows, jnp.float32)
    else:
        rows = bd._pack_dense(skey, lanes, zdec, p_max)
    if stop == "pack":
        return dict(a=rows[0, :].sum(), b=rows[:, 9].sum())

    sgroup = skey >> Z_BITS
    gt = sgroup.reshape(p_max // bd.TPT, bd.TPT)
    row0 = jnp.searchsorted(gt[:, bd.TPT - 1], mcodes,
                            side="left").astype(jnp.int32)
    row1 = jnp.searchsorted(gt[:, 0], mcodes,
                            side="right").astype(jnp.int32)
    return dict(a=rows[0, :].sum(), b=rows[:, 9].sum(),
                c=(row0.sum() + row1.sum()).astype(jnp.float32))


def main():
    print(f"[r5s2] devices={jax.devices()}", file=sys.stderr)
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    txn, tyn = W // TILE, H // TILE
    mcodes = jnp.asarray(bd.bin_mcodes(txn, tyn, 31 - Z_BITS))
    total, n_mid, n_g = (int(x) for x in bd.count_pairs_dense(
        verts, ca, width=W, height=H, tile=TILE, k_slots=64, k2_slots=64))
    p_max = bd.pick_cap(total + n_mid, 16 * bd.TPT)
    emit({"stage": "caps", "total": total, "p_max": p_max})
    pos = ca["pos"]

    def chain(stop, pack_mode):
        def build(k):
            @jax.jit
            def run(pos):
                acc = jnp.float32(0)
                for _ in range(k):
                    c = dict(ca, pos=pos + 1e-12 * acc)
                    out = prep_stages(verts, c, mcodes, p_max=p_max,
                                      stop=stop, pack_mode=pack_mode)
                    for v in out.values():
                        acc = acc + jnp.asarray(v, jnp.float32).sum() * 1e-9
                return acc
            return run
        return build

    stops = ["counts", "expand", "gather16", "key", "sort", "postgather",
             "lanes", "pack", "full"]
    for stop in stops:
        try:
            walls = {}
            cs = 0.0
            for k in (1, 4):
                run = chain(stop, "v3")(k)
                t0 = time.time()
                jax.block_until_ready(run(pos))
                cs += time.time() - t0
                best = 1e30
                for _ in range(3):
                    t0 = time.time()
                    jax.block_until_ready(run(pos))
                    best = min(best, time.time() - t0)
                walls[k] = best
            emit({"stage": f"stop_{stop}",
                  "marginal_ms": (walls[4] - walls[1]) / 3 * 1e3,
                  "wall1_ms": walls[1] * 1e3, "compile_s": cs})
        except Exception as e:
            emit({"stage": f"stop_{stop}",
                  "failed": f"{type(e).__name__}: {str(e)[:200]}"})

    # channel-major pack variant (prices the v3 pack's relayout)
    for stop in ("pack",):
        try:
            walls = {}
            cs = 0.0
            for k in (1, 4):
                run = chain(stop, "chmajor")(k)
                t0 = time.time()
                jax.block_until_ready(run(pos))
                cs += time.time() - t0
                best = 1e30
                for _ in range(3):
                    t0 = time.time()
                    jax.block_until_ready(run(pos))
                    best = min(best, time.time() - t0)
                walls[k] = best
            emit({"stage": "stop_pack_chmajor",
                  "marginal_ms": (walls[4] - walls[1]) / 3 * 1e3,
                  "wall1_ms": walls[1] * 1e3, "compile_s": cs})
        except Exception as e:
            emit({"stage": "stop_pack_chmajor",
                  "failed": f"{type(e).__name__}: {str(e)[:200]}"})


if __name__ == "__main__":
    main()
