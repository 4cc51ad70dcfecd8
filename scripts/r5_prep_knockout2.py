"""Round-5 session 2c: localize prep3-sg's gather16 (5.2 ms) and expand
(2.9 ms), with permutation-PROOF consumption.

Knockout round 1 (results_r5_session2.json stop_*) found the cost
centers but its tail stages consumed plain sums -- sum(X[perm]) is
permutation-invariant and XLA folded whole chains away (wall1 36 us).
Every consumption here is sum(x * w) with a fixed random weight vector,
which no reordering preserves.

Questions answered:
  q1 stack16:   is the 5.2 ms the (n,16) TABLE CONSTRUCTION (stack of
                12 (n,) arrays = lane interleave relayout)?
  q2 gatherpre: ...or the dynamic-index row gather from a PREBUILT
                const table?
  q3 scatadd:   does the v4 scatter-add expand beat scatter-max+cummax
                in context?
  q4 tail:      postgather/lanes/pack/full with honest consumption.
  q5 key_nomod: key without the k%w / k//w integer div-mod (replaced by
                a fori-style subtract -- NOT exact, pricing only).

Appends JSONL to results_r5_session2.json. nohup, no shell timeout.
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


def main():
    print(f"[r5s2c] devices={jax.devices()}", file=sys.stderr)
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    n = verts.shape[0]
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    txn, tyn = W // TILE, H // TILE
    mcodes = jnp.asarray(bd.bin_mcodes(txn, tyn, 31 - Z_BITS))
    total, n_mid, n_g = (int(x) for x in bd.count_pairs_dense(
        verts, ca, width=W, height=H, tile=TILE, k_slots=64, k2_slots=64))
    p_max = bd.pick_cap(total + n_mid, 16 * bd.TPT)
    emit({"stage": "caps2c", "total": total, "p_max": p_max})
    pos = ca["pos"]
    rng = np.random.RandomState(1)
    wp_ = jax.device_put(jnp.asarray(
        rng.rand(p_max).astype(np.float32)))
    wn_ = jax.device_put(jnp.asarray(rng.rand(n).astype(np.float32)))
    SENT = jnp.int32(0x7FFFFFFF)
    zshift = 32 - Z_BITS
    zmask = (1 << Z_BITS) - 1

    # PREBUILT camera-independent vert table (q2): legit frozen data.
    v0_ = verts[:, 0]
    cols_static = [v0_[:, c] for c in range(3)]
    cols_static += [verts[:, 1, c] - v0_[:, c] for c in range(3)]
    cols_static += [verts[:, 2, c] - v0_[:, c] for c in range(3)]
    tblv_const = jax.device_put(jnp.concatenate(
        [jnp.stack([jax.lax.bitcast_convert_type(c, jnp.int32)
                    for c in cols_static], axis=1),
         jnp.zeros((n, 7), jnp.int32)], axis=1))

    def head(cam, variant):
        """counts -> expand (variant) -> tri_of_p, plus count fields."""
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
        total_d = jnp.sum(cntc)
        iota_n = jnp.arange(n, dtype=jnp.int32)
        if variant == "scatadd":
            pe = jax.lax.cummax(jnp.where(incl, iota_n, -1))
            prev = jnp.concatenate(
                [jnp.full((1,), -1, jnp.int32), pe[:-1]])
            delta = jnp.where(incl, iota_n - prev, 0)
            offs_d = jnp.where(incl, offs, p_max)
            d = jnp.zeros((p_max,), jnp.int32).at[offs_d].add(
                delta, mode="drop")
            tri_of_p = jnp.maximum(jnp.cumsum(d) - 1, 0)
        else:
            tri_of_p = jax.lax.cummax(
                jnp.zeros((p_max,), jnp.int32).at[offs].max(
                    iota_n, mode="drop"))
        return tri_of_p, tx0, ty0, wbin, zb, offs, total_d

    def stage(cam, stop):
        tri_of_p, tx0, ty0, wbin, zb, offs, total_d = head(
            cam, "scatadd" if stop == "expand_scatadd" else "scatmax")
        if stop in ("expand_scatadd", "expand_scatmax"):
            return jnp.sum(tri_of_p.astype(jnp.float32) * wp_)
        if stop == "stack16":
            tbl = jnp.stack(
                [jax.lax.bitcast_convert_type(c, jnp.int32)
                 for c in cols_static]
                + [tx0 | (ty0 << 10) | (wbin << 20), zb, offs], axis=1)
            return jnp.sum(tbl[:, ::3].astype(jnp.float32) * wn_[:, None])
        if stop == "gatherpre16":
            G = tblv_const[tri_of_p]
            return jnp.sum((G[:, 0] ^ G[:, 8]).astype(jnp.float32) * wp_)
        if stop == "gatherpre4":
            meta = jnp.stack([tx0 | (ty0 << 10) | (wbin << 20), zb, offs,
                              jnp.zeros_like(offs)], axis=1)
            Gm = meta[tri_of_p]
            return jnp.sum((Gm[:, 0] + Gm[:, 2]).astype(jnp.float32)
                           * wp_)
        # full v5 candidate: prebuilt vert table + (n,4) meta gather +
        # key + sort2 + postgather from the CONST table + lanes + pack
        meta = jnp.stack([tx0 | (ty0 << 10) | (wbin << 20), zb, offs,
                          jnp.zeros_like(offs)], axis=1)
        Gm = meta[tri_of_p]
        p = jnp.arange(p_max, dtype=jnp.int32)
        valid = p < total_d
        k = p - Gm[:, 2]
        ch1 = Gm[:, 0]
        tx0p, ty0p = ch1 & 1023, (ch1 >> 10) & 1023
        wpn = jnp.maximum((ch1 >> 20) & 2047, 1)
        if stop == "key_nomod":
            bx = tx0p + (k & 7)        # WRONG on purpose: prices %/
            by = ty0p + (k >> 3)
        else:
            bx = tx0p + k % wpn
            by = ty0p + k // wpn
        mc = ((_part1by1(jnp, by) << jnp.uint32(1))
              | _part1by1(jnp, bx)).astype(jnp.int32)
        key = jnp.where(valid, (mc << Z_BITS) | Gm[:, 1], SENT)
        if stop in ("key", "key_nomod"):
            return jnp.sum(key.astype(jnp.float32) * wp_)
        skey, stri = jax.lax.sort((key, tri_of_p), num_keys=1)
        if stop == "sort2":
            return (jnp.sum(skey.astype(jnp.float32) * wp_)
                    + jnp.sum(stri.astype(jnp.float32) * wp_))
        Gv = tblv_const[stri]
        if stop == "postgather_const":
            return jnp.sum((Gv[:, 0] ^ Gv[:, 8]).astype(jnp.float32)
                           * wp_)
        svalid = skey != SENT
        lanes = jnp.stack(
            [jax.lax.bitcast_convert_type(Gv[:, c], jnp.float32)
             for c in range(9)]
            + [jnp.where(svalid, stri, -1).astype(jnp.float32)], axis=1)
        zdec = jax.lax.bitcast_convert_type(
            (skey & zmask) << zshift, jnp.float32)
        zdec = jnp.where(svalid, zdec, INF)
        rows = bd._pack_dense(skey, lanes, zdec, p_max)
        if stop == "pack":
            return jnp.sum(rows[:, 9] * wp_.reshape(-1, 8)[:rows.shape[0],
                                                           :1].sum(1))
        sgroup = skey >> Z_BITS
        gt = sgroup.reshape(p_max // bd.TPT, bd.TPT)
        row0 = jnp.searchsorted(gt[:, bd.TPT - 1], mcodes,
                                side="left").astype(jnp.int32)
        row1 = jnp.searchsorted(gt[:, 0], mcodes,
                                side="right").astype(jnp.int32)
        return (jnp.sum(rows[:, 9]
                        * wp_.reshape(-1, 8)[:rows.shape[0], :1].sum(1))
                + jnp.sum((row0 + row1).astype(jnp.float32)))

    def chain(stop):
        def build(k):
            @jax.jit
            def run(pos):
                acc = jnp.float32(0)
                for _ in range(k):
                    c = dict(ca, pos=pos + 1e-12 * acc)
                    acc = acc + stage(c, stop) * 1e-9
                return acc
            return run
        return build

    stops = ["expand_scatmax", "expand_scatadd", "stack16", "gatherpre16",
             "gatherpre4", "key", "key_nomod", "sort2",
             "postgather_const", "pack", "full_v5"]
    for stop in stops:
        try:
            walls = {}
            cs = 0.0
            for k in (1, 4):
                run = chain(stop)(k)
                t0 = time.time()
                jax.block_until_ready(run(pos))
                cs += time.time() - t0
                best = 1e30
                for _ in range(3):
                    t0 = time.time()
                    jax.block_until_ready(run(pos))
                    best = min(best, time.time() - t0)
                walls[k] = best
            emit({"stage": f"c2_{stop}",
                  "marginal_ms": (walls[4] - walls[1]) / 3 * 1e3,
                  "wall1_ms": walls[1] * 1e3, "compile_s": cs})
        except Exception as e:
            emit({"stage": f"c2_{stop}",
                  "failed": f"{type(e).__name__}: {str(e)[:200]}"})


if __name__ == "__main__":
    main()
