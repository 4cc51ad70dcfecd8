"""Round-5 session 2d: gather formulation A/B + sort payload scaling.

Session 2c pinned prep3-sg's cost on the dynamic-index row gather
(tbl[tri_of_p]: ~5-7 ms at 383k rows even from a prebuilt const table,
~14-19 ns/row) while everything else is ~1 ms. Before hand-writing a
Pallas expand, price every XLA formulation of the same movement -- all
IN CONTEXT (indices derive from the camera-perturbed counts):

  g_rows16      tbl[tri_of_p]                       (the baseline)
  g_take        jnp.take(tbl, idx, axis=0)          (same op, sanity)
  g_axis1       gather (16, n) along axis 1         (lane-dim gather)
  g_flat1d      16 flat 1-D gathers from tbl1d[idx*16+c]
  g_slabrows    coarse 2-aligned-slab window fetch per block (prices
                whether row-gather cost amortizes over huge rows; the
                real one-hot expand must live in a Pallas kernel)
  sort4/sort6/sort11  payload scaling of the in-context sort
  g_perm        (p,16)[perm] gather, perm from the sort (the sg tail)

Appends JSONL to results_r5_session2.json. nohup, no shell timeout.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.ray import raygen
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace import binraster_dense as bd
from ntrace_tpu.trace.binraster import _counts, Z_MARGIN
from ntrace_tpu.ops.morton import _part1by1

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_r5_session2.json")
W, H, TILE = 1024, 768, 16
Z_BITS = 12
PB = 1024      # pairs per one-hot block
TB = 2048      # tri slab per block


def emit(rec):
    rec = {k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    print(f"[r5s2d] devices={jax.devices()}", file=sys.stderr)
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    n = verts.shape[0]
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    total, n_mid, n_g = (int(x) for x in bd.count_pairs_dense(
        verts, ca, width=W, height=H, tile=TILE, k_slots=64, k2_slots=64))
    p_max = bd.pick_cap(total + n_mid, 16 * bd.TPT)
    p_max += (-p_max) % PB
    emit({"stage": "caps2d", "total": total, "p_max": p_max})
    pos = ca["pos"]
    rng = np.random.RandomState(1)
    wp_ = jax.device_put(jnp.asarray(rng.rand(p_max).astype(np.float32)))

    v0_ = verts[:, 0]
    cols_static = [v0_[:, c] for c in range(3)]
    cols_static += [verts[:, 1, c] - v0_[:, c] for c in range(3)]
    cols_static += [verts[:, 2, c] - v0_[:, c] for c in range(3)]
    tblv = jax.device_put(jnp.concatenate(
        [jnp.stack([jax.lax.bitcast_convert_type(c, jnp.int32)
                    for c in cols_static], axis=1),
         jnp.zeros((n, 7), jnp.int32)], axis=1))          # (n, 16)
    # padded to a whole number of slabs for the one-hot variant
    n_pad = n + (-n) % TB + TB
    tblv_pad = jnp.concatenate(
        [tblv, jnp.zeros((n_pad - n, 16), jnp.int32)], axis=0)
    tblv_t = jax.device_put(jnp.transpose(tblv))          # (16, n)
    tblv_1d = jax.device_put(tblv.reshape(-1))            # (n*16,)

    def head(cam):
        tx0, tx1, ty0, ty1, cnt, zmin = _counts(
            verts, cam, width=W, height=H, tile=TILE)
        over2 = cnt > 64
        incl = ~over2 & (cnt > 0)
        cntc = jnp.where(incl, cnt, 0)
        offs = jnp.cumsum(cntc) - cntc
        tri_of_p = jax.lax.cummax(
            jnp.zeros((p_max,), jnp.int32).at[offs].max(
                jnp.arange(n, dtype=jnp.int32), mode="drop"))
        zsafe = jnp.maximum(zmin * (1.0 - Z_MARGIN), 0.0)
        zb = ((jax.lax.bitcast_convert_type(zsafe, jnp.int32)
               >> (32 - Z_BITS)) & ((1 << Z_BITS) - 1))
        return tri_of_p, tx0, ty0, tx1, zb, offs, jnp.sum(cntc)

    def consume16(G):
        return jnp.sum((G[:, 0] ^ G[:, 8]).astype(jnp.float32) * wp_)

    def stage(cam, which):
        tri_of_p, tx0, ty0, tx1, zb, offs, total_d = head(cam)
        if which == "g_rows16":
            return consume16(tblv[tri_of_p])
        if which == "g_take":
            return consume16(jnp.take(tblv, tri_of_p, axis=0))
        if which == "g_axis1":
            G = jnp.take(tblv_t, tri_of_p, axis=1)        # (16, p)
            return jnp.sum((G[0] ^ G[8]).astype(jnp.float32) * wp_)
        if which == "g_flat1d":
            a = tblv_1d[tri_of_p * 16]
            b = tblv_1d[tri_of_p * 16 + 8]
            return jnp.sum((a ^ b).astype(jnp.float32) * wp_)
        if which == "g_slabrows":
            # coarse-granularity gather feasibility: fetch per-block
            # 2-aligned-slab windows as HUGE rows (nb*2 rows of TB*16
            # lanes) -- prices whether row-gather cost is per ROW
            # (amortizable by width) or per byte.
            slabs = tblv_pad.reshape(-1, TB * 16)
            tb_blk = tri_of_p.reshape(p_max // PB, PB)
            sidx = tb_blk[:, 0] // TB
            w0 = slabs[sidx]
            w1 = slabs[jnp.minimum(sidx + 1, slabs.shape[0] - 1)]
            return (jnp.sum((w0[:, ::97] ^ w1[:, ::97]).astype(
                jnp.float32)) * 1e-9
                + jnp.sum(tb_blk[:, -1].astype(jnp.float32)) * 1e-12)
        # sort payload scaling + perm gather
        p = jnp.arange(p_max, dtype=jnp.int32)
        valid = p < total_d
        key = jnp.where(valid, (tri_of_p << 2) ^ p, 0x7FFFFFFF)
        # payload operands are cheap p-scale arrays (no hidden gathers)
        # so sortN - sort2 prices ONLY the extra payload movement
        if which == "sort4":
            ops = (key, p, p * 3, p ^ 5)
        elif which == "sort6":
            ops = (key, p, p * 3, p ^ 5, p + 7, tri_of_p)
        elif which == "sort11":
            ops = (key, p) + tuple(p * c + c for c in range(2, 11))
        else:
            ops = (key, p)
        srt = jax.lax.sort(ops, num_keys=1)
        if which == "g_perm":
            G = tblv[tri_of_p]
            G2 = G[srt[1]]
            return consume16(G2)
        acc = jnp.float32(0)
        for s in srt:
            acc = acc + jnp.sum(s.astype(jnp.float32) * wp_)
        return acc

    variants = ["g_rows16", "g_take", "g_axis1", "g_flat1d", "g_slabrows",
                "sort2", "sort4", "sort6", "sort11", "g_perm"]
    for which in variants:
        try:
            walls = {}
            cs = 0.0
            for k in (1, 4):
                @jax.jit
                def run(pos, k=k, which=which):
                    acc = jnp.float32(0)
                    for _ in range(k):
                        c = dict(ca, pos=pos + 1e-12 * acc)
                        acc = acc + stage(c, which) * 1e-9
                    return acc
                t0 = time.time()
                jax.block_until_ready(run(pos))
                cs += time.time() - t0
                best = 1e30
                for _ in range(3):
                    t0 = time.time()
                    jax.block_until_ready(run(pos))
                    best = min(best, time.time() - t0)
                walls[k] = best
            emit({"stage": f"d_{which}",
                  "marginal_ms": (walls[4] - walls[1]) / 3 * 1e3,
                  "wall1_ms": walls[1] * 1e3, "compile_s": cs})
        except Exception as e:
            emit({"stage": f"d_{which}",
                  "failed": f"{type(e).__name__}: {str(e)[:200]}"})


if __name__ == "__main__":
    main()
