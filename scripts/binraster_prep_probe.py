#!/usr/bin/env python
"""Stage-split device probe of binraster_prep: which pass eats the 113 ms?

Stages (cumulative prefixes of the real prep, so stage k - stage k-1 is
the marginal cost of pass k, all under one jit per stage):
  A counts: project + per-tri bin rects
  B expand: marks scatter + cumsum + tri_of/bin gathers + key build
  C sort:   2-operand lax.sort of (key, tri)
  D rows:   verts gather + row table scatter + zmin decode
Also times an A/A repeat of the full prep to bound device drift.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.bvh.packed import TRI_LANES
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace import binraster as br

W, H, TILE, K = 1024, 768, 32, 5

scene = get_scene("conference", n_tris=280_000)
ca = raygen.camera_arrays(default_camera("conference"), W, H)
verts = jnp.asarray(scene.tri_verts())
txn, tyn = W // TILE, H // TILE
nb = txn * tyn
block_bin = jnp.asarray(br.bin_order(txn, tyn))
total = int(br.count_pairs(verts, ca, width=W, height=H, tile=TILE))
p_max = br.pick_pmax(total)
n = verts.shape[0]
print(f"[prep-probe] pairs={total} p_max={p_max}", file=sys.stderr)


def stage_fn(stage):
    @functools.partial(jax.jit, static_argnames=())
    def fn(v):
        tx0, tx1, ty0, ty1, cnt, zmin = br._counts(
            v, ca, width=W, height=H, tile=TILE)
        if stage == "A":
            return cnt.sum() + tx0.sum() + ty1.sum() + zmin.sum()
        starts = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(cnt)[:-1].astype(jnp.int32)])
        ends = starts + cnt
        marks = jnp.zeros((p_max + 1,), jnp.int32).at[
            jnp.minimum(ends, p_max)].add(1, mode="drop")
        tri_of = jnp.minimum(jnp.cumsum(marks[:p_max]), n - 1)
        j = jnp.arange(p_max, dtype=jnp.int32)
        valid = j < (starts[-1] + cnt[-1])
        local = j - starts[tri_of]
        wbin = tx1[tri_of] - tx0[tri_of] + 1
        bx = tx0[tri_of] + local % wbin
        by = ty0[tri_of] + local // wbin
        bin_slot = block_bin[by * txn + bx]
        zsafe = jnp.maximum(zmin[tri_of] * (1.0 - br.Z_MARGIN), 0.0)
        zbits = (jax.lax.bitcast_convert_type(zsafe, jnp.int32) >> 11) \
            & 0x1FFFFF
        key = jnp.where(valid, (bin_slot << 21) | zbits,
                        jnp.int32(0x7FFFFFFF))
        if stage == "B":
            return key.sum() + tri_of.sum()
        key, stri = jax.lax.sort((key, tri_of), num_keys=1)
        if stage == "C":
            return key.sum() + stri.sum()
        sv = v[stri]
        svalid = key != jnp.int32(0x7FFFFFFF)
        v0 = sv[:, 0]
        lanes = jnp.concatenate([
            v0, sv[:, 1] - v0, sv[:, 2] - v0,
            jnp.where(svalid, stri, -1).astype(jnp.float32)[:, None],
        ], axis=1)
        nr = p_max // br.TPB
        rows = jnp.zeros((nr, 128), jnp.float32)
        rows = rows.at[:, : br.TPB * TRI_LANES].set(
            lanes.reshape(nr, br.TPB * TRI_LANES))
        zdec = jax.lax.bitcast_convert_type(
            (key & 0x1FFFFF) << 11, jnp.float32)
        zdec = jnp.where(svalid, zdec, br.INF)
        rows = rows.at[:, br.ZLANE].set(
            jnp.min(zdec.reshape(nr, br.TPB), axis=1))
        return rows.sum()
    return fn


def marginal(make_chain):
    walls = {}
    for k in (1, K):
        fn = make_chain(k)
        jax.block_until_ready(fn(verts))
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(fn(verts))
            best = min(best, time.time() - t0)
        walls[k] = best
    return (walls[K] - walls[1]) / (K - 1) * 1e3


out = {}
for rep in range(2):
    for stage in ["A", "B", "C", "D"]:
        base = stage_fn(stage)

        def chain(k, base=base):
            @jax.jit
            def fn(v):
                acc = jnp.float32(0)
                vv = v
                for _ in range(k):
                    acc = acc + base(vv).astype(jnp.float32)
                    vv = v + 1e-30 * acc
                return acc
            return fn

        ms = marginal(chain)
        out[f"{stage}_rep{rep}"] = round(ms, 2)
        print(json.dumps({f"stage_{stage}_rep{rep}_ms": round(ms, 2)}),
              flush=True)

with open("results_binraster_prep.json", "w") as f:
    json.dump(out, f, indent=1)
