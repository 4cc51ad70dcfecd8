#!/usr/bin/env python
"""Device A/B: gather-free fixed-slot bin-raster prep vs the v0 stream
expansion, then full-frame (prep + kernel) marginals for the fast path.

The stage probe (results_binraster_prep.json-era run) put v0 at ~103 ms
of expansion gathers + ~25 ms of verts gather/row pack vs 0.24 ms of
counts and a ~free sort -- this prices the formulation that deletes the
gathers. bench.py protocol: steady-state chained marginal, K=1 vs 5.

Run on the TPU; writes results_binraster_fast.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.bvh.golden import brute_force_mt
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace import binraster as br

W = int(os.environ.get("NTRACE_BENCH_W", 1024))
H = int(os.environ.get("NTRACE_BENCH_H", 768))
TILE = 32
K = int(os.environ.get("NTRACE_BENCH_CHAIN", 5))
N_TRIS = int(os.environ.get("NTRACE_BENCH_TRIS", 280_000))

out_path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results_binraster_fast.json")
results = []


def record(**kw):
    results.append(kw)
    print(json.dumps(kw), flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


def marginal_time(run, args):
    walls = {}
    for k in (1, K):
        fn = run(k)
        jax.block_until_ready(fn(*args))
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            best = min(best, time.time() - t0)
        walls[k] = best
    return (walls[K] - walls[1]) / (K - 1), walls


def main():
    t0 = time.time()
    print(f"[probe] platform={jax.default_backend()}", file=sys.stderr)
    scene = get_scene("conference", n_tris=N_TRIS)
    ca = raygen.camera_arrays(default_camera("conference"), W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    R = batch.num_rays
    verts = jnp.asarray(scene.tri_verts())
    txn, tyn = W // TILE, H // TILE
    nb = txn * tyn
    mcodes = jnp.asarray(br._bin_mcodes(txn, tyn))
    dirs = jnp.transpose(batch.dirn).reshape(3 * nb * 8, 128)
    scalars = jnp.concatenate([
        ca["pos"].astype(jnp.float32),
        jnp.stack([ca["znear"], ca["zfar"],
                   jnp.float32(0), jnp.float32(0), jnp.float32(0)])])

    for k_slots in (4, 8):
        total, n_mid, n_g = (int(x) for x in br.count_pairs_fast(
            verts, ca, width=W, height=H, tile=TILE, k_slots=k_slots))
        p_max = br.pick_pmax(total)
        g_max = br.pick_gmax(n_mid + n_g)
        g2_max = br.pick_gmax(n_g, floor=192)
        record(stage="counts", k_slots=k_slots, total=total,
               n_mid=n_mid, n_g=n_g, p_max=p_max, g_max=g_max,
               g2_max=g2_max)

        for payload in (True, False):
            tag = f"k{k_slots}_{'pay' if payload else 'idx'}"

            def prep_run(k, k_slots=k_slots, p_max=p_max, g_max=g_max,
                         g2_max=g2_max, payload=payload):
                @jax.jit
                def fn(v):
                    acc = jnp.float32(0)
                    vv = v
                    for _ in range(k):
                        rows, r0, r1, g1, ok = br.binraster_prep_fast(
                            vv, ca, mcodes, width=W, height=H, tile=TILE,
                            k_slots=k_slots, g_max=g_max, p_max=p_max,
                            g2_max=g2_max, payload=payload)
                        acc = (acc + rows[0, 0] + g1[0]
                               + ok.astype(jnp.float32))
                        vv = v + 1e-30 * acc
                    return acc
                return fn

            try:
                m_prep, walls = marginal_time(prep_run, (verts,))
                record(stage="prep", cfg=tag,
                       marginal_ms=round(m_prep * 1e3, 2),
                       wall1_ms=round(walls[1] * 1e3, 1))
            except Exception as e:  # noqa: BLE001
                record(stage="prep", cfg=tag, failed=repr(e)[:300])
                continue

        # full frame at the best knobs from the session-6 sweep
        for unroll, ez in [(4, 8), (8, 8), (4, 16)]:
            tag = f"k{k_slots}_u{unroll}_ez{ez}"

            def full_run(k, k_slots=k_slots, p_max=p_max, g_max=g_max,
                         g2_max=g2_max, unroll=unroll, ez=ez):
                @jax.jit
                def fn(v, d):
                    acc = jnp.float32(0)
                    vv = v
                    for _ in range(k):
                        rows, r0, r1, g1, ok = br.binraster_prep_fast(
                            vv, ca, mcodes, width=W, height=H, tile=TILE,
                            k_slots=k_slots, g_max=g_max, p_max=p_max,
                            g2_max=g2_max)
                        tri, t, u, vb = br.trace_binraster_rows(
                            rows, r0, r1, d, scalars, g1, n_bins=nb,
                            unroll=unroll, ez_chunk=ez)
                        tri = jnp.where(ok, tri, -2)
                        acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                        vv = v + 1e-30 * acc
                    return acc, tri, t
                return fn

            try:
                marg, walls = marginal_time(full_run, (verts, dirs))
                mrays = R / 1e6 / marg
                record(stage="full", cfg=tag,
                       marginal_ms=round(marg * 1e3, 2),
                       mrays=round(mrays, 2),
                       wall1_ms=round(walls[1] * 1e3, 1))
                if (results[-1].get("mrays") or 0) == max(
                        (r.get("mrays") or 0) for r in results):
                    acc, tri, t = full_run(1)(verts, dirs)
                    n_sub = 2048
                    stride = max(R // n_sub, 1)
                    sub = np.arange(0, R, stride)
                    rec = brute_force_mt(
                        scene, np.asarray(batch.orig)[sub],
                        np.asarray(batch.dirn)[sub],
                        np.asarray(batch.tmin)[sub],
                        np.asarray(batch.tmax)[sub])
                    mism = int((np.asarray(tri)[sub] != rec.tri).sum())
                    record(stage="golden", cfg=tag, sampled=len(sub),
                           mismatches=mism, match=mism == 0)
            except Exception as e:  # noqa: BLE001
                record(stage="full", cfg=tag, failed=repr(e)[:300])
    print(f"[probe] done {time.time()-t0:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
