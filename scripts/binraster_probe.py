#!/usr/bin/env python
"""Device probe: bin-raster primary engine on the Conference stand-in.

Measures (bench.py protocol: steady-state chained-frame marginal, K=1 vs
K=5) the FULL per-frame cost -- projection + binning + sort prep AND the
Pallas intersection kernel -- for a sweep of (unroll, ez_chunk) knobs,
plus a prep-only chain to split the two. Golden: brute-force MT on a
deterministic ray subsample (same lowest-tri-id tie-break).

Run on the TPU; writes results_binraster.json.
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
from ntrace_tpu.trace.binraster import (
    bin_order, binraster_prep, count_pairs, pick_pmax, trace_binraster_rows)

W = int(os.environ.get("NTRACE_BENCH_W", 1024))
H = int(os.environ.get("NTRACE_BENCH_H", 768))
TILE = 32
K = int(os.environ.get("NTRACE_BENCH_CHAIN", 5))
N_TRIS = int(os.environ.get("NTRACE_BENCH_TRIS", 280_000))

out_path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results_binraster.json")
results = []


def record(**kw):
    results.append(kw)
    print(json.dumps(kw), flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


def marginal_time(run, args):
    """bench.py protocol: best-of-3 walls for K=1 and K, marginal/frame."""
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
    cam_h = default_camera("conference")
    ca = raygen.camera_arrays(cam_h, W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    R = batch.num_rays
    verts = jnp.asarray(scene.tri_verts())
    txn, tyn = W // TILE, H // TILE
    nb = txn * tyn

    total = int(count_pairs(verts, ca, width=W, height=H, tile=TILE))
    p_max = pick_pmax(total)
    rows_mb = p_max // 12 * 128 * 4 / 2**20
    record(stage="pairs", total_pairs=total, p_max=p_max,
           pairs_per_tri=round(total / scene.num_tris, 2),
           rows_mb=round(rows_mb, 1))

    block_bin = jnp.asarray(bin_order(txn, tyn))
    scalars = jnp.concatenate([
        ca["pos"].astype(jnp.float32),
        jnp.stack([ca["znear"], ca["zfar"],
                   jnp.float32(0), jnp.float32(0), jnp.float32(0)])])
    dirs = jnp.transpose(batch.dirn).reshape(3 * nb * 8, 128)

    # --- prep-only marginal (projection + expand + sort + row table) ----
    def prep_run(k):
        @jax.jit
        def fn(v):
            acc = jnp.float32(0)
            vv = v
            for _ in range(k):
                rows, r0, r1, tt = binraster_prep(
                    vv, ca, block_bin, width=W, height=H,
                    tile=TILE, p_max=p_max)
                acc = acc + rows[0, 0] + tt.astype(jnp.float32)
                vv = v + 1e-30 * acc      # serialize frames
            return acc
        return fn

    m_prep, walls = marginal_time(prep_run, (verts,))
    record(stage="prep", marginal_ms=round(m_prep * 1e3, 2),
           wall1_ms=round(walls[1] * 1e3, 1),
           wallK_ms=round(walls[K] * 1e3, 1))

    # --- full-frame sweep ------------------------------------------------
    rows, r0a, r1a, _tt = binraster_prep(
        verts, ca, block_bin, width=W, height=H, tile=TILE, p_max=p_max)
    jax.block_until_ready(rows)
    rows_per_bin = np.asarray(r1a) - np.asarray(r0a)
    record(stage="bins", mean_rows=float(rows_per_bin.mean()),
           max_rows=int(rows_per_bin.max()), p50=int(np.median(rows_per_bin)))

    best = None
    for unroll, ez in [(4, 8), (4, 0), (8, 8), (2, 4), (4, 4), (8, 16),
                       (4, 16), (2, 8)]:
        tag = f"u{unroll}_ez{ez}"
        try:
            def full_run(k, unroll=unroll, ez=ez):
                @jax.jit
                def fn(v, d):
                    acc = jnp.float32(0)
                    vv = v
                    for _ in range(k):
                        rw, r0, r1, tt = binraster_prep(
                            vv, ca, block_bin, width=W, height=H,
                            tile=TILE, p_max=p_max)
                        tri, t, u, vv_ = trace_binraster_rows(
                            rw, r0, r1, d, scalars, n_bins=nb,
                            unroll=unroll, ez_chunk=ez)
                        acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                        vv = v + 1e-30 * acc
                    return acc, tri, t
                return fn

            marg, walls = marginal_time(full_run, (verts, dirs))
            mrays = R / 1e6 / marg
            # kernel-only estimate = full - prep
            record(stage="full", cfg=tag, marginal_ms=round(marg * 1e3, 2),
                   mrays=round(mrays, 2),
                   kernel_ms_est=round((marg - m_prep) * 1e3, 2),
                   wall1_ms=round(walls[1] * 1e3, 1))
            if best is None or mrays > best[1]:
                acc, tri, t = full_run(1)(verts, dirs)
                best = (tag, mrays, np.asarray(tri), np.asarray(t))
        except Exception as e:  # noqa: BLE001
            record(stage="full", cfg=tag, failed=repr(e)[:300])

    # --- golden subsample check on the best config ----------------------
    if best is not None:
        tag, mrays, tri_d, t_d = best
        n_sub = 2048
        stride = max(R // n_sub, 1)
        sub = np.arange(0, R, stride)
        rec = brute_force_mt(
            scene, np.asarray(batch.orig)[sub], np.asarray(batch.dirn)[sub],
            np.asarray(batch.tmin)[sub], np.asarray(batch.tmax)[sub])
        mism = int((tri_d[sub] != rec.tri).sum())
        record(stage="golden", cfg=tag, mrays=round(mrays, 2),
               sampled=len(sub), mismatches=mism, match=mism == 0)
    print(f"[probe] done {time.time()-t0:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
