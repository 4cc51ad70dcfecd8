#!/usr/bin/env python
"""Round-3 consolidated device A/B sweep (ONE process; nohup + poll).

Measures, on conference-280k primary 1024x768 with the fat-leaf profile:
  1. anyred sum vs or (packet kernel any-hit reduce form)
  2. rows 8 vs 16 at the winning anyred
  3. depth-prepass tmax seeding off vs on (renderer trace_primary path)
  4. LBVH build ms/Mtri at 1M (interleaved sparse-table gathers)
  5. kd-tree capability: cell-box packet engine on conference

Chained scalar-output protocol throughout (PERF_NOTES.md metrology).
Writes results_r3_sweep.json incrementally after each section.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

RESULTS = {}


def save():
    with open("results_r3_sweep.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def chain_time(fn, args, k_lo=1, k_hi=5, reps=3):
    """Marginal seconds per call via the K-chain slope."""
    walls = {}
    for k in (k_lo, k_hi):
        @jax.jit
        def run(o, d, tn, tx, _k=k):
            acc = jnp.float32(0)
            tn2 = tn
            for _ in range(_k):
                tri, t, u, v = fn(o, d, tn2, tx)
                acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                tn2 = tn + 1e-12 * acc
            return acc
        jax.block_until_ready(run(*args))
        best = 1e30
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(run(*args))
            best = min(best, time.time() - t0)
        walls[k] = best
    return (walls[k_hi] - walls[k_lo]) / (k_hi - k_lo), walls


def main():
    t0 = time.time()
    from ntrace_tpu.bvh.packed import pack_bvh, pick_layout
    from ntrace_tpu.core import BuildConfig
    from ntrace_tpu.ray import pixel_table, raygen
    from ntrace_tpu.render.renderer import build_accel, seeded_closest_trace
    from ntrace_tpu.scenes import default_camera, get_scene
    from ntrace_tpu.trace.packet_pallas import trace_packet

    print(f"[r3] devices={jax.devices()}", flush=True)
    scene = get_scene("conference", n_tris=280_000)
    bcfg = BuildConfig(builder="binned_sah", sah_tri_cost=0.02,
                       max_leaf_size=48)
    flat = build_accel(scene, bcfg, use_cache=True)
    n_refs = int((flat.tri_index >= 0).sum())
    enc = np.ascontiguousarray(flat.nodes[:, 12:14]).view(np.int32)
    avg_leaf = n_refs / max(int((enc < 0).sum()), 1)
    tpr, npr = pick_layout(flat.nodes.shape[0], n_refs, avg_leaf=avg_leaf)
    pk = pack_bvh(flat, scene.tri_verts(), tris_per_row=tpr, nodes_per_row=npr)
    nodes_d = jax.device_put(jnp.asarray(pk.nodes8))
    tris_d = jax.device_put(jnp.asarray(pk.tris12))
    lu = 4 if avg_leaf >= 6.0 else 1
    W, H = 1024, 768
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(raygen.camera_arrays(default_camera("conference"),
                                                W, H), W, H,
                           jnp.asarray(order_px))
    R = batch.num_rays
    args = (batch.orig, batch.dirn, batch.tmin, batch.tmax)
    print(f"[r3] setup done ({time.time()-t0:.0f}s)", flush=True)

    def tracer_for(rows, anyred):
        def fn(o, d, tn, tx, any_hit=False):
            return trace_packet(nodes_d, tris_d, o, d, tn, tx,
                                any_hit=any_hit, rows=rows, order="code",
                                tris_per_row=tpr, nodes_per_row=npr,
                                leaf_unroll=lu, anyred=anyred)
        return fn

    # --- 1+2: anyred x rows ---------------------------------------------
    for rows in (16, 8):
        for anyred in ("sum", "or"):
            f = tracer_for(rows, anyred)
            marg, walls = chain_time(lambda o, d, tn, tx: f(o, d, tn, tx),
                                     args)
            key = f"packet_rows{rows}_{anyred}"
            RESULTS[key] = dict(marginal_ms=round(marg * 1e3, 2),
                                mrays=round(R / 1e6 / marg, 1),
                                wall1_ms=round(walls[1] * 1e3, 1))
            print(f"[r3] {key}: {RESULTS[key]}", flush=True)
            save()

    best = max(((k, v) for k, v in RESULTS.items()
                if k.startswith("packet_rows")),
               key=lambda kv: kv[1]["mrays"])
    rows_b = 8 if "rows8" in best[0] else 16
    anyred_b = "or" if best[0].endswith("_or") else "sum"
    print(f"[r3] best base config: {best[0]}", flush=True)

    # --- 3: seeding off vs on at the best config ------------------------
    fb = tracer_for(rows_b, anyred_b)
    marg, _ = chain_time(
        lambda o, d, tn, tx: seeded_closest_trace(fb, o, d, tn, tx), args)
    RESULTS["packet_seeded"] = dict(marginal_ms=round(marg * 1e3, 2),
                                    mrays=round(R / 1e6 / marg, 1),
                                    rows=rows_b, anyred=anyred_b)
    print(f"[r3] packet_seeded: {RESULTS['packet_seeded']}", flush=True)
    save()

    # --- 4: LBVH build probe (interleaved-table gathers) ----------------
    from ntrace_tpu.bvh.lbvh import lbvh_device_fast
    from ntrace_tpu.scenes import make_random_soup

    soup = make_random_soup(n_tris=1_000_000, seed=2)
    tv = jnp.asarray(soup.tri_verts())
    tlo, thi = tv.min(axis=1), tv.max(axis=1)
    lo, hi = soup.bbox()

    @jax.jit
    def build_once(shift):
        out = lbvh_device_fast(tlo + shift, thi + shift, tv,
                               jnp.asarray(lo), jnp.asarray(hi), max_leaf=32)
        return out["nodes"].sum() + out["tri_index"].sum()

    jax.block_until_ready(build_once(jnp.float32(0.0)))
    best_s = 1e30
    for i in range(5):
        t1 = time.time()
        jax.block_until_ready(build_once(jnp.float32(i * 1e-7)))
        best_s = min(best_s, time.time() - t1)
    RESULTS["lbvh_ms_per_mtri"] = round(best_s * 1e3, 1)
    print(f"[r3] lbvh: {best_s*1e3:.1f} ms/Mtri", flush=True)
    save()

    # --- 5: kd cell-box packet engine on conference ---------------------
    from ntrace_tpu.bvh.kdtree import build_kdtree, kd_to_flatbvh

    kcfg = BuildConfig(builder="kdtree", max_leaf_size=16, sah_tri_cost=0.5)
    kd = build_accel(scene, kcfg, use_cache=True)
    kflat = kd_to_flatbvh(kd)
    kn_refs = int((kflat.tri_index >= 0).sum())
    kenc = np.ascontiguousarray(kflat.nodes[:, 12:14]).view(np.int32)
    kavg = kn_refs / max(int((kenc < 0).sum()), 1)
    ktpr, knpr = pick_layout(kflat.nodes.shape[0], kn_refs, avg_leaf=kavg)
    kpk = pack_bvh(kflat, scene.tri_verts(), tris_per_row=ktpr,
                   nodes_per_row=knpr)
    knodes = jax.device_put(jnp.asarray(kpk.nodes8))
    ktris = jax.device_put(jnp.asarray(kpk.tris12))
    klu = 4 if kavg >= 6.0 else 1
    print(f"[r3] kd nodes={kflat.nodes.shape[0]} refs={kn_refs} "
          f"avg_leaf={kavg:.1f} tpr={ktpr} npr={knpr}", flush=True)

    def kfn(o, d, tn, tx):
        return trace_packet(knodes, ktris, o, d, tn, tx, rows=rows_b,
                            order="code", tris_per_row=ktpr,
                            nodes_per_row=knpr, leaf_unroll=klu,
                            anyred=anyred_b)

    marg, _ = chain_time(kfn, args)
    RESULTS["kd_cellbox_packet"] = dict(marginal_ms=round(marg * 1e3, 2),
                                        mrays=round(R / 1e6 / marg, 2))
    print(f"[r3] kd_cellbox_packet: {RESULTS['kd_cellbox_packet']}",
          flush=True)
    save()
    print(f"[r3] SWEEP DONE total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
