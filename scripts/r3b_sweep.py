#!/usr/bin/env python
"""Round-3b device A/B sweep (ONE process; nohup + poll).

Sections (each saved incrementally to results_r3b_sweep.json):
  1. reduce-form microprobe: cross-lane sum vs or vs max reduce cost
     inside a Pallas pointer-chase loop (decides whether wide treelet
     rows can get ALL child any-bits from ONE untyped OR reduce).
  2. conference-280k primary: packet rows16 baseline vs leafbc / slabbc /
     both (vector-pipe operand broadcasts replacing scalar lane extracts).
  3. LBVH chain anomaly: single-wall vs fori-chain marginal vs
     UNROLLED-chain marginal at 1M (same dependent perturbation), plus
     max_leaf 8 vs 32.

Chained scalar-output protocol throughout (PERF_NOTES.md metrology).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RESULTS = {}
OUT = "results_r3b_sweep.json"


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)


def wall(fn, reps=3):
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn())
        best = min(best, time.time() - t0)
    return best


# --- 1. reduce-form + batch-step microprobes ------------------------------

def _reduce_probe_kernel(red: str, iters: int):
    def kernel(tab_ref, out_ref, *scratch):
        def body(i, carry):
            node, acc = carry
            row = tab_ref[pl.ds(node, 1), :]
            m = (row > 0.5).astype(jnp.int32)
            if red == "sum":
                r = jnp.sum(m << 16 | m)
            elif red == "sum4":
                # 4 INDEPENDENT packed reduces (the BFS node-batch needs
                # 16 any-bit fields = 4 int32 reduces; if their latencies
                # overlap this is ~1 reduce + small issue cost, not 4x).
                r = jnp.int32(0)
                for q in range(4):
                    # 255 << 24 overflows int32 as a Python literal; route
                    # the mask through uint32 so the jit arg stays in range.
                    mask = jnp.full((), 255 << (8 * q), jnp.uint32)
                    r = r | (jnp.sum((m >> q) << 16 | m)
                             & mask.astype(jnp.int32))
            elif red == "or":
                # explicit lax.reduce: np.bitwise_or.reduce's weak-typed
                # init clashed with the fori carry (int32[] vs weak).
                r = jax.lax.reduce(m << 16 | m, jnp.int32(0),
                                   jax.lax.bitwise_or, (0, 1))
            elif red == "max":
                r = jnp.max(m << 16 | m)
            elif red == "roll1row":
                # sublane-OR fold to (1,128) then 7 lane-roll ORs + one
                # extract: the reduce-free 16-bit verdict path.
                p = m
                w = p.shape[0]
                while w > 1:
                    w //= 2
                    p = p[:w] | p[w:2 * w]
                for sh in (64, 32, 16, 8, 4, 2, 1):
                    p = p | pltpu.roll(p, sh, axis=1)
                r = p[0, 0]
            elif red == "load8":
                # 8 independent row loads + slab-ish VPU + ONE reduce:
                # the BFS batch step's load pattern (loads should overlap
                # near-perfectly per the round-2 pointer-chase probe).
                acc_v = jnp.zeros_like(m)
                for q in range(8):
                    rq = tab_ref[pl.ds((node + q * 37) & 1023, 1), :]
                    acc_v = acc_v | ((rq > 0.5).astype(jnp.int32) << q)
                r = jnp.sum(acc_v)
            elif red == "smem16":
                # 16 masked SMEM writes + counter advances (the BFS
                # push path). junk slot = index 255.
                sq = scratch[0]
                sp = jnp.int32(0)
                r = jnp.sum(m)
                for q in range(16):
                    hit = ((r >> q) & 1) > 0
                    sq[jnp.where(hit, jnp.minimum(sp, 254), 255)] = r + q
                    sp = sp + hit.astype(jnp.int32)
                r = r + sp
            else:  # "none": pointer chase only
                r = row[0, 0].astype(jnp.int32)
            node = (node * 1103515245 + 12345 + (r & 1)) & 1023
            return node, acc + r
        node, acc = jax.lax.fori_loop(
            0, iters, body, (jnp.int32(0), jnp.int32(0)))
        out_ref[0, 0] = acc + node

    return kernel


def reduce_probe():
    tab = jnp.asarray(np.random.default_rng(0).random((1024, 128), np.float32))
    for red in ("none", "sum", "sum4", "or", "max", "roll1row", "load8",
                "smem16"):
        try:
            times = {}
            for iters in (1024, 8192):
                f = pl.pallas_call(
                    _reduce_probe_kernel(red, iters),
                    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                    scratch_shapes=[pltpu.SMEM((256,), jnp.int32)],
                )
                g = jax.jit(lambda t, f=f: f(t))
                jax.block_until_ready(g(tab))
                times[iters] = wall(lambda: g(tab))
            ns = (times[8192] - times[1024]) / (8192 - 1024) * 1e9
            RESULTS[f"reduce_{red}_ns_per_iter"] = round(ns, 1)
            print(f"[r3b] reduce {red}: {ns:.1f} ns/iter", flush=True)
        except Exception as e:  # noqa: BLE001 — probe records lowering gaps
            RESULTS[f"reduce_{red}_ns_per_iter"] = f"unsupported: {type(e).__name__}"
            print(f"[r3b] reduce {red}: unsupported ({e})"[:200], flush=True)
        save()


# --- 2. conference packet broadcast knobs --------------------------------

def chain_time(fn, args, k_lo=1, k_hi=5, reps=3):
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
        walls[k] = wall(lambda: run(*args), reps)
    return (walls[k_hi] - walls[k_lo]) / (k_hi - k_lo), walls


def conference_section():
    from ntrace_tpu.bvh.packed import pack_bvh, pick_layout
    from ntrace_tpu.core import BuildConfig
    from ntrace_tpu.ray import pixel_table, raygen
    from ntrace_tpu.render.renderer import build_accel
    from ntrace_tpu.scenes import default_camera, get_scene
    from ntrace_tpu.trace.packet_pallas import trace_packet

    t0 = time.time()
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
    print(f"[r3b] conference setup done ({time.time()-t0:.0f}s)", flush=True)

    def timed(key, fn):
        """Chained-marginal timing with per-config failure isolation:
        one kernel variant failing to compile on device must not kill
        the rest of the unattended sweep."""
        try:
            marg, walls = chain_time(fn, args)
            RESULTS[key] = dict(marginal_ms=round(marg * 1e3, 2),
                                mrays=round(R / 1e6 / marg, 1),
                                wall1_ms=round(walls[1] * 1e3, 1))
        except Exception as e:  # noqa: BLE001 — record and continue
            RESULTS[key] = f"failed: {type(e).__name__}: {e}"[:300]
        print(f"[r3b] {key}: {RESULTS[key]}", flush=True)
        save()

    for name, kw in (
        ("base", {}),
        ("leafbc", dict(leafbc=True)),
        ("slabbc", dict(slabbc=True)),
        ("bothbc", dict(leafbc=True, slabbc=True)),
    ):
        def f(o, d, tn, tx, kw=kw):
            return trace_packet(nodes_d, tris_d, o, d, tn, tx,
                                rows=16, order="code", tris_per_row=tpr,
                                nodes_per_row=npr, leaf_unroll=lu,
                                anyred="sum", **kw)
        timed(f"packet16_{name}", f)

    # BFS node-batch kernel (needs nodes_per_row=1 tables).
    if npr == 1:
        from ntrace_tpu.trace.packet_bfs import trace_packet_bfs

        for rows_b in (16, 8):
            def fb(o, d, tn, tx, rows_b=rows_b):
                return trace_packet_bfs(nodes_d, tris_d, o, d, tn, tx,
                                        rows=rows_b, tris_per_row=tpr,
                                        leaf_unroll=lu)
            timed(f"packet_bfs{rows_b}", fb)

    # Combined kernel: BFS node batches + deferred per-row leaves --
    # the two levers attack independent frame shares (node chain ~42%,
    # lockstep leaf work ~58% at rows=16).
    if npr == 1:
        from ntrace_tpu.trace.packet_bdl import trace_packet_bdl

        for rows_c, dmin in ((16, 0), (32, 0), (16, 64), (64, 0)):
            def fc(o, d, tn, tx, rows_c=rows_c, dmin=dmin):
                return trace_packet_bdl(nodes_d, tris_d, o, d, tn, tx,
                                        rows=rows_c, tris_per_row=tpr,
                                        drain_min=dmin)
            timed(f"packet_bdl{rows_c}_dm{dmin or rows_c}", fc)

        # Contiguous-sibling run merge: halves the per-leaf-event 16-row
        # scalar enqueue chain (the cost model's dominant bdl term) at
        # the price of superset drain rows on want-mismatched rows.
        for rows_c in (16, 32):
            def fm(o, d, tn, tx, rows_c=rows_c):
                return trace_packet_bdl(nodes_d, tris_d, o, d, tn, tx,
                                        rows=rows_c, tris_per_row=tpr,
                                        merge_sibs=True)
            timed(f"packet_bdl{rows_c}_dm{rows_c}_ms", fm)

        # Grouped run queues (session-5): divide the per-event enqueue
        # chain by qgroup; grouped rows drain the union of their wants
        # (superset, exact). Composes with merge_sibs.
        for rows_c, qg, ms in ((16, 2, True), (16, 4, True), (16, 8, True),
                               (16, 4, False), (32, 4, True), (32, 8, True)):
            def fg(o, d, tn, tx, rows_c=rows_c, qg=qg, ms=ms):
                return trace_packet_bdl(nodes_d, tris_d, o, d, tn, tx,
                                        rows=rows_c, tris_per_row=tpr,
                                        merge_sibs=ms, qgroup=qg)
            timed(f"packet_bdl{rows_c}_qg{qg}{'_ms' if ms else ''}", fg)

        # Fatter leaves (ml=96): fewer leaf EVENTS (enqueue chains) per
        # frame at the same drain-row count -- the build-side route to
        # cheaper enqueues. Separate accel (cached after first build).
        try:
            bcfg96 = BuildConfig(builder="binned_sah", sah_tri_cost=0.02,
                                 max_leaf_size=96)
            flat96 = build_accel(scene, bcfg96, use_cache=True)
            n_refs96 = int((flat96.tri_index >= 0).sum())
            pk96 = pack_bvh(flat96, scene.tri_verts(), tris_per_row=tpr,
                            nodes_per_row=1)
            nodes96 = jax.device_put(jnp.asarray(pk96.nodes8))
            tris96 = jax.device_put(jnp.asarray(pk96.tris12))

            def f96(o, d, tn, tx):
                return trace_packet_bdl(nodes96, tris96, o, d, tn, tx,
                                        rows=16, tris_per_row=tpr,
                                        merge_sibs=True)
            timed("packet_bdl16_dm16_ms_ml96", f96)
        except Exception as e:  # noqa: BLE001
            RESULTS["packet_bdl16_dm16_ms_ml96"] = (
                f"failed: {type(e).__name__}: {e}"[:300])
            save()

    # Deferred-leaf kernel: per-row leaf pairing (3.9x pair-count ceiling
    # measured by scripts/leaf_union_probe.py).  rows=32 is the design
    # target -- node sharing without the lockstep leaf blowup.
    from ntrace_tpu.trace.packet_dleaf import trace_packet_dleaf

    for rows_d, dmin in ((16, 0), (32, 0), (16, 8), (32, 64)):
        def fd(o, d, tn, tx, rows_d=rows_d, dmin=dmin):
            return trace_packet_dleaf(nodes_d, tris_d, o, d, tn, tx,
                                      rows=rows_d, tris_per_row=tpr,
                                      nodes_per_row=npr, drain_min=dmin)
        timed(f"packet_dleaf{rows_d}_dm{dmin or rows_d}", fd)


# --- 3. LBVH chain anomaly ------------------------------------------------

def lbvh_section():
    from ntrace_tpu.bvh.lbvh import lbvh_device_fast
    from ntrace_tpu.scenes import make_random_soup

    soup = make_random_soup(n_tris=1_000_000, seed=2)
    tv = jnp.asarray(soup.tri_verts())
    tlo, thi = tv.min(axis=1), tv.max(axis=1)
    lo, hi = (jnp.asarray(x) for x in soup.bbox())

    def lbvh_one(ml, emit):
        def one(shift, ml=ml, emit=emit):
            if emit == "packed":
                out = lbvh_device_fast(tlo + shift, thi, tv, lo, hi,
                                       max_leaf=ml, emit="packed")
                return (out["pnodes"].sum() * 1e-9
                        + out["ptris"].sum() * 1e-9
                        + out["node_count"].astype(jnp.float32))
            out = lbvh_device_fast(tlo + shift, thi, tv, lo, hi, max_leaf=ml)
            return (out["nodes"].sum() * 1e-9
                    + out["woop"].sum() * 1e-9
                    + out["tri_index"].sum().astype(jnp.float32) * 1e-9
                    + out["node_count"].astype(jnp.float32))

        # single wall
        f1 = jax.jit(lambda s: one(s))
        jax.block_until_ready(f1(jnp.float32(0.0)))
        w1 = wall(lambda: f1(jnp.float32(1e-7)), reps=4)

        # fori chain marginal
        def fori_k(k):
            @jax.jit
            def run(s):
                def body(i, acc):
                    return acc + one(s + acc * 1e-30)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
            jax.block_until_ready(run(jnp.float32(0.0)))
            return wall(lambda: run(jnp.float32(1e-7)), reps=2)
        fori = (fori_k(5) - fori_k(1)) / 4

        # unrolled chain marginal (same dependency structure, no loop)
        def unr_k(k):
            @jax.jit
            def run(s):
                acc = jnp.float32(0.0)
                for _ in range(k):
                    acc = acc + one(s + acc * 1e-30)
                return acc
            jax.block_until_ready(run(jnp.float32(0.0)))
            return wall(lambda: run(jnp.float32(1e-7)), reps=2)
        unr = (unr_k(5) - unr_k(1)) / 4

        RESULTS[f"lbvh_{emit}_ml{ml}"] = dict(
            wall1_ms=round(w1 * 1e3, 1),
            fori_marginal_ms=round(fori * 1e3, 1),
            unrolled_marginal_ms=round(unr * 1e3, 1))
        print(f"[r3b] lbvh {emit} ml{ml}: {RESULTS[f'lbvh_{emit}_ml{ml}']}", flush=True)
        save()

    for ml, emit in ((8, "flat"), (8, "packed"), (32, "packed")):
        try:  # per-config isolation for the unattended session
            lbvh_one(ml, emit)
        except Exception as e:  # noqa: BLE001 — record and continue
            RESULTS[f"lbvh_{emit}_ml{ml}"] = (
                f"failed: {type(e).__name__}: {e}"[:300])
            print(f"[r3b] lbvh {emit} ml{ml}: {RESULTS[f'lbvh_{emit}_ml{ml}']}",
                  flush=True)
            save()


def main():
    print(f"[r3b] devices={jax.devices()}", flush=True)
    reduce_probe()
    conference_section()
    lbvh_section()
    print("[r3b] SWEEP DONE", flush=True)


if __name__ == "__main__":
    main()
