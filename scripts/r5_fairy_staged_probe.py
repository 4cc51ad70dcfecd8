"""Round-5: fairy diffuse staged-interval economics (VERDICT r4 #3).

Fairy diffuse sits at 6.5-8.6 Mrays/s vs AO's 117 on the same packet
kernel: the gap is LONG incoherent closest-hit rays (full-scene tmax)
vs short any-hit rays. Subset-seeding lost (r5 session 3). New lever:
EXACT two-interval decomposition -- closest hit in [tn, tx) equals the
hit in [tn, r) when one exists (any hit there bounds hitT below r, and
BVH traversal with tmax=r is exhaustive within r), else the hit in
[tn, tx) retraced in full. Bounce rays in an interior scene mostly hit
near their origin, so a short-tmax near pass (AO-class economics)
resolves most rays and only a compacted remainder pays the full-length
walk.

This probe prices the parts separately on device:
  * near-pass marginal + resolve fraction at r in {2,5,10,20}% of scene
    scale;
  * far-pass marginal at compacted power-of-two sizes (the remainder's
    cost curve);
  * the sort/merge overhead (10-op + 5-op lax.sort at 3.1M).
Appends JSONL to results_r5_session4.json; the winning composition, if
any, gets integrated behind a RenderConfig knob and A/B'd end-to-end.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.core import BuildConfig, RenderConfig
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.render.renderer import Renderer, build_accel
from ntrace_tpu.scenes import default_camera, get_scene

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_r5_session4.json")
W, H = 1024, 768
K = 4


def emit(rec):
    rec = {k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def marginal(fn, args, ks=(1, K)):
    walls, cs = {}, 0.0
    for k in ks:
        run = fn(k)
        t0 = time.time()
        jax.block_until_ready(run(*args))
        cs += time.time() - t0
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(run(*args))
            best = min(best, time.time() - t0)
        walls[k] = best
    return ((walls[ks[1]] - walls[ks[0]]) / (ks[1] - ks[0]),
            walls[ks[0]], cs)


def chain_tracer(tracer, any_hit):
    def fn(k):
        @jax.jit
        def run(o, d, tn, tx):
            def body(_, c):
                acc, tn2 = c
                stri, st, *_ = tracer(o, d, tn2, tx, any_hit)
                acc = acc + jnp.where(st < 3e37, st, 0.0).sum()
                return acc, tn + 1e-12 * acc
            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0), tn))
            return acc
        return run
    return fn


def main():
    print(f"[fst] devices={jax.devices()}", file=sys.stderr)
    scene = get_scene("fairy", n_tris=170_000)
    cam = default_camera("fairy")
    ca = raygen.camera_arrays(cam, W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    bcfg = BuildConfig(builder="binned_sah", max_leaf_size=32,
                       sah_tri_cost=0.02)
    flat = build_accel(scene, bcfg, use_cache=True)
    r = Renderer(scene, bcfg, RenderConfig(
        width=W, height=H, mode="diffuse", samples=4, packet_rows=16,
        engine="auto"), flat=flat)
    tri0, t0_, *_ = r.trace_primary(
        batch.orig, batch.dirn, batch.tmin, batch.tmax, cam=ca)
    jax.block_until_ready(t0_)
    sec, any_hit = r.gen_secondary(cam, "diffuse", batch, tri0, t0_)
    jax.block_until_ready(sec.tmax)
    R = sec.num_rays
    live = int(jnp.sum(sec.tmax > sec.tmin))
    scale = r.scene_scale
    emit({"stage": "fairy_batch", "nrays": R, "live": live,
          "scene_scale": scale})
    tr = r._tracer
    args = (sec.orig, sec.dirn, sec.tmin, sec.tmax)

    # Control: plain full-length diffuse pass (expect ~8.6 at ml32 SAH).
    m, w1, cs = marginal(chain_tracer(tr, False), args)
    emit({"stage": "fairy_diffuse_control", "mrays": R / 1e6 / m,
          "marginal_ms": m * 1e3, "wall1_ms": w1 * 1e3, "compile_s": cs})

    # End-to-end staged trace per radius: near pass with tmax clamped to
    # tn + r, then a far pass with RESOLVED LANES DEAD-MARKED in place
    # (tx2 = tn). No sort, no compaction: a mostly-dead packet's
    # traversal union shrinks to its few live lanes, the same mechanism
    # that makes seeded_closest_trace's fixup pass cheap. Exact: a near
    # hit IS the global closest (traversal with tmax = t1 is exhaustive
    # within [tn, t1)); unresolved rays retrace their FULL interval, so
    # boundary rounding at t1 is never consulted.
    for frac in (0.02, 0.05, 0.1, 0.2):
        rc = jnp.float32(frac * scale)

        def staged(k, rc=rc):
            @jax.jit
            def run(o, d, tn, tx):
                def body(_, c):
                    acc, tn2 = c
                    t1 = jnp.minimum(tx, tn2 + rc)
                    tri1, st1, *_ = tr(o, d, tn2, t1, False)
                    resolved = (tri1 >= 0) | (t1 >= tx)
                    tx2 = jnp.where(resolved, tn2, tx)
                    tri2, st2, *_ = tr(o, d, tn2, tx2, False)
                    st = jnp.where(resolved, st1, st2)
                    acc = acc + jnp.where(st < 3e37, st, 0.0).sum()
                    return acc, tn + 1e-12 * acc
                acc, _ = jax.lax.fori_loop(0, k, body,
                                           (jnp.float32(0), tn))
                return acc
            return run

        m, w1, cs = marginal(staged, args)
        t1 = jnp.minimum(sec.tmax, sec.tmin + rc)
        stri, *_ = tr(sec.orig, sec.dirn, sec.tmin, t1, False)
        resolved = (stri >= 0) | (t1 >= sec.tmax)
        emit({"stage": f"fairy_staged_{frac}", "mrays": R / 1e6 / m,
              "marginal_ms": m * 1e3,
              "resolve_frac": float(resolved.mean()),
              "unresolved": int(R - jnp.sum(resolved)),
              "compile_s": cs})

    # Three-stage variant at the probe-best radius pair (r, 4r): the
    # mid pass re-covers [tn, 4r) for near-unresolved lanes only.
    rc1, rc2 = jnp.float32(0.05 * scale), jnp.float32(0.2 * scale)

    def staged3(k):
        @jax.jit
        def run(o, d, tn, tx):
            def body(_, c):
                acc, tn2 = c
                t1 = jnp.minimum(tx, tn2 + rc1)
                tri1, st1, *_ = tr(o, d, tn2, t1, False)
                res1 = (tri1 >= 0) | (t1 >= tx)
                t2 = jnp.minimum(tx, tn2 + rc2)
                tri2, st2, *_ = tr(o, d, tn2,
                                   jnp.where(res1, tn2, t2), False)
                res2 = res1 | (tri2 >= 0) | (t2 >= tx)
                tri3, st3, *_ = tr(o, d, tn2,
                                   jnp.where(res2, tn2, tx), False)
                st = jnp.where(res1, st1, jnp.where(res2, st2, st3))
                acc = acc + jnp.where(st < 3e37, st, 0.0).sum()
                return acc, tn + 1e-12 * acc
            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0), tn))
            return acc
        return run

    m, w1, cs = marginal(staged3, args)
    emit({"stage": "fairy_staged3_0.05_0.2", "mrays": R / 1e6 / m,
          "marginal_ms": m * 1e3, "compile_s": cs})

    # Exactness gate: staged result must be BIT-IDENTICAL to the plain
    # trace (device vs device -- same kernel, same arithmetic).
    rc = jnp.float32(0.05 * scale)
    t1 = jnp.minimum(sec.tmax, sec.tmin + rc)
    tri1, st1, su1, sv1 = tr(sec.orig, sec.dirn, sec.tmin, t1, False)
    resolved = (tri1 >= 0) | (t1 >= sec.tmax)
    tx2 = jnp.where(resolved, sec.tmin, sec.tmax)
    tri2, st2, su2, sv2 = tr(sec.orig, sec.dirn, sec.tmin, tx2, False)
    g = [jnp.where(resolved, a, b)
         for a, b in ((tri1, tri2), (st1, st2), (su1, su2), (sv1, sv2))]
    p = tr(sec.orig, sec.dirn, sec.tmin, sec.tmax, False)
    # Miss t conventions may differ between dead-marked (t = tn) and
    # plain (t = tx) lanes; compare hits on tri ids + hit-lane t bits.
    mism = int(jnp.sum(g[0] != p[0]))
    hit = p[0] >= 0
    tmism = int(jnp.sum(hit & (g[1] != p[1])))
    emit({"stage": "fairy_staged_exact", "tri_mism": mism,
          "t_mism_on_hits": tmism, "nrays": R})


if __name__ == "__main__":
    main()
