"""Round-5: hairball AO engine A/B (VERDICT r4 #4, continued).

The leaf-profile probe DISPROVED the fat-leaf hypothesis (default ml8 =
0.97 Mrays/s, fat ml32 = 1.5 -- both catastrophic). Remaining suspect:
the engine class itself. Hairball AO rays are hemisphere rays from
surface points inside maximum-density geometry; a packet kernel's
shared-stack traversal walks the UNION of 2048 rays' frustums per
packet, which in hair-ball density approaches the whole tree per packet
(the classic packet-vs-per-ray lesson the reference's per-ray kernels
taught on incoherent rays, SURVEY.md SS3.3). r2 measured 78.5 before
the r3 kernel-family rework. This probe A/Bs today's PER-RAY engines
(stack2 unified-table one-dispatch; bvh8 8-wide) against the packet
forest on the identical AO batch, plus a packet rows ablation (smaller
shared unions). Appends JSONL to results_r5_session4.json.
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
    rec = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def marginal(tracer, sec, any_hit, tables, ks=(1, K)):
    def chain(k):
        @jax.jit
        def run(o, d, tn, tx, tables):
            def body(_, c):
                acc, tn2 = c
                stri, st, su, sv = tracer(o, d, tn2, tx, any_hit,
                                          tables=tables)
                acc = acc + jnp.where(st < 3e37, st, 0.0).sum()
                return acc, tn + 1e-12 * acc
            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0), tn))
            return acc
        return run

    walls, cs = {}, 0.0
    args = (sec.orig, sec.dirn, sec.tmin, sec.tmax, tables)
    for k in ks:
        run = chain(k)
        t0 = time.time()
        jax.block_until_ready(run(*args))
        cs += time.time() - t0
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(run(*args))
            best = min(best, time.time() - t0)
        walls[k] = best
    marg = (walls[ks[1]] - walls[ks[0]]) / (ks[1] - ks[0])
    return marg, walls[ks[0]], cs


def main():
    print(f"[hbe] devices={jax.devices()}", file=sys.stderr)
    scene = get_scene("hairball", n_tris=2_900_000)
    cam = default_camera("hairball")
    ca = raygen.camera_arrays(cam, W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    bcfg = BuildConfig(builder="lbvh", max_leaf_size=32, sah_tri_cost=0.02)
    flat = build_accel(scene, bcfg, use_cache=True)

    # Shared primary hits + AO batch, from the packet-forest renderer
    # (identical across engine configs; exactness is engine-invariant).
    base = Renderer(scene, bcfg, RenderConfig(
        width=W, height=H, mode="ao", samples=4, packet_rows=16,
        engine="auto"), flat=flat)
    tri0, t0_, *_ = base.trace_primary(
        batch.orig, batch.dirn, batch.tmin, batch.tmax, cam=ca)
    jax.block_until_ready(t0_)
    sec, any_hit = base.gen_secondary(cam, "ao", batch, tri0, t0_)
    jax.block_until_ready(sec.tmax)
    live = int(jnp.sum(sec.tmax > sec.tmin))
    emit({"stage": "hb_ao_batch", "nrays": sec.num_rays, "live": live,
          "hit_rate": float((np.asarray(tri0) >= 0).mean()),
          "scene_scale": base.scene_scale})

    # CPU golden on a stride sample, for the exactness check below.
    from ntrace_tpu.trace.cpu import golden_mismatches, trace_cpu_golden

    sub = np.arange(0, sec.num_rays, max(sec.num_rays // 2048, 1))
    rec = trace_cpu_golden(
        flat, np.asarray(sec.orig)[sub], np.asarray(sec.dirn)[sub],
        np.asarray(sec.tmin)[sub], np.asarray(sec.tmax)[sub],
        any_hit=True)

    def run_cfg(tag, engine, rows=16):
        try:
            r = (base if engine == "auto" and rows == 16 else Renderer(
                scene, bcfg, RenderConfig(
                    width=W, height=H, mode="ao", samples=4,
                    packet_rows=rows, engine=engine), flat=flat))
            tr = r._tracer
            m, w1, cs = marginal(tr, sec, any_hit, r.device_tables())
            stri, st, *_ = tr(sec.orig, sec.dirn, sec.tmin, sec.tmax,
                              any_hit)
            jax.block_until_ready(st)
            # Any-hit golden: agreement on hit/no-hit (SURVEY SS5).
            dev = np.asarray(stri)[sub]
            mism = int(((dev >= 0) != (rec.tri >= 0)).sum())
            emit({"stage": f"hb_ao_{tag}", "engine": r.engine,
                  "mrays": sec.num_rays / 1e6 / m,
                  "mrays_live": live / 1e6 / m,
                  "marginal_ms": m * 1e3, "wall1_ms": w1 * 1e3,
                  "compile_s": cs, "anyhit_mism": mism,
                  "golden_n": len(sub)})
        except Exception as e:
            emit({"stage": f"hb_ao_{tag}",
                  "failed": f"{type(e).__name__}: {str(e)[:250]}"})

    # One config per process (NTRACE_HB_CFG): a device/tunnel fault in
    # one config must not poison the rest (first run lost all three).
    cfg = os.environ.get("NTRACE_HB_CFG", "stack2")
    if cfg == "stack2":
        run_cfg("stack2", "stack2")   # unified-table per-ray engine
    elif cfg == "bvh8":
        run_cfg("bvh8", "bvh8")       # 8-wide per-ray engine
    elif cfg == "r1":
        # rows=1 x interleave=8: eight INDEPENDENT 128-ray packets per
        # block -- the union a packet walks shrinks 16x vs rows=16.
        run_cfg("packet_r1", "packet", rows=1)
    elif cfg == "r4":
        run_cfg("packet_r4", "packet", rows=4)
    else:
        run_cfg("forest_control", "auto")   # known ~1.5; rigor re-measure


if __name__ == "__main__":
    main()
