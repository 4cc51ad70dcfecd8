"""Round-5 session 3: fairy incoherent-mode levers (VERDICT r4 #3).

fairy diffuse has been ~5.8 Mrays/s across two healthy-tunnel rounds
(r2/r3 matrices) -- the worst capability/perf ratio in the repo. Levers
priced here, chained-marginal (the matrix protocol), hlbvh ml32:

  * packet rows {8, 16, 32}: the shared-stack packet walks the UNION of
    its rays' node sets; incoherent rays may prefer different packet
    sizes than the coherent roofline's rows=16.
  * subset-seeded tmax (render/renderer.py subset_seeded_trace), the
    exact per-ray upper-bound seed: prunes from step one. Seed pass runs
    inside the chain (honest marginal). seed_subset {16, 64}.
  * tree quality: binned_sah vs hlbvh for the same rays.
  * ao rows {8, 16} as a control (short rays, any-hit).

Appends JSONL to results_r5_session3.json. nohup, no shell timeout
(TPU tunnel rules).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Persistent executable cache: axon remote compiles cost 10-120 s each
# over the tunnel; re-runs of identical HLO should not pay twice.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")

import jax
import jax.numpy as jnp

from ntrace_tpu.core import BuildConfig, RenderConfig
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.render import renderer as rmod
from ntrace_tpu.scenes import default_camera, get_scene

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_r5_session3.json")
W, H = 1024, 768
K = 4


def emit(rec):
    rec = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def marginal(make_run, nrays, args):
    walls = {}
    cs = 0.0
    for k in (1, K):
        run = make_run(k)
        t0 = time.time()
        jax.block_until_ready(run(*args))
        cs += time.time() - t0
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(run(*args))
            best = min(best, time.time() - t0)
        walls[k] = best
    marg = (walls[K] - walls[1]) / (K - 1)
    return nrays / 1e6 / marg, marg * 1e3, walls[1] * 1e3, cs


def main():
    print(f"[r5s3] devices={jax.devices()}", file=sys.stderr)
    scene = get_scene("fairy", n_tris=170_000)
    cam = default_camera("fairy")
    flats = {}
    for builder in ("hlbvh", "binned_sah"):
        bcfg = BuildConfig(builder=builder, max_leaf_size=32,
                           sah_tri_cost=0.02)
        flats[builder] = (bcfg, rmod.build_accel(scene, bcfg,
                                                 use_cache=True))
    ca = raygen.camera_arrays(cam, W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))

    grid = [
        # (mode, builder, rows, seed_secondary, seed_subset)
        ("diffuse", "hlbvh", 16, "off", 16),
        ("diffuse", "hlbvh", 16, "on", 16),
        ("diffuse", "hlbvh", 16, "on", 64),
        ("diffuse", "hlbvh", 8, "off", 16),
        ("diffuse", "hlbvh", 8, "on", 16),
        ("diffuse", "hlbvh", 32, "off", 16),
        ("diffuse", "hlbvh", 32, "on", 16),
        ("diffuse", "binned_sah", 16, "off", 16),
        ("diffuse", "binned_sah", 16, "on", 16),
        ("ao", "hlbvh", 16, "off", 16),
        ("ao", "hlbvh", 8, "off", 16),
    ]
    for mode, builder, rows, seed, sub in grid:
        tag = f"{mode}_{builder}_r{rows}_seed{seed}{sub if seed=='on' else ''}"
        try:
            rmod._load_tuned = lambda rows=rows: {
                "engine": "packet", "packet_rows": rows, "slabbc": True}
            bcfg, flat = flats[builder]
            r = rmod.Renderer(scene, bcfg, RenderConfig(
                width=W, height=H, mode=mode, samples=4, engine="auto",
                packet_rows=rows, seed_secondary=seed, seed_subset=sub),
                flat=flat)
            tri0, t0_, u0, v0 = r.trace_primary(
                batch.orig, batch.dirn, batch.tmin, batch.tmax, cam=ca)
            jax.block_until_ready(t0_)
            sec, any_hit = r.gen_secondary(cam, mode, batch, tri0, t0_)
            jax.block_until_ready(sec.tmax)
            tr = r._secondary_tracer(long_rays=(mode == "diffuse"))

            def chained(k):
                @jax.jit
                def run(o, d, tn, tx):
                    acc = jnp.float32(0)
                    tn2 = tn
                    for _ in range(k):
                        stri, st, su, sv = tr(o, d, tn2, tx, any_hit)
                        acc = acc + jnp.where(st < 3e37, st, 0.0).sum()
                        tn2 = tn + 1e-12 * acc
                    return acc
                return run

            m, ms, w1, cs = marginal(
                chained, sec.num_rays,
                (sec.orig, sec.dirn, sec.tmin, sec.tmax))
            emit({"stage": tag, "mode": mode, "builder": builder,
                  "rows": rows, "seed": seed, "seed_subset": sub,
                  "mrays": m, "marginal_ms": ms, "wall1_ms": w1,
                  "compile_s": cs, "nrays": int(sec.num_rays)})
        except Exception as e:
            emit({"stage": tag,
                  "failed": f"{type(e).__name__}: {str(e)[:200]}"})


if __name__ == "__main__":
    main()
