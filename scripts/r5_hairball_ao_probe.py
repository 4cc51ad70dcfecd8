"""Round-5: hairball AO regression root-cause probe (VERDICT r4 #4).

r2's matrix measured hairball AO at 78.5 Mrays/s with
BuildConfig(builder="lbvh") DEFAULTS (max_leaf 8, tri_cost 1.0). r3's
matrix rewrite switched the config to the fat-leaf profile tuned for
conference-coherent PRIMARY rays (max_leaf 32, tri_cost 0.02) -- and
hairball AO has read 1.4-1.5 ever since, on degraded AND healthy
tunnels (r5 matrix: 1.5). Hypothesis: fat leaves are catastrophic for
short AO rays in maximum-density geometry (every leaf visit tests ~32
tris against the packet union; hairball's depth complexity multiplies
it). This probe A/Bs the leaf profile on the same protocol.
Appends JSONL to results_r5_session3.json. nohup, no shell timeout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")

import jax
import jax.numpy as jnp

from ntrace_tpu.core import BuildConfig, RenderConfig
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.render.renderer import Renderer, build_accel
from ntrace_tpu.scenes import default_camera, get_scene

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_r5_session3.json")
W, H = 1024, 768


def emit(rec):
    rec = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    print(f"[hbao] devices={jax.devices()}", file=sys.stderr)
    scene = get_scene("hairball", n_tris=2_900_000)
    cam = default_camera("hairball")
    ca = raygen.camera_arrays(cam, W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    for tag, bkw in (("default_ml8", {}),
                     ("fat_ml32", dict(max_leaf_size=32,
                                       sah_tri_cost=0.02))):
        try:
            bcfg = BuildConfig(builder="lbvh", **bkw)
            flat = build_accel(scene, bcfg, use_cache=True)
            r = Renderer(scene, bcfg, RenderConfig(
                width=W, height=H, mode="ao", samples=4,
                packet_rows=16, engine="auto"), flat=flat)
            tri0, t0_, u0, v0 = r.trace_primary(
                batch.orig, batch.dirn, batch.tmin, batch.tmax, cam=ca)
            jax.block_until_ready(t0_)
            sec, any_hit = r.gen_secondary(cam, "ao", batch, tri0, t0_)
            jax.block_until_ready(sec.tmax)

            def chained(k):
                @jax.jit
                def run(o, d, tn, tx):
                    acc = jnp.float32(0)
                    tn2 = tn
                    for _ in range(k):
                        stri, st, su, sv = r._tracer(o, d, tn2, tx,
                                                     any_hit)
                        acc = acc + jnp.where(st < 3e37, st, 0.0).sum()
                        tn2 = tn + 1e-12 * acc
                    return acc
                return run

            walls = {}
            cs = 0.0
            for k in (1, 4):
                run = chained(k)
                t0 = time.time()
                jax.block_until_ready(run(sec.orig, sec.dirn, sec.tmin,
                                          sec.tmax))
                cs += time.time() - t0
                best = 1e30
                for _ in range(3):
                    t0 = time.time()
                    jax.block_until_ready(run(sec.orig, sec.dirn,
                                              sec.tmin, sec.tmax))
                    best = min(best, time.time() - t0)
                walls[k] = best
            marg = (walls[4] - walls[1]) / 3
            emit({"stage": f"hairball_ao_{tag}",
                  "mrays": sec.num_rays / 1e6 / marg,
                  "marginal_ms": marg * 1e3, "engine": r.engine,
                  "nodes": int(flat.nodes.shape[0]),
                  "wall1_ms": walls[1] * 1e3, "compile_s": cs})
        except Exception as e:
            emit({"stage": f"hairball_ao_{tag}",
                  "failed": f"{type(e).__name__}: {str(e)[:250]}"})


if __name__ == "__main__":
    main()
