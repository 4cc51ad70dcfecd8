"""Round-5: san_miguel matrix-row failure diagnosis (HTTP 413).

The r5 matrix's san_miguel row died with `remote_compile: HTTP 413:
request body length limit exceeded` even after the fori_loop chaining
fix (cb14db0). Lowering is LOCAL under the axon tunnel -- only the
serialized module POSTs to the terminal -- so this probe reproduces the
row's exact chained program and measures every serialized form locally,
without touching /remote_compile. Appends JSONL to
results_r5_session4.json.
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


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def sizes(lowered, tag):
    rec = {"stage": f"sm_lower_{tag}"}
    try:
        shlo = lowered.compiler_ir("stablehlo")
        import io

        buf = io.BytesIO()
        shlo.operation.write_bytecode(buf)
        rec["stablehlo_bytecode_mb"] = round(buf.tell() / 1e6, 2)
    except Exception as e:
        rec["stablehlo_err"] = str(e)[:160]
    try:
        hlo = lowered.compiler_ir("hlo").as_serialized_hlo_module_proto()
        rec["hlo_proto_mb"] = round(len(hlo) / 1e6, 2)
    except Exception as e:
        rec["hlo_err"] = str(e)[:160]
    return rec


def main():
    t0 = time.time()
    scene = get_scene("san_miguel", n_tris=10_000_000)
    emit({"stage": "sm_scene", "tris": scene.num_tris,
          "gen_s": round(time.time() - t0, 1)})
    bcfg = BuildConfig(builder="sbvh", sah_tri_cost=0.02, max_leaf_size=48)
    t0 = time.time()
    flat = build_accel(scene, bcfg, use_cache=True)
    emit({"stage": "sm_build", "build_s": round(time.time() - t0, 1),
          "nodes": int(flat.nodes.shape[0])})
    cfg = RenderConfig(width=W, height=H, mode="path", samples=1,
                       packet_rows=16)
    t0 = time.time()
    r = Renderer(scene, bcfg, cfg, flat=flat)
    emit({"stage": "sm_renderer", "engine": r.engine,
          "chunks": len(getattr(r, "forest", []) or []),
          "init_s": round(time.time() - t0, 1)})

    cam = default_camera("san_miguel")
    ca = raygen.camera_arrays(cam, W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))

    def chained_primary(k):
        @jax.jit
        def run(o, d, tn, tx):
            def body(_, c):
                acc, tn2 = c
                tri, t, u, v = r.trace_primary(o, d, tn2, tx, cam=ca,
                                               canonical=True)
                acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                return acc, tn + 1e-12 * acc
            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0), tn))
            return acc
        return run

    args = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                 for a in (batch.orig, batch.dirn, batch.tmin, batch.tmax))
    for k in (1, 4):
        t0 = time.time()
        low = chained_primary(k).lower(*args)
        rec = sizes(low, f"primary_k{k}")
        rec["lower_s"] = round(time.time() - t0, 1)
        emit(rec)

    # Per-chunk single-pass size for comparison (one pallas kernel).
    c = r.forest[0]
    one = jax.jit(lambda o, d, tn, tx: r._tracer(o, d, tn, tx, False))
    t0 = time.time()
    low = one.lower(*args)
    rec = sizes(low, "tracer_once")
    rec["lower_s"] = round(time.time() - t0, 1)
    emit(rec)


if __name__ == "__main__":
    main()
