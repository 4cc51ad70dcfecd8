#!/usr/bin/env python
"""Run the five BASELINE.json scene configs end-to-end on the current
device and write results_matrix_r3.json (provenance for the committed
results). Serialize TPU use; run with nohup (PERF_NOTES.md metrology)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from ntrace_tpu.core import BuildConfig, RenderConfig
from ntrace_tpu.render.renderer import Renderer, build_accel
from ntrace_tpu.scenes import default_camera, get_scene

CONFIGS = [
    # (scene, n_tris, builder, bcfg_extra, modes, samples)
    # ~ BASELINE.json configs; engine-tuned SAH profiles (leaf_sweep*.py)
    ("sibenik",    80_000,   "binned_sah",
     dict(sah_tri_cost=0.02, max_leaf_size=48), ["primary"], 4),
    ("conference", 280_000,  "lbvh",
     dict(max_leaf_size=32, sah_tri_cost=0.02), ["primary", "shadow"], 4),
    ("fairy",      170_000,  "hlbvh",
     dict(max_leaf_size=32, sah_tri_cost=0.02), ["diffuse", "ao"], 4),
    ("hairball",   2_900_000,"lbvh",
     dict(max_leaf_size=32, sah_tri_cost=0.02), ["ao"], 4),
    # BASELINE config #5 demands the SBVH offline build (round-3: the
    # builder is now tractable at 10M -- amortized ref growth + reduceat
    # binning; built once and cached).
    ("san_miguel", 10_000_000,"sbvh",
     dict(sah_tri_cost=0.02, max_leaf_size=48), ["path"], 1),
    # kd-tree capability on the round-3 fast path (cell-box packet engine).
    ("conference", 280_000,  "kdtree",
     dict(max_leaf_size=16, sah_tri_cost=0.5), ["primary"], 4),
]
results = []
for name, n, builder, extra, modes, samples in CONFIGS:
    try:
        t0=time.time()
        scene = get_scene(name, n_tris=n)
        print(f"[{name}] gen {time.time()-t0:.0f}s tris={scene.num_tris}", flush=True)
        bcfg = BuildConfig(builder=builder, **extra)
        t0=time.time()
        flat = build_accel(scene, bcfg, use_cache=True)
        bt = time.time()-t0
        if builder in ("lbvh", "hlbvh"):
            # On-device builders: the first call is dominated by the XLA
            # compile (~minutes through the tunnel); the per-frame rebuild
            # number the BASELINE cares about is the WARM build.
            t0 = time.time()
            flat = build_accel(scene, bcfg, use_cache=False)
            bt = time.time()-t0
        print(f"[{name}] {builder} build {bt:.1f}s nodes={flat.nodes.shape[0]} "
              f"{flat.nbytes()/1e6:.0f}MB", flush=True)
        cfg = RenderConfig(width=1024, height=768, mode=modes[0],
                           samples=samples, packet_rows=16)
        r = Renderer(scene, bcfg, cfg, flat=flat)
        cam = default_camera(name)
        for mode in modes:
            best = {}
            for i in range(2):
                res = r.render(cam, mode=mode)
                for k, v in res.stats.items():
                    if k.startswith("mrays"):
                        best[k] = max(best.get(k, 0), v)
            entry = dict(scene=name, tris=scene.num_tris, builder=builder,
                         mode=mode, engine=r.engine, build_s=round(bt,1),
                         build_ms_per_mtri=round(bt * 1e3
                                                 / (scene.num_tris / 1e6), 1),
                         sah_cost=round(float(getattr(flat, "sah_cost", 0.0)
                                              or 0.0), 2),
                         **{k: round(v,4) for k,v in best.items()})
            results.append(entry)
            print(f"[{name}] {mode}: {entry}", flush=True)
        # Per-config image-exactness vs the CPU golden tracer (BASELINE:
        # "image checksum vs the CPU golden tracer"; the round-2 denormal
        # bug proved device-only corruption is real). Deterministic stride
        # subsample of the primary rays through the engine actually used.
        try:
            import jax.numpy as jnp
            import numpy as np

            from ntrace_tpu.ray import pixel_table, raygen
            from ntrace_tpu.trace.cpu import trace_cpu_golden

            gflat = r.flat if r.flat is not None else flat
            order_px, _ = pixel_table(1024, 768)
            batch = raygen.primary(raygen.camera_arrays(cam, 1024, 768),
                                   1024, 768, jnp.asarray(order_px))
            sub = np.arange(0, batch.num_rays,
                            max(batch.num_rays // 2048, 1))
            o = np.asarray(batch.orig)[sub]
            d = np.asarray(batch.dirn)[sub]
            tn = np.asarray(batch.tmin)[sub]
            tx = np.asarray(batch.tmax)[sub]
            dev = r._tracer(
                jnp.asarray(o), jnp.asarray(d), jnp.asarray(tn),
                jnp.asarray(tx), False)
            tri_dev = np.asarray(dev[0])
            t_dev = np.asarray(dev[1])
            rec = trace_cpu_golden(gflat, o, d, tn, tx)
            # Exact-t ties between coincident triangles may break by
            # chunk order on the forest path vs smallest-id on the
            # global golden tree: different tri at BIT-IDENTICAL t is a
            # tie, not a corruption.
            mism = int(((tri_dev != rec.tri) & (t_dev != rec.t)).sum())
            results.append(dict(scene=name, builder=builder,
                                golden_sampled=int(len(sub)),
                                golden_mismatches=mism,
                                golden_match=mism == 0))
            print(f"[{name}] golden: {mism}/{len(sub)} mismatches",
                  flush=True)
        except Exception as e:  # golden gate must not kill the matrix
            results.append(dict(scene=name, builder=builder,
                                golden_error=str(e)[:200]))
            print(f"[{name}] golden FAILED: {str(e)[:200]}", flush=True)
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        results.append(dict(scene=name, error=str(e)[:200]))
with open('results_matrix_r3.json','w') as f:
    json.dump(results, f, indent=2)
print("MATRIX DONE", flush=True)
