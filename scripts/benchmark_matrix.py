#!/usr/bin/env python
"""Run the five BASELINE.json scene configs end-to-end on the current
device and write results_matrix_r1.json (provenance for the committed
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
    # (scene, n_tris, builder, modes, samples)  ~ BASELINE.json configs
    ("sibenik",    80_000,   "binned_sah", ["primary"], 4),
    ("conference", 280_000,  "lbvh",       ["primary", "shadow"], 4),
    ("fairy",      170_000,  "hlbvh",      ["diffuse", "ao"], 4),
    ("hairball",   2_900_000,"lbvh",       ["ao"], 4),
    ("san_miguel", 10_000_000,"binned_sah",["path"], 1),
]
results = []
for name, n, builder, modes, samples in CONFIGS:
    try:
        t0=time.time()
        scene = get_scene(name, n_tris=n)
        print(f"[{name}] gen {time.time()-t0:.0f}s tris={scene.num_tris}", flush=True)
        t0=time.time()
        flat = build_accel(scene, BuildConfig(builder=builder), use_cache=True)
        bt = time.time()-t0
        print(f"[{name}] {builder} build {bt:.0f}s nodes={flat.nodes.shape[0]} "
              f"{flat.nbytes()/1e6:.0f}MB", flush=True)
        cfg = RenderConfig(width=1024, height=768, mode=modes[0], samples=samples)
        r = Renderer(scene, BuildConfig(builder=builder), cfg, flat=flat)
        cam = default_camera(name)
        for mode in modes:
            best = {}
            for i in range(2):
                res = r.render(cam, mode=mode)
                for k, v in res.stats.items():
                    if k.startswith("mrays"):
                        best[k] = max(best.get(k, 0), v)
            entry = dict(scene=name, tris=scene.num_tris, builder=builder,
                         mode=mode, build_s=round(bt,1), **{k: round(v,4) for k,v in best.items()})
            results.append(entry)
            print(f"[{name}] {mode}: {entry}", flush=True)
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        results.append(dict(scene=name, error=str(e)[:200]))
with open('results_matrix_r1.json','w') as f:
    json.dump(results, f, indent=2)
print("MATRIX DONE", flush=True)
