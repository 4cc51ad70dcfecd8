"""Device bisect of the r2->r3 matrix AO regressions (VERDICT r3 #3).

hairball AO fell 78.5 -> 1.42 Mrays/s and fairy AO 54.97 -> 35.47 between
results_matrix_r2.json and results_matrix_r3.json. Differences between the
two runs: (a) r3 added a timed WARM REBUILD whose fresh device tree
replaced the r2 run's cached flat; (b) tuned.json began resolving the
packet engine with slabbc; (c) the forest dispatch became engine-generic.

This script reproduces hairball/fairy AO at HEAD over the knob grid
(flat: cache vs fresh rebuild) x (compact_rays on/off) x (sort on/off),
recording the same render()-wall mrays the matrix records PLUS a
chained-marginal trace-stage number, so we can tell degraded-tunnel
artifacts from real regressions. Appends to results_ao_bisect_r4.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ntrace_tpu.core import BuildConfig, RenderConfig
from ntrace_tpu.render.renderer import Renderer, build_accel
from ntrace_tpu.scenes import default_camera, get_scene

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_ao_bisect_r4.json")


def emit(rec):
    rec = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def run_case(scene, cam, flat, flat_tag, builder, **cfg_kw):
    cfg = RenderConfig(width=1024, height=768, mode="ao", samples=4,
                       packet_rows=16, **cfg_kw)
    r = Renderer(scene, BuildConfig(builder=builder, max_leaf_size=32,
                                    sah_tri_cost=0.02), cfg, flat=flat)
    best = {}
    for _ in range(2):
        res = r.render(cam, mode="ao")
        for k, v in res.stats.items():
            if k.startswith("mrays") or k.startswith("trace"):
                best[k] = max(best.get(k, 0), v) if k.startswith("mrays") \
                    else min(best.get(k, 1e30), v)
    emit({"scene": scene.name, "flat": flat_tag, "engine": r.engine,
          **{k: v for k, v in cfg_kw.items()},
          **{k: round(v, 3) for k, v in best.items()}})


def main():
    for name, n in (("fairy", 170_000), ("hairball", 2_900_000)):
        builder = "hlbvh" if name == "fairy" else "lbvh"
        scene = get_scene(name, n_tris=n)
        cam = default_camera(name)
        bcfg = BuildConfig(builder=builder, max_leaf_size=32,
                           sah_tri_cost=0.02)
        t0 = time.time()
        flat_cache = build_accel(scene, bcfg, use_cache=True)
        emit({"scene": name, "stage": "build_cache",
              "s": time.time() - t0})
        # Baseline grid on the cached tree (r2 conditions).
        run_case(scene, cam, flat_cache, "cache", builder)
        run_case(scene, cam, flat_cache, "cache", builder,
                 compact_rays="off")
        run_case(scene, cam, flat_cache, "cache", builder,
                 sort_secondary=False)
        # Fresh device rebuild (r3 conditions: the warm-rebuild flat).
        t0 = time.time()
        flat_fresh = build_accel(scene, bcfg, use_cache=False)
        emit({"scene": name, "stage": "build_fresh",
              "s": time.time() - t0})
        run_case(scene, cam, flat_fresh, "fresh", builder)


if __name__ == "__main__":
    main()
