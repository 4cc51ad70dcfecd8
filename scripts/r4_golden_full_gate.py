"""Full-frame device golden gate for the tuned primary engine
(VERDICT r3 #8: trace ALL 786k primary rays on device and compare
against the CPU golden, tie-aware).

Runs the RENDERER's tuned auto path end-to-end (prepare_primary +
trace_primary, exactly what bench.py times), compares every ray's hit id
against trace_cpu_golden with the committed shared-edge ulp-tie policy
(trace/cpu.py golden_mismatches), and appends a `golden_full_tieaware`
record to results_r4_dense5.json. Raw id diffs are reported alongside so
the tie count stays visible.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_r4_dense5.json")
W, H = 1024, 768


def main():
    from ntrace_tpu.core import BuildConfig, RenderConfig
    from ntrace_tpu.ray import pixel_table, raygen
    from ntrace_tpu.render.renderer import Renderer, build_accel
    from ntrace_tpu.scenes import default_camera, get_scene
    from ntrace_tpu.trace.cpu import golden_mismatches, trace_cpu_golden

    t0 = time.time()
    scene = get_scene("conference", n_tris=280_000)
    build_cfg = BuildConfig(builder="binned_sah", sah_tri_cost=0.02,
                            max_leaf_size=48)
    flat = build_accel(scene, build_cfg, use_cache=True)
    cfg = RenderConfig(width=W, height=H, mode="primary", engine="auto")
    r = Renderer(scene, build_cfg, cfg, flat=flat)
    ca = raygen.camera_arrays(default_camera("conference"), W, H)
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    armed = r.prepare_primary(ca, W, H)
    print(f"[gate] primary_engine={r.primary_engine if armed else r.engine} "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)
    # ADVICE r4: this gate exists to validate the ARMED screen-space
    # engine (VERDICT r3 #8); golden-gating the BVH fallback would
    # record a match:true that reads as the dense engine passing.
    if not armed or not str(r.primary_engine).startswith("binraster"):
        print(f"[gate] FAIL: dense engine did not arm "
              f"(armed={armed}, primary_engine={r.primary_engine}); "
              f"refusing to gate the fallback path", file=sys.stderr)
        sys.exit(3)

    tri, t, u, v = (np.asarray(x) for x in jax.block_until_ready(
        r.trace_primary(batch.orig, batch.dirn, batch.tmin, batch.tmax,
                        cam=ca)))
    print(f"[gate] device trace done ({time.time()-t0:.1f}s)",
          file=sys.stderr)
    rec = trace_cpu_golden(
        flat, np.asarray(batch.orig), np.asarray(batch.dirn),
        np.asarray(batch.tmin), np.asarray(batch.tmax))
    raw = int((tri != rec.tri).sum())
    real = golden_mismatches(tri, t, rec.tri, rec.t)
    out = {"stage": "golden_full_tieaware",
           "cfg": "renderer_auto_tuned",
           "engine": r.primary_engine if armed else r.engine,
           "rays": int(batch.num_rays), "raw_id_diffs": raw,
           "ulp_ties": raw - real, "mismatches": real,
           "match": real == 0, "secs": round(time.time() - t0, 1)}
    with open(OUT, "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
