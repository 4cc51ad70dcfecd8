#!/usr/bin/env python
"""Headline benchmark: Conference primary-ray Mrays/s on the current device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 150 (the binding >=150 Mrays/s target from
BASELINE.json). Extra per-stage details go to stderr.

Scene provenance: the real Conference OBJ is not available offline, so the
procedural conference stand-in (matching triangle count ~280k and interior
workload character) is used -- see ntrace_tpu/scenes/procedural.py.
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _watchdog(signum, frame):
    # The axon TPU tunnel can wedge indefinitely (PERF_NOTES.md); emit an
    # honest zero record rather than hanging the driver forever.
    print(json.dumps({
        "metric": "conference_primary_mrays",
        "value": 0.0,
        "unit": "Mrays/s",
        "vs_baseline": 0.0,
        "error": "watchdog: device did not respond within time budget",
    }))
    sys.stdout.flush()
    os._exit(2)


def main():
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(int(os.environ.get("NTRACE_BENCH_TIMEOUT", 2400)))
    import jax

    from ntrace_tpu.core import BuildConfig, RenderConfig
    from ntrace_tpu.render.renderer import Renderer, build_accel
    from ntrace_tpu.scenes import default_camera, get_scene

    t0 = time.time()
    n_tris = int(os.environ.get("NTRACE_BENCH_TRIS", 280_000))
    width = int(os.environ.get("NTRACE_BENCH_W", 1024))
    height = int(os.environ.get("NTRACE_BENCH_H", 768))
    engine = os.environ.get("NTRACE_BENCH_ENGINE", "auto")
    builder = os.environ.get("NTRACE_BENCH_BUILDER", "binned_sah")

    print(f"[bench] platform={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)
    scene = get_scene("conference", n_tris=n_tris)
    print(f"[bench] scene={scene.name} tris={scene.num_tris} "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)

    build_cfg = BuildConfig(builder=builder, max_leaf_size=8)
    flat = build_accel(scene, build_cfg, use_cache=True)
    print(f"[bench] accel nodes={flat.nodes.shape[0]} sah={flat.sah_cost:.1f} "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)

    cfg = RenderConfig(width=width, height=height, mode="primary", engine=engine)
    r = Renderer(scene, build_cfg, cfg, flat=flat)
    cam = default_camera("conference")

    passes = []
    for i in range(3):  # pass 0 pays compilation; report steady state
        res = r.render(cam)
        mrays = res.stats.get("mrays_primary", 0.0)
        print(f"[bench] pass {i}: {mrays:.1f} Mrays/s "
              f"stats={ {k: round(v, 2) for k, v in res.stats.items()} }",
              file=sys.stderr)
        passes.append(mrays)
    best = max(passes[1:])  # steady-state passes only

    hit_rate = float((res.hit_tri >= 0).mean())
    print(f"[bench] hit_rate={hit_rate:.3f} total {time.time()-t0:.1f}s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "conference_primary_mrays",
        "value": round(best, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(best / 150.0, 4),
    }))


if __name__ == "__main__":
    main()
