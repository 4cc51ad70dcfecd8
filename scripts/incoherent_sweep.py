#!/usr/bin/env python
"""Packet-size sweep for incoherent modes (fairy diffuse/AO)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntrace_tpu.core import BuildConfig, RenderConfig
from ntrace_tpu.render.renderer import Renderer, build_accel
from ntrace_tpu.scenes import default_camera, get_scene

scene = get_scene(os.environ.get("SCENE", "fairy"), n_tris=170_000)
builder = os.environ.get("BUILDER", "hlbvh")
bcfg = BuildConfig(builder=builder, max_leaf_size=32)
flat = build_accel(scene, bcfg, use_cache=True)
cam = default_camera(scene.name)
ROWS = tuple(int(r) for r in os.environ.get("ROWS", "16,8,4,2").split(","))
MODES = tuple(os.environ.get("MODES", "diffuse,ao").split(","))
ENGINE = os.environ.get("ENGINE", "packet")
COMPACT = os.environ.get("COMPACT", "auto")  # between-pass live-ray compaction
MERGE = os.environ.get("MERGE", "0") == "1"  # bdl sibling-run merge
QGROUP = int(os.environ.get("QGROUP", "1"))  # bdl grouped run queues
for rows in ROWS:
    r = Renderer(scene, bcfg,
                 RenderConfig(width=1024, height=768, samples=4,
                              engine=ENGINE, packet_rows=rows,
                              compact_rays=COMPACT, merge_sibs=MERGE,
                              qgroup=QGROUP),
                 flat=flat)
    for mode in MODES:
        best = {}
        for i in range(2):
            res = r.render(cam, mode=mode)
            for k, v in res.stats.items():
                if k.startswith("mrays"):
                    best[k] = max(best.get(k, 0), v)
        print(f"rows={rows:2d} {mode:8s}: "
              + " ".join(f"{k}={v:.2f}" for k, v in sorted(best.items())),
              flush=True)
