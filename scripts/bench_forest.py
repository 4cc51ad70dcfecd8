#!/usr/bin/env python
"""Targeted large-scene benchmark: hairball AO / san_miguel path via the
Morton-chunked packet forest. Serialize TPU use (nohup, no timeouts)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ntrace_tpu.core import BuildConfig, RenderConfig
from ntrace_tpu.render.renderer import Renderer
from ntrace_tpu.scenes import default_camera, get_scene

name = sys.argv[1] if len(sys.argv) > 1 else "hairball"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_900_000
builder = sys.argv[3] if len(sys.argv) > 3 else "lbvh"
mode = sys.argv[4] if len(sys.argv) > 4 else "ao"
leaf = int(os.environ.get("LEAF", 32))
tc = float(os.environ.get("TRI_COST", 0.02))

t0 = time.time()
scene = get_scene(name, n_tris=n)
print(f"[{name}] gen {time.time()-t0:.0f}s tris={scene.num_tris}", flush=True)
bcfg = BuildConfig(builder=builder, max_leaf_size=leaf, sah_tri_cost=tc)
t0 = time.time()
r = Renderer(scene, bcfg,
             RenderConfig(width=1024, height=768, mode=mode, samples=4,
                          engine="packet", packet_rows=16))
print(f"[{name}] init {time.time()-t0:.0f}s engine={r.engine} "
      f"chunks={len(getattr(r, 'forest', []) or [1])}", flush=True)
cam = default_camera(name)
for i in range(3):
    t0 = time.time()
    res = r.render(cam, mode=mode)
    wall = time.time() - t0
    mr = {k: round(v, 3) for k, v in res.stats.items()
          if k.startswith("mrays")}
    print(f"[{name}] {mode} pass{i}: wall {wall:.1f}s {mr}", flush=True)
