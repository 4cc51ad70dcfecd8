#!/usr/bin/env python
"""Warm the accel cache for a scene's forest chunks on CPU.

Host-side binned-SAH builds are CPU work; running them under
JAX_PLATFORMS=cpu leaves the TPU tunnel free and the content-hash cache
makes the later TPU benchmark run load instantly.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from ntrace_tpu.bvh.forest import morton_partition, sub_scene
from ntrace_tpu.core import BuildConfig
from ntrace_tpu.render.renderer import VMEM_BUDGET, build_accel
from ntrace_tpu.scenes import get_scene

name = sys.argv[1] if len(sys.argv) > 1 else "san_miguel"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
builder = sys.argv[3] if len(sys.argv) > 3 else "binned_sah"
leaf = int(os.environ.get("LEAF", 48))
tc = float(os.environ.get("TRI_COST", 0.02))

t0 = time.time()
scene = get_scene(name, n_tris=n)
print(f"[{name}] gen {time.time()-t0:.0f}s tris={scene.num_tris}", flush=True)
cfg = BuildConfig(builder=builder, max_leaf_size=leaf, sah_tri_cost=tc)
# PER_REF=64 matches the base packet forest chunking; 160 the batch-kernel
# (nodes_per_row=1) chunking -- warm both if tuned.json may pick either.
per_ref = int(os.environ.get("PER_REF", 64))
chunks = morton_partition(scene, max_refs=max(VMEM_BUDGET // per_ref, 1))
print(f"[{name}] {len(chunks)} chunks", flush=True)
for ci, ids in enumerate(chunks):
    t0 = time.time()
    sub = sub_scene(scene, ids, ci)
    fl = build_accel(sub, cfg, use_cache=True)
    print(f"[{name}] chunk {ci}: {len(ids)} tris, build {time.time()-t0:.0f}s "
          f"nodes={fl.nodes.shape[0]}", flush=True)
print("WARM DONE", flush=True)
