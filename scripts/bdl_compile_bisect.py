#!/usr/bin/env python
"""Compile-bisect packet_bfs / packet_bdl on the device.

Both kernels crash the TPU backend compiler (opaque tpu_compile_helper
exit 1) even after the rep_rows broadcast fix, while packet_dleaf and
packet_pallas compile. Each probe variant knocks out one kernel section
(WRONG results, compile-only); whichever knockouts compile localize the
lethal construct. Uses .lower().compile() -- no execution, so variants
with broken control flow cannot hang.

Usage (needs the device): python scripts/bdl_compile_bisect.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.bvh.packed import pack_bvh
from ntrace_tpu.core import BuildConfig
from ntrace_tpu.render.renderer import build_accel
from ntrace_tpu.scenes import make_random_soup
from ntrace_tpu.trace.packet_bdl import trace_packet_bdl
from ntrace_tpu.trace.packet_bfs import trace_packet_bfs
from ntrace_tpu.trace.packet_dleaf import trace_packet_dleaf

RESULTS = {}
OUT = "results_compile_bisect.json"

soup = make_random_soup(n_tris=2000, seed=3)
flat = build_accel(soup, BuildConfig(builder="binned_sah", max_leaf_size=48))
pk = pack_bvh(flat, soup.tri_verts(), tris_per_row=12, nodes_per_row=1)
nodes = jnp.asarray(pk.nodes8)
tris = jnp.asarray(pk.tris12)
n = 2048
rng = np.random.default_rng(0)
orig = jnp.asarray(rng.uniform(-5, 5, (n, 3)).astype(np.float32))
dirn = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
tmin = jnp.zeros((n,), jnp.float32)
tmax = jnp.full((n,), 1e30, jnp.float32)
args = (nodes, tris, orig, dirn, tmin, tmax)


def try_compile(key, fn, **kw):
    t0 = time.time()
    try:
        fn.lower(*args, **kw).compile()
        RESULTS[key] = f"OK {time.time() - t0:.1f}s"
    except Exception as e:  # noqa: BLE001 — recording compile crashes
        RESULTS[key] = f"FAIL {type(e).__name__}: {e}"[:160]
    print(f"[cbisect] {key}: {RESULTS[key][:120]}", flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


print(f"[cbisect] devices={jax.devices()}", flush=True)
try_compile("dleaf_control", trace_packet_dleaf, rows=16)
for probe in ("none", "noslab", "novrd", "noenq", "nodrn"):
    try_compile(f"bdl_{probe}", trace_packet_bdl, rows=16, probe=probe)
for probe in ("none", "noslab", "novrd", "noleafq"):
    try_compile(f"bfs_{probe}", trace_packet_bfs, rows=16, probe=probe)
# roll-tree verdict variant (skips the 4 packed sum-reduces)
try_compile("bfs_none_vroll", trace_packet_bfs, rows=16, verdict="roll")
print("[cbisect] DONE", flush=True)
