#!/usr/bin/env python
"""Round-3 LBVH ablation on the REAL builder at 1M tris (one process).

Variants of lbvh_device_fast with sections stubbed (results WRONG by
design; prices sections): full, scans (ANSV 2-D scans replaced by
elementwise dummies), bounds (sparse table + selects + gathers skipped),
scatter (the (n,13) woop scatter skipped).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from ntrace_tpu.bvh.lbvh import lbvh_device_fast
from ntrace_tpu.scenes import make_random_soup

soup = make_random_soup(n_tris=1_000_000, seed=2)
tv = jnp.asarray(soup.tri_verts())
tlo, thi = tv.min(axis=1), tv.max(axis=1)
lo, hi = soup.bbox()
res = {}
variants = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "ret_dst", "ret_table", "ret_tabmat", "ret_gather", "ret_bounds", ""]
for ab in variants:
    @jax.jit
    def build_once(shift, _ab=ab):
        out = lbvh_device_fast(tlo + shift, thi + shift, tv,
                               jnp.asarray(lo), jnp.asarray(hi),
                               max_leaf=int(os.environ.get(
                                   "NTRACE_ABLATE_LEAF", "32")),
                               _ablate=_ab)
        return (out["nodes"].sum() + out["tri_index"].sum()
                + out["woop"].sum() * 1e-9)

    jax.block_until_ready(build_once(jnp.float32(0.0)))
    best = 1e30
    for i in range(5):
        t0 = time.time()
        jax.block_until_ready(build_once(jnp.float32(i * 1e-7)))
        best = min(best, time.time() - t0)
    res[ab or "full"] = round(best * 1e3, 1)
    print(f"[ablate] {ab or 'full'}: {best*1e3:.1f} ms", flush=True)
path = os.environ.get("NTRACE_ABLATE_OUT", "results_lbvh_ablate_r3.json")
if os.path.exists(path):
    with open(path) as f:
        prev = json.load(f)
    prev.update(res)
    res = prev
with open(path, "w") as f:
    json.dump(res, f, indent=2)
print("ABLATE DONE", flush=True)
