#!/usr/bin/env python
"""On-device LBVH build cost decomposition (binding target: <50 ms/Mtri).

Protocol (PERF_NOTES.md metrology): every timing blocks on a SCALAR
derived from the outputs inside the same jit, so the tunnel's slow
device->host array path is never on the clock. Repeats after a warmup
call so compile time is excluded.

Stages timed:
  sort    : morton codes + lax.sort only
  sweep   : full lbvh_device (sort + 30-level trie sweep + bounds + woop)
The difference bounds the sweep's own cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.bvh.lbvh import lbvh_device
from ntrace_tpu.ops.morton import morton_codes_3d
from ntrace_tpu.scenes import get_scene


def timed(fn, *args, reps=2):
    """Slope protocol: marginal cost of one more chained rep inside one jit.

    float() materialization per timing kills async-completion artifacts
    (PERF_NOTES.md round-2 metrology); the K=1 vs K=5 slope kills the
    ~26 ms dispatch floor.
    """
    times = {}
    for k in (1, 5):
        f = jax.jit(lambda *a, _k=k: fn(_k, *a))
        float(f(*args))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[5] - times[1]) / 4.0


def sort_only(k, tri_lo, tri_hi, lo, hi):
    n = tri_lo.shape[0]

    def body(i, acc):
        cent = (tri_lo + tri_hi) * jnp.float32(0.5) + acc * 1e-30
        codes = morton_codes_3d(jnp, cent, lo, hi)
        codes, order = jax.lax.sort(
            (codes, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        return acc + codes.sum().astype(jnp.float32) * 1e-9

    if os.environ.get("NTRACE_PROBE_CHAIN", "fori") == "unroll":
        acc = jnp.float32(0.0)
        for i in range(k):
            acc = body(i, acc)
        return acc
    return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))


def full_build_scalar(k, tri_lo, tri_hi, tv, lo, hi):
    from ntrace_tpu.bvh.lbvh import lbvh_device_fast

    fn = (lbvh_device_fast if os.environ.get("NTRACE_LBVH", "fast") == "fast"
          else lbvh_device)
    ml = int(os.environ.get("NTRACE_PROBE_ML", "8"))
    packed = os.environ.get("NTRACE_LBVH_EMIT", "flat") == "packed"

    def body(i, acc):
        # Consume EVERY output a real consumer needs so XLA cannot
        # dead-code-eliminate the placement passes. (Round-2's 74 ms/Mtri
        # consumed only nodes+count, so the woop pass was DCE'd out of
        # the clock -- metrology bug.)
        if packed:
            out = fn(tri_lo + acc * 1e-30, tri_hi, tv, lo, hi, max_leaf=ml,
                     emit="packed")
            return acc + (out["pnodes"].sum() * 1e-9
                          + out["ptris"].sum() * 1e-9
                          + out["node_count"].astype(jnp.float32))
        out = fn(tri_lo + acc * 1e-30, tri_hi, tv, lo, hi, max_leaf=ml)
        return acc + (out["nodes"].sum() * 1e-9
                      + out["woop"].sum() * 1e-9
                      + out["tri_index"].sum().astype(jnp.float32) * 1e-9
                      + out["node_count"].astype(jnp.float32))

    # Chain protocol knob (round-3 anomaly: a build inside fori_loop costs
    # ~2.3x its standalone cost -- conservative while-loop buffer
    # assignment suspected; r3b_sweep.py section 3 discriminates). The
    # unrolled chain keeps the identical data-dependency structure, so if
    # the anomaly is the loop construct, "unroll" is the honest
    # steady-state per-build marginal (per-frame rebuilds are separate
    # dispatches that XLA may pipeline, like the frame-chain headline).
    if os.environ.get("NTRACE_PROBE_CHAIN", "fori") == "unroll":
        acc = jnp.float32(0.0)
        for i in range(k):
            acc = body(i, acc)
        return acc
    return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))


def main():
    print(f"platform={jax.default_backend()}", file=sys.stderr)
    sizes = tuple(int(s) for s in os.environ.get(
        "NTRACE_PROBE_SIZES", "100000,1000000").split(","))
    for n in sizes:
        scene = get_scene("hairball", n_tris=n)
        tv = scene.tri_verts()
        tlo = jnp.asarray(tv.min(axis=1))
        thi = jnp.asarray(tv.max(axis=1))
        tvd = jnp.asarray(tv)
        lo, hi = scene.bbox()
        lo = jnp.asarray(lo)
        hi = jnp.asarray(hi)
        t_sort = timed(sort_only, tlo, thi, lo, hi)
        t_full = timed(full_build_scalar, tlo, thi, tvd, lo, hi)
        mtri = scene.num_tris / 1e6
        print(f"n={scene.num_tris}: sort {t_sort*1e3:.1f} ms "
              f"({t_sort*1e3/mtri:.1f} ms/Mtri), "
              f"full {t_full*1e3:.1f} ms ({t_full*1e3/mtri:.1f} ms/Mtri)")


if __name__ == "__main__":
    main()
