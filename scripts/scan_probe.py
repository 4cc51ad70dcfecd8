#!/usr/bin/env python
"""Primitive-cost probe: 1-D scans vs blocked 2-D scans, gathers, scatters.

Slope protocol (PERF_NOTES.md): K chained reps inside one jit, cost =
(T_K - T_1) / (K - 1), float() materialization per timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope(make_body, reps=2, k_hi=9):
    times = {}
    for k in (1, k_hi):
        f = jax.jit(lambda x, _k=k: jax.lax.fori_loop(
            0, _k, make_body, x * 1.0 if x.dtype.kind == "f" else x))
        float(jnp.sum(f(X).astype(jnp.float32)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(f(X).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[k_hi] - times[1]) / (k_hi - 1)


def blocked_cumsum(x):
    """Prefix sum via lane-dim scans (vectorized across sublanes)."""
    n = x.shape[0]
    k = 128
    b = -(-n // k)
    pad = b * k - n
    xp = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]) if pad else x
    m = xp.reshape(b, k)
    # 7 shifted adds along lanes:
    for s in (1, 2, 4, 8, 16, 32, 64):
        m = m + jnp.pad(m, ((0, 0), (s, 0)))[:, :k]
    row_tot = m[:, -1]
    # scan row totals (recursively small):
    if b > 256:
        off = blocked_cumsum(row_tot)
    else:
        off = jnp.cumsum(row_tot)
    off = jnp.concatenate([jnp.zeros((1,), x.dtype), off[:-1]])
    return (m + off[:, None]).reshape(-1)[:n]


def main():
    global X
    for n in (100_000, 1_000_000):
        X = jnp.arange(n, dtype=jnp.int32) % 7
        Xf = X.astype(jnp.float32)

        def body_cumsum(i, x):
            return jnp.cumsum(x + i) % 1000

        def body_cummin_rev(i, x):
            return jax.lax.cummin(x + i, axis=0, reverse=True) % 1000

        def body_blocked(i, x):
            return blocked_cumsum(x + i) % 1000

        def body_gather(i, x):
            idx = (x + i) % n
            return x[idx] + 1

        def body_scatter(i, x):
            idx = jnp.arange(n, dtype=jnp.int32)
            return x.at[(idx * 2 + i) % n].set(x, mode="drop",
                                               unique_indices=True)

        def body_sort(i, x):
            return jax.lax.sort(x + i)

        def body_elem(i, x):
            return x * 3 + i

        for name, body in [("elemwise", body_elem),
                           ("cumsum1d", body_cumsum),
                           ("cummin1d_rev", body_cummin_rev),
                           ("blocked_cumsum", body_blocked),
                           ("gather", body_gather),
                           ("scatter_uniq", body_scatter),
                           ("sort", body_sort)]:
            t = slope(body)
            print(f"n={n}: {name:16s} {t*1e6:9.1f} us/pass", flush=True)


if __name__ == "__main__":
    main()
