#!/usr/bin/env python
"""Per-part costs of lbvh_device_fast at n=1M (slope protocol)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
LOGN = 20
C = 31


def slope(body, reps=2, k_hi=5):
    times = {}
    for k in (1, k_hi):
        f = jax.jit(lambda seed, _k=k: jax.lax.fori_loop(
            0, _k, lambda i, acc: acc + body(acc), seed))
        float(f(jnp.float32(0.0)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(jnp.float32(0.0)))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[k_hi] - times[1]) / (k_hi - 1)


def main():
    rng = np.random.default_rng(0)
    codes = jnp.asarray(np.sort(rng.integers(0, 1 << 30, N)).astype(np.int32))
    D = jnp.asarray(rng.integers(0, 31, N).astype(np.int32))
    pay = jnp.asarray(rng.random((N, 15)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
    iota = jnp.arange(N, dtype=jnp.int32)
    tab6 = jnp.asarray(rng.random((N, 6)).astype(np.float32))
    w13 = jnp.asarray(rng.random((N, 13)).astype(np.float32))

    def p_sort2(acc):
        c, o = jax.lax.sort((codes + acc.astype(jnp.int32), iota),
                            num_keys=2)
        return c.sum().astype(jnp.float32) * 1e-9 + o[0].astype(jnp.float32) * 0

    def p_sort17(acc):
        ops = (codes + acc.astype(jnp.int32), iota) + tuple(
            pay[:, j] for j in range(15))
        out = jax.lax.sort(ops, num_keys=2)
        return (out[0].sum().astype(jnp.float32) * 1e-9
                + out[5].sum() * 1e-12)

    def p_gather15(acc):
        g = pay[(idx + acc.astype(jnp.int32)) % N]
        return g.sum() * 1e-9

    def p_gather1(acc):
        g = D[(idx + acc.astype(jnp.int32)) % N]
        return g.sum().astype(jnp.float32) * 1e-9

    def p_ansv(acc):
        Dv = (D + acc.astype(jnp.int32)) % 31
        cs = jnp.arange(C, dtype=jnp.int32)[:, None]
        packed = (iota << 5) | (Dv + 1)
        big = (jnp.int32(N) << 5) | 31
        P = jax.lax.cummax(
            jnp.where(Dv[None, :] <= cs, packed[None, :], -1), axis=1)
        Q = jax.lax.cummin(
            jnp.where(Dv[None, :] < cs, packed[None, :], big), axis=1,
            reverse=True)
        nsl = P[0]
        nsr = Q[0]
        for c in range(1, C):
            m = Dv == c
            nsl = jnp.where(m, P[c], nsl)
            nsr = jnp.where(m, Q[c], nsr)
        return (nsl.sum() + nsr.sum()).astype(jnp.float32) * 1e-9

    def p_table(acc):
        t = tab6 + acc
        tabs = [t]
        for k in range(1, LOGN + 1):
            half = 1 << (k - 1)
            prev = tabs[-1]
            tabs.append(jnp.minimum(
                prev, jnp.concatenate(
                    [prev[half:],
                     jnp.full((min(half, N), 6), np.inf, jnp.float32)]
                )[:N]))
        tb = jnp.stack(tabs)
        return tb[-1].sum() * 1e-9 + tb[3, 0, 0] * 1e-9

    def p_selchain21(acc):
        k0 = (D + acc.astype(jnp.int32)) % (LOGN + 1)
        r = tab6
        for k in range(1, LOGN + 1):
            sh = 1 << k
            shifted = jnp.concatenate(
                [jnp.full((min(sh, N), 6), np.inf, jnp.float32),
                 tab6[:max(N - sh, 0)]])
            r = jnp.where((k0 == k)[:, None], shifted, r)
        return r.sum() * 1e-9

    def p_scatter13(acc):
        dst = (idx + acc.astype(jnp.int32)) % N
        out = jnp.zeros((N, 13), jnp.float32).at[dst].set(
            w13, mode="drop", unique_indices=True)
        return out.sum() * 1e-9

    def p_tile_init(acc):
        row = jnp.zeros((13,), jnp.float32).at[0].set(acc)
        out = jnp.tile(row[None, :], (2 * N, 1))
        return out.sum() * 1e-9

    for name, body in [("sort2", p_sort2), ("sort17", p_sort17),
                       ("gather_w15", p_gather15), ("gather_w1", p_gather1),
                       ("ansv_2dscans", p_ansv), ("table_build", p_table),
                       ("selchain21x6", p_selchain21),
                       ("scatter_w13", p_scatter13),
                       ("tile_init", p_tile_init)]:
        t = slope(body)
        print(f"{name:14s} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
