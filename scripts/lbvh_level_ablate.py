#!/usr/bin/env python
"""Ablate the LBVH radix-sweep level body to find the 9 ms/level cost.

Standalone replica of bvh/lbvh.py's `level` body over random sorted codes,
with component groups toggleable:
  scans    : 2 reverse cummins + 3 cumsums
  scatters : the 10 _mset/.at[] scatters
  elem     : everything else (masks, index math)
Variants keep real data dependencies (outputs folded into the carry) so
XLA cannot dead-code the remaining work.

Slope protocol: cost/level = (T(levels=26) - T(levels=2)) / 24.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_sweep(n, levels, scans=True, scatters=True):
    def sweep(codes):
        iota = jnp.arange(n, dtype=jnp.int32)
        ncap = n - 1
        boundary = jnp.zeros((n,), jnp.bool_).at[0].set(True)
        terminal = jnp.zeros((n,), jnp.bool_)
        parent_slot = jnp.full((n,), -1, jnp.int32)
        children = jnp.zeros((ncap, 2), jnp.int32)
        rng_s = jnp.zeros((ncap,), jnp.int32)
        rng_p = jnp.zeros((ncap,), jnp.int32)
        rng_e = jnp.zeros((ncap,), jnp.int32)
        leaf_first = jnp.zeros((n,), jnp.int32)
        leaf_count = jnp.zeros((n,), jnp.int32)

        def mset(arr, idx, val, mask):
            if not scatters:
                # keep val/mask live via a cheap fold; no scatter issued
                fold = (jnp.sum(jnp.where(
                    mask, idx + val.astype(jnp.int32), 0)) % 2) * 0
                if arr.dtype == jnp.bool_:
                    return arr ^ (fold == 1)
                return arr + fold.astype(arr.dtype)
            oob = arr.shape[0]
            return arr.at[jnp.where(mask, idx, oob)].set(
                val, mode="drop", unique_indices=True)

        def level(l, st):
            (boundary, terminal, parent_slot, children,
             rng_s, rng_p, rng_e, leaf_first, leaf_count,
             node_next, leaf_next) = st
            bit = 29 - l
            bits = (codes >> bit) & 1
            prev_bits = jnp.concatenate([bits[:1], bits[:-1]])
            change = (bits != prev_bits) & (~boundary)
            change = change.at[0].set(False)

            if scans:
                bkey = jnp.where(boundary, iota, n)
                nb = jax.lax.cummin(
                    jnp.concatenate([bkey[1:], jnp.array([n], jnp.int32)]),
                    axis=0, reverse=True)
                ckey = jnp.where(change, iota, n)
                fc = jax.lax.cummin(ckey, axis=0, reverse=True)
            else:
                nb = jnp.minimum(iota + 2, n)
                fc = jnp.where(change, iota, n - 1)

            seg = boundary & (~terminal)
            e = nb
            p = fc
            split = seg & (p < e)
            alloc = split.astype(jnp.int32)
            if scans:
                node_idx = node_next + jnp.cumsum(alloc) - 1
            else:
                node_idx = node_next + iota % ncap
            ps = parent_slot
            has_parent = split & (ps >= 0)
            pr = jnp.where(has_parent, ps >> 1, ncap)
            pc = jnp.where(has_parent, ps & 1, 0)
            if scatters:
                children = children.at[pr, pc].set(
                    node_idx, mode="drop", unique_indices=True)
            else:
                children = children + (jnp.sum(pr + pc) % 2) * 0
            rng_s = mset(rng_s, node_idx, iota, split)
            rng_p = mset(rng_p, node_idx, p, split)
            rng_e = mset(rng_e, node_idx, e, split)
            left_n = p - iota
            right_n = e - p
            lleaf = split & (left_n <= 8)
            rleaf = split & (right_n <= 8)
            if scans:
                lsum = jnp.cumsum(lleaf.astype(jnp.int32))
                rsum = jnp.cumsum(rleaf.astype(jnp.int32))
            else:
                lsum = iota
                rsum = iota
            lidx = leaf_next + lsum - 1
            ridx = leaf_next + lsum[-1] + rsum - 1
            leaf_first = mset(leaf_first, lidx, iota, lleaf)
            leaf_count = mset(leaf_count, lidx, left_n, lleaf)
            leaf_first = mset(leaf_first, ridx, p, rleaf)
            leaf_count = mset(leaf_count, ridx, right_n, rleaf)
            children = mset(children.reshape(-1), node_idx * 2, ~lidx,
                            lleaf).reshape(ncap, 2)
            children = mset(children.reshape(-1), node_idx * 2 + 1, ~ridx,
                            rleaf).reshape(ncap, 2)
            parent_slot = mset(parent_slot, iota, node_idx * 2,
                               split & (~lleaf))
            parent_slot = mset(parent_slot, p, node_idx * 2 + 1,
                               split & (~rleaf))
            terminal = mset(terminal, iota, jnp.ones((n,), jnp.bool_), lleaf)
            terminal = mset(terminal, p, jnp.ones((n,), jnp.bool_), rleaf)
            boundary = mset(boundary, p, jnp.ones((n,), jnp.bool_), split)
            node_next = node_next + alloc.sum()
            leaf_next = leaf_next + lsum[-1] + rsum[-1]
            return (boundary, terminal, parent_slot, children,
                    rng_s, rng_p, rng_e, leaf_first, leaf_count,
                    node_next, leaf_next)

        st = (boundary, terminal, parent_slot, children,
              rng_s, rng_p, rng_e, leaf_first, leaf_count,
              jnp.int32(0), jnp.int32(0))
        st = jax.lax.fori_loop(0, levels, level, st)
        return (st[3].sum() + st[4].sum() + st[7].sum() + st[8].sum()
                + st[9] + st[10])

    return sweep


def timed(f, x, reps=3):
    float(f(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = 1_000_000
    rng = np.random.default_rng(0)
    codes = jnp.asarray(np.sort(rng.integers(0, 1 << 30, n).astype(np.int32)))
    for name, kw in [("full", {}),
                     ("no_scatters", dict(scatters=False)),
                     ("no_scans", dict(scans=False)),
                     ("neither", dict(scans=False, scatters=False))]:
        per = {}
        for levels in (2, 26):
            f = jax.jit(make_sweep(n, levels, **kw))
            per[levels] = timed(f, codes)
        slope = (per[26] - per[2]) / 24.0
        print(f"{name:12s}: {slope*1e3:8.2f} ms/level  "
              f"(T2={per[2]*1e3:.1f} T26={per[26]*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
