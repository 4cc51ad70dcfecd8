"""Price cumsum/scatter variants for the prep-v3 fill-forward
(results_cumsum_variants.json).

prep3_bisect localized prep-v3's 39 ms to the 13 per-channel
fill-forwards: jnp.cumsum @462k i32 costs ~2.6 ms IN-GRAPH under full
consumption (the strided-consumption primitive probe under-read it as
~0). Candidates, all fully consumed (.sum() of the whole result):

  cumsum1        jnp.cumsum @462k (the baseline, confirm ~2.6)
  ascan1         lax.associative_scan @462k
  cumsum_wide    jnp.cumsum (13, 462k) axis=1 (batch rides sublanes?)
  blocked1       manual 2-level blocked scan, 1 channel
  blocked13      manual 2-level blocked scan, (13, P) batched
  scatter13      zeros((13,P)).at[:, offs].add(D) batched delta scatter
  ff13_blocked   full fill-forward x13: delta + batched scatter +
                 blocked cumsum (the prep-v3 replacement candidate)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_cumsum_variants.json")
N, P, C, K = 280_000, 462_464, 13, 8


def emit(rec):
    rec = {k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def price(tag, make_chain, args, reps=3):
    try:
        t0 = time.time()
        jax.block_until_ready(make_chain(1)(*args))
        cs = time.time() - t0
        walls = {}
        for k in (1, K):
            run = make_chain(k)
            jax.block_until_ready(run(*args))
            best = 1e30
            for _ in range(reps):
                t1 = time.time()
                jax.block_until_ready(run(*args))
                best = min(best, time.time() - t1)
            walls[k] = best
        emit({"stage": tag,
              "marginal_ms": (walls[K] - walls[1]) / (K - 1) * 1e3,
              "wall1_ms": walls[1] * 1e3, "compile_s": cs})
    except Exception as e:
        emit({"stage": tag, "failed": f"{type(e).__name__}: {str(e)[:200]}"})


def scan_lanes(y):
    """Inclusive scan along the 128-lane minor axis: 7 pad-shift adds."""
    for s in (1, 2, 4, 8, 16, 32, 64):
        y = y + jnp.pad(y, ((0, 0), (s, 0)))[:, :-s]
    return y


def cumsum_blocked(x):
    """Inclusive cumsum along axis -1 of (C, P) int32, P % 128 == 0.

    Level 1 scans 128-lane blocks (all C*nb rows vectorized), level 2+
    recurses on the (C, nb) block totals until a direct small cumsum.
    Exact under int32 wrap (pure adds)."""
    Cc, Pp = x.shape
    if Pp <= 256:
        return jnp.cumsum(x, axis=1)
    nb = Pp // 128
    y = scan_lanes(x.reshape(Cc * nb, 128))
    tot = y[:, 127].reshape(Cc, nb)
    pad = (-nb) % 128
    carry = cumsum_blocked(
        jnp.pad(tot, ((0, 0), (0, pad))))[:, :nb] - tot
    return (y.reshape(Cc, nb, 128) + carry[:, :, None]).reshape(Cc, Pp)


def main():
    rng = np.random.default_rng(0)
    cnt = np.minimum(rng.geometric(0.75, N), 64).astype(np.int32)
    offs_np = np.minimum(
        np.concatenate([[0], np.cumsum(cnt)[:-1]]), P - 1).astype(np.int32)
    offs = jnp.asarray(offs_np)
    x1 = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, P, np.int32))
    x13 = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, (C, P), np.int32))
    vals13 = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, (C, N), np.int32))

    # correctness first (device, tiny tolerance-free check)
    ref = np.cumsum(np.asarray(x13[:, :4096]).astype(np.int64),
                    axis=1).astype(np.int32)
    got = np.asarray(cumsum_blocked(x13[:, :4096]))
    assert (got == ref).all(), "blocked cumsum mismatch"
    emit({"stage": "blocked_correct", "ok": True})

    def ch(f, x):
        def chain(k):
            @jax.jit
            def run(v):
                acc = jnp.int32(0)
                vv = v
                for _ in range(k):
                    r = f(vv)
                    acc = acc + r.sum()
                    vv = v + (acc & 3)
                return acc
            return run
        return chain, (x,)

    price("cumsum1", *ch(lambda v: jnp.cumsum(v), x1))
    price("ascan1", *ch(
        lambda v: jax.lax.associative_scan(jnp.add, v), x1))
    price("cumsum_wide", *ch(lambda v: jnp.cumsum(v, axis=1), x13))
    price("blocked1", *ch(
        lambda v: cumsum_blocked(v[None, :])[0], x1))
    price("blocked13", *ch(cumsum_blocked, x13))

    def sc13(v):
        return jnp.zeros((C, P), jnp.int32).at[:, offs].add(v, mode="drop")

    price("scatter13", *ch(sc13, vals13))

    def ff13(v):
        d = v - jnp.concatenate([v[:, :1] * 0, v[:, :-1]], axis=1)
        s = jnp.zeros((C, P), jnp.int32).at[:, offs].add(d, mode="drop")
        return cumsum_blocked(s)

    vals_tri = jnp.asarray(
        rng.integers(-(1 << 30), 1 << 30, (C, N), np.int32))
    price("ff13_blocked", *ch(ff13, vals_tri))


if __name__ == "__main__":
    main()
