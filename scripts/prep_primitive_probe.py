"""Price the prep-v3 primitives on device (results_prep_primitives.json).

The r4 dense-engine session priced the current prep's bottleneck: one
lax.sort over the FIXED-SLOT tier stack (280k tris x 8 slots + mid tier
= 2.33M elements) x 11 operands = 21.3 ms, vs 0.62 ms for a 2-operand
sort at the compact pair count (462k). prep-v3 therefore wants:

  expand (scatter+cumsum)  ->  sort (key, tri) @462k  ->  gather payload

This probe prices each candidate primitive in isolation (chained
marginal, outputs consumed so nothing DCEs):

  scatter_ones   zeros(462k).at[offs_280k].add(1), offs strictly
                 ascending (the expand's mark pass)
  cumsum_462k    inclusive i32 cumsum (the expand's rank pass)
  gather_i32     packA[tri_of_p] @462k from a 280k table (key build)
  gather_rows16  verts16[stri] @462k rows of (16,) f32 (payload)
  gather_rows8   same with (8,) rows (payload split in two)
  searchsorted   searchsorted(offs_280k, arange(462k)) (expand alt.)
  counts         _counts() itself (the projection/bbox stage)
  pack_reshape   the (p,11) -> (nt*8, 128) _pack_dense reshape+pad
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
                   "results_prep_primitives.json")
N_TRI, N_PAIR, K = 280_000, 462_440, 8


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
        emit({"stage": tag, "marginal_ms": (walls[K] - walls[1]) / (K - 1) * 1e3,
              "wall1_ms": walls[1] * 1e3, "compile_s": cs})
    except Exception as e:
        emit({"stage": tag, "failed": f"{type(e).__name__}: {str(e)[:200]}"})


def main():
    rng = np.random.default_rng(0)
    # Strictly-ascending offsets (the expand's real shape: exclusive
    # cumsum of per-tri counts, avg ~1.3, max 64).
    cnt = np.minimum(rng.geometric(0.75, N_TRI), 64).astype(np.int32)
    offs_np = np.concatenate([[0], np.cumsum(cnt)[:-1]]).astype(np.int32)
    offs_np = np.minimum(offs_np, N_PAIR - 1)
    offs = jnp.asarray(offs_np)
    packA = jnp.asarray(rng.integers(0, 1 << 30, N_TRI, np.int32))
    tri_of_p = jnp.asarray(
        np.minimum(rng.integers(0, N_TRI, N_PAIR), N_TRI - 1).astype(np.int32))
    verts16 = jnp.asarray(rng.normal(size=(N_TRI, 16)).astype(np.float32))

    def ch_scatter(k):
        @jax.jit
        def run(o):
            acc = jnp.int32(0)
            oo = o
            for _ in range(k):
                m = jnp.zeros((N_PAIR,), jnp.int32).at[oo].add(
                    1, mode="drop")
                acc = acc + m[::4097].sum()
                oo = o + (acc & 1)
            return acc
        return run

    price("scatter_ones_280k_to_462k", ch_scatter, (offs,))

    def ch_cumsum(k):
        @jax.jit
        def run(x):
            acc = jnp.int32(0)
            xx = x
            for _ in range(k):
                c = jnp.cumsum(xx)
                acc = acc + c[::4097].sum()
                xx = x + (acc & 1)
            return acc
        return run

    marks = jnp.zeros((N_PAIR,), jnp.int32).at[offs].add(1, mode="drop")
    price("cumsum_462k", ch_cumsum, (marks,))

    def ch_gi32(k):
        @jax.jit
        def run(idx):
            acc = jnp.int32(0)
            ii = idx
            for _ in range(k):
                g = packA[ii]
                acc = acc + g[::4097].sum()
                ii = idx + (acc & 1) * 0
                ii = jnp.minimum(idx + (acc & 1), N_TRI - 1)
            return acc
        return run

    price("gather_i32_462k", ch_gi32, (tri_of_p,))

    def ch_grows(width):
        tbl = verts16[:, :width]

        def chain(k):
            @jax.jit
            def run(idx):
                acc = jnp.float32(0)
                ii = idx
                for _ in range(k):
                    g = tbl[ii]
                    acc = acc + g[::4097].sum()
                    ii = jnp.minimum(idx + (acc.astype(jnp.int32) & 1),
                                     N_TRI - 1)
                return acc
            return run
        return chain

    price("gather_rows16_462k", ch_grows(16), (tri_of_p,))
    price("gather_rows8_462k", ch_grows(8), (tri_of_p,))

    def ch_ss(k):
        ar = jnp.arange(N_PAIR, dtype=jnp.int32)

        @jax.jit
        def run(o):
            acc = jnp.int32(0)
            oo = o
            for _ in range(k):
                s = jnp.searchsorted(oo, ar, side="right").astype(jnp.int32)
                acc = acc + s[::4097].sum()
                oo = o + (acc & 1)
            return acc
        return run

    price("searchsorted_462k_in_280k", ch_ss, (offs,))

    # _counts on the real conference scene + the pack reshape.
    from ntrace_tpu.ray import raygen
    from ntrace_tpu.scenes import default_camera, get_scene
    from ntrace_tpu.trace.binraster import _counts
    from ntrace_tpu.trace import binraster_dense as bd

    scene = get_scene("conference", n_tris=N_TRI)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    ca = raygen.camera_arrays(default_camera(scene.name), 1024, 768)

    def ch_counts(k):
        @jax.jit
        def run(v):
            acc = jnp.float32(0)
            vv = v
            for _ in range(k):
                tx0, tx1, ty0, ty1, cnt_, zmin = _counts(
                    vv, ca, width=1024, height=768, tile=16)
                acc = acc + cnt_.sum().astype(jnp.float32) + zmin[::997].sum()
                vv = v + acc * 1e-30
            return acc
        return run

    price("counts_280k_t16", ch_counts, (verts,))

    lanes = jnp.asarray(rng.normal(size=(N_PAIR, 10)).astype(np.float32))
    zdec = jnp.asarray(rng.normal(size=(N_PAIR,)).astype(np.float32))

    def ch_pack(k):
        @jax.jit
        def run(ln):
            acc = jnp.float32(0)
            ll = ln
            for _ in range(k):
                rows = bd._pack_dense(None, ll, zdec, N_PAIR)
                acc = acc + rows[::257, ::31].sum()
                ll = ln + acc * 1e-30
            return acc
        return run

    price("pack_reshape_462k", ch_pack, (lanes,))


if __name__ == "__main__":
    main()
