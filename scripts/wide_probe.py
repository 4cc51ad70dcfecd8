"""Probe the 8-wide packet-interval node step (design candidate).

Step shape under test (one (1,128) row = one 8-ary node, 8 children x 16
lanes [lo.x hi.x lo.y hi.y lo.z hi.z enc cnt ...pad]):
  load row -> T = (row - O_pat) * I_pat (pattern tiles, per-packet consts)
  -> static-roll combines -> per-child conservative hit flags
  -> flags . weights -> ONE reduce -> ONE extract = 8-bit hit mask
  -> octant-XOR ordered 8-slot scalar unroll: extract encs of hit children,
     push to SMEM stack, descend first.

Levels:
  Q0    vector part only; next node from mask bits (no enc extracts)
  Q1    + 8 enc extracts + 8 dump-slot SMEM pushes + ordered scalar unroll
  Q1x2/Q1x4  interleaved independent chains
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 2000
NROWS = int(os.environ.get("NROWS", 16384))


def make_kernel(level: str, n_chains: int):
    def kernel(nodes_ref, pat_ref, out_ref, stack_ref):
        O = pat_ref[0:1, :]
        I = pat_ref[1:2, :]
        W = pat_ref[2:3, :]   # weight: 1<<child at lane 16*child, else 0

        def chain_step(k, s, node, acc):
            row = nodes_ref[pl.ds(jax.lax.rem(node + s, NROWS), 1), :]
            T = (row - O) * I
            # pairwise lo/hi combine then across-axis combines (static rolls)
            m1 = jnp.fmin(T, pltpu.roll(T, 127, axis=1))   # entry per axis
            M1 = jnp.fmax(T, pltpu.roll(T, 127, axis=1))   # exit per axis
            ent = jnp.fmax(m1, pltpu.roll(m1, 126, axis=1))
            ent = jnp.fmax(ent, pltpu.roll(m1, 124, axis=1))
            ext = jnp.fmin(M1, pltpu.roll(M1, 126, axis=1))
            ext = jnp.fmin(ext, pltpu.roll(M1, 124, axis=1))
            hit = (ent <= ext) & (ext >= 0)
            mask = jnp.sum(jnp.where(hit, W, 0.0)).astype(jnp.int32)
            if level == "Q0":
                nxt = jnp.where(mask > 0, node + (mask & 7) + 1, node + 1)
                return nxt, acc
            # Q1: ordered scalar unroll with enc extracts + SMEM pushes
            oct_ = jnp.bitwise_and(node, 7)  # stand-in for packet octant
            sp = jnp.bitwise_and(k, 31)
            desc = jnp.int32(-1)
            npush = jnp.int32(0)
            for kk in range(8):
                slot = jnp.bitwise_xor(jnp.int32(kk), oct_)
                hitk = jnp.bitwise_and(
                    jax.lax.shift_right_logical(mask, slot), 1) > 0
                # enc extract of this slot (dynamic lane -> roll+extract)
                enc = pltpu.roll(
                    row, jnp.bitwise_and(128 - slot * 16 - 6, 127), axis=1
                )[0, 0].astype(jnp.int32)
                first = hitk & (desc < 0)
                desc = jnp.where(first, enc, desc)
                do_push = hitk & jnp.logical_not(first)
                widx = jnp.where(do_push, sp + jnp.minimum(npush, 31), 96)
                stack_ref[widx] = enc
                npush = npush + do_push.astype(jnp.int32)
            nxt = jnp.where(desc >= 0, desc + node + 1, node + 1)
            return nxt, acc

        def body(k, c):
            nodes, accs = c
            outs = [chain_step(k, s, nodes[s], accs[s])
                    for s in range(n_chains)]
            return (tuple(o[0] for o in outs), tuple(o[1] for o in outs))

        init = (tuple(jnp.int32(1 + s) for s in range(n_chains)),
                tuple(jnp.zeros((1, 128), jnp.float32)
                      for _ in range(n_chains)))
        fn, fa = jax.lax.fori_loop(0, STEPS, body, init)
        tot = fa[0] + fn[0].astype(jnp.float32)
        for s in range(1, n_chains):
            tot = tot + fa[s] + fn[s].astype(jnp.float32)
        out_ref[:] = jnp.broadcast_to(tot, (8, 128))

    return kernel


def time_level(level, n_chains, grid):
    rng = np.random.default_rng(0)
    nodes = rng.standard_normal((NROWS, 128), dtype=np.float32)
    # keep walks in range: enc lanes (6 of each 16) small ints
    for c in range(8):
        nodes[:, 16 * c + 6] = rng.integers(0, 5, size=NROWS)
    pat = rng.standard_normal((3, 128), dtype=np.float32)
    fn = pl.pallas_call(
        make_kernel(level, n_chains),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((128,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(NROWS * 512 + (24 << 20), 127 << 20)),
    )

    @jax.jit
    def run(n, p):
        return fn(n, p).sum()

    args = (jnp.asarray(nodes), jnp.asarray(pat))
    jax.block_until_ready(run(*args))
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        float(run(*args))
        best = min(best, time.time() - t0)
    return best


for level, n in (("Q0", 1), ("Q0", 2), ("Q0", 4), ("Q1", 1), ("Q1", 2),
                 ("Q1", 4)):
    t_small = time_level(level, n, 8)
    t_big = time_level(level, n, 40)
    ns = (t_big - t_small) / ((40 - 8) * STEPS) * 1e9
    print(f"{level}x{n}: {ns:7.1f} ns/iter ({ns/n:6.1f}/chain) "
          f"(g8 {t_small*1e3:.1f} ms, g40 {t_big*1e3:.1f} ms)", flush=True)
