"""Decompose the packet-kernel inner-step serial chain on the real TPU.

Synthetic fixed-count loop kernels (slope protocol: two grid sizes, cost =
dT/dGrid / steps) that add one chain component at a time:

  P0  dynamic (1,128) row load + 1 scalar extract (follow enc0 spine)
  P1  + dynamic pltpu.roll of the row
  P2  + 12 more scalar extracts + both slab tests (VPU work)
  P3  + packed any-hit sum-reduce over the (rows,128) tile
  P4  + SMEM stack push/pop
  PL  leaf-row probe: (1,128) load + 120 extracts + 12 MT tests + tree fold

Results are WRONG on purpose (fixed step count, fixed traversal) -- this
measures cost, not rays.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 16
STEPS = 2000
NROWS = int(__import__("os").environ.get("NROWS", 4096))  # node table rows


def make_multi_kernel(level: str, n_chains: int):
    """n_chains INDEPENDENT pointer-chase chains interleaved, branch-free."""
    shape = (ROWS, 128)

    def kernel(nodes_ref, rays_ref, out_ref, stack_ref):
        ox = rays_ref[0:ROWS]
        ix = rays_ref[3*ROWS:4*ROWS]
        tn = jnp.zeros(shape, jnp.float32)

        def body(k, c):
            nodes, accs = c
            outn, outa = [], []
            for s in range(n_chains):
                node, acc = nodes[s], accs[s]
                row = nodes_ref[pl.ds(jax.lax.rem(node + s, NROWS), 1), :]
                if level == "P0":
                    enc0 = row[0, 12].astype(jnp.int32)
                    outn.append(node + enc0 + 1)
                    outa.append(acc)
                    continue
                # P3-like: roll + slab one child + reduce
                rec = pltpu.roll(row, jnp.bitwise_and(
                    128 - 16 * jnp.bitwise_and(node, 7), 127), axis=1)
                tlx = (rec[0, 0] - ox) * ix
                thx = (rec[0, 1] - ox) * ix
                b0 = jnp.fmax(jnp.fmin(tlx, thx), tn)
                e0 = jnp.fmin(jnp.fmax(tlx, thx), acc)
                h0 = b0 <= e0
                hs_sum = jnp.sum(h0.astype(jnp.int32))
                enc0 = rec[0, 12].astype(jnp.int32)
                enc1 = rec[0, 13].astype(jnp.int32)
                outn.append(jnp.where(hs_sum > 0, node + enc0 + 1,
                                      node + enc1 + 2))
                outa.append(acc)
            return tuple(outn), tuple(outa)

        init = (tuple(jnp.int32(1 + s) for s in range(n_chains)),
                tuple(jnp.full(shape, 1e30, jnp.float32)
                      for _ in range(n_chains)))
        fn, fa = jax.lax.fori_loop(0, STEPS, body, init)
        tot = fa[0] + fn[0].astype(jnp.float32)
        for s in range(1, n_chains):
            tot = tot + fa[s] + fn[s].astype(jnp.float32)
        out_ref[:] = tot

    return kernel


def make_kernel(level: str):
    shape = (ROWS, 128)

    def kernel(nodes_ref, rays_ref, out_ref, stack_ref):
        ox, oy, oz = rays_ref[0:ROWS], rays_ref[ROWS:2*ROWS], rays_ref[2*ROWS:3*ROWS]
        ix, iy, iz = (rays_ref[3*ROWS:4*ROWS], rays_ref[4*ROWS:5*ROWS],
                      rays_ref[5*ROWS:6*ROWS])
        tn = jnp.zeros(shape, jnp.float32)

        def body(k, c):
            node, acc = c
            row = nodes_ref[pl.ds(jax.lax.rem(node, NROWS), 1), :]
            if level == "P0":
                enc0 = row[0, 12].astype(jnp.int32)
                return node + enc0 + 1, acc
            if level == "PDYN":
                # P0 + a data-dependent lane read, via pltpu.roll (direct
                # dynamic lane indexing is unimplemented in Mosaic): prices
                # the sign-baked ordered-candidate trick.
                enc0 = row[0, 12].astype(jnp.int32)
                j = jnp.bitwise_and(enc0 + k, 127)
                r2 = pltpu.roll(row, jnp.bitwise_and(128 - j, 127), axis=1)
                dyn = r2[0, 0].astype(jnp.int32)
                return node + enc0 + jnp.bitwise_and(dyn, 1) + 1, acc
            rec = pltpu.roll(row, jnp.bitwise_and(128 - 16 * jnp.bitwise_and(node, 7), 127), axis=1)
            if level == "P1":
                enc0 = rec[0, 12].astype(jnp.int32)
                return node + enc0 + 1, acc
            # 12 bound extracts + slab tests on all lanes
            tlx = (rec[0, 0] - ox) * ix
            thx = (rec[0, 1] - ox) * ix
            tly = (rec[0, 2] - oy) * iy
            thy = (rec[0, 3] - oy) * iy
            tlz = (rec[0, 4] - oz) * iz
            thz = (rec[0, 5] - oz) * iz
            b0 = jnp.fmax(jnp.fmax(jnp.fmin(tlx, thx), jnp.fmin(tly, thy)),
                          jnp.fmax(jnp.fmin(tlz, thz), tn))
            e0 = jnp.fmin(jnp.fmin(jnp.fmax(tlx, thx), jnp.fmax(tly, thy)),
                          jnp.fmin(jnp.fmax(tlz, thz), acc))
            t2lx = (rec[0, 6] - ox) * ix
            t2hx = (rec[0, 7] - ox) * ix
            t2ly = (rec[0, 8] - oy) * iy
            t2hy = (rec[0, 9] - oy) * iy
            t2lz = (rec[0, 10] - oz) * iz
            t2hz = (rec[0, 11] - oz) * iz
            b1 = jnp.fmax(jnp.fmax(jnp.fmin(t2lx, t2hx), jnp.fmin(t2ly, t2hy)),
                          jnp.fmax(jnp.fmin(t2lz, t2hz), tn))
            e1 = jnp.fmin(jnp.fmin(jnp.fmax(t2lx, t2hx), jnp.fmax(t2ly, t2hy)),
                          jnp.fmin(jnp.fmax(t2lz, t2hz), acc))
            h0, h1 = b0 <= e0, b1 <= e1
            enc0 = rec[0, 12].astype(jnp.int32)
            enc1 = rec[0, 13].astype(jnp.int32)
            if level == "P2":
                # consume h0/h1 per-lane (no reduce): fold into acc
                acc = jnp.where(h0 & h1, acc, acc * np.float32(0.9999))
                return node + enc0 + enc1 + 1, acc
            if level == "P3or":
                # any-hit via a bitwise-OR roll tree (10 dependent vector
                # ops) + ONE plain lane extract, instead of jnp.sum's
                # cross-lane reduce. Hypothesis: the sum's +115 ns is the
                # vector->scalar boundary of the reduction instruction;
                # extracts of computed vregs may be cheaper.
                m = h0.astype(jnp.int32) | (h1.astype(jnp.int32) << 1)
                for sh in (64, 32, 16, 8, 4, 2, 1):
                    m = m | pltpu.roll(m, sh, axis=1)
                for sh in (8, 4, 2, 1):
                    if sh < ROWS:
                        m = m | pltpu.roll(m, sh, axis=0)
                bits = m[0, 0]
                any0 = (bits & 1) > 0
                any1 = (bits & 2) > 0
                nxt = jnp.where(any0, enc0, jnp.where(any1, enc1, node + 1))
                return nxt + 1, acc
            hs_sum = jnp.sum(h0.astype(jnp.int32) << 16 | h1.astype(jnp.int32))
            any0 = hs_sum >= (1 << 16)
            any1 = (hs_sum & 0xFFFF) > 0
            if level == "P3":
                nxt = jnp.where(any0, enc0, jnp.where(any1, enc1, node + 1))
                return nxt + 1, acc
            # P4: + stack push/pop
            sp = jnp.bitwise_and(k, 63)
            @pl.when(any1)
            def _():
                stack_ref[sp] = enc1
            popped = stack_ref[jnp.maximum(sp - 1, 0)]
            nxt = jnp.where(any0, enc0, popped)
            return nxt + 1, acc

        node0 = jnp.int32(1)
        acc0 = jnp.full(shape, 1e30, jnp.float32)
        node_f, acc_f = jax.lax.fori_loop(0, STEPS, body, (node0, acc0))
        out_ref[:] = acc_f + node_f.astype(jnp.float32)

    return kernel


def make_leaf_t_kernel():
    """PLT: leaf row via broadcast+transpose instead of 120 lane extracts.

    T = transpose(broadcast(row, (128,128))) puts lane j's value on ALL
    lanes of sublane j; per-tri operands become (1,128) static-sublane
    slices (free) and the MT math is pure VPU. Prices the transpose trick
    against the extract chain (PL)."""
    shape = (ROWS, 128)

    def kernel(tris_ref, rays_ref, out_ref, stack_ref):
        ox, oy, oz = rays_ref[0:ROWS], rays_ref[ROWS:2*ROWS], rays_ref[2*ROWS:3*ROWS]
        dx, dy, dz = (rays_ref[3*ROWS:4*ROWS], rays_ref[4*ROWS:5*ROWS],
                      rays_ref[5*ROWS:6*ROWS])
        tn = jnp.zeros(shape, jnp.float32)
        INF = np.float32(3e38)

        def body(k, hs):
            cur_t, cur_id = hs
            trow = tris_ref[pl.ds(jax.lax.rem(k, NROWS), 1), :]
            T = jnp.broadcast_to(trow, (128, 128)).T
            cands = []
            for jj in range(12):
                b = 10 * jj
                v0x, v0y, v0z = T[b+0:b+1], T[b+1:b+2], T[b+2:b+3]
                e1x, e1y, e1z = T[b+3:b+4], T[b+4:b+5], T[b+5:b+6]
                e2x, e2y, e2z = T[b+6:b+7], T[b+7:b+8], T[b+8:b+9]
                tid = T[b+9:b+10]
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv = np.float32(1.0) / jnp.where(det == 0, np.float32(1.0), det)
                tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
                u = (tvx * px + tvy * py + tvz * pz) * inv
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv
                t = (e2x * qx + e2y * qy + e2z * qz) * inv
                valid = ((det != 0) & (tid >= 0) & (u >= 0) & (v >= 0)
                         & (u + v <= 1) & (t > tn))
                cands.append((jnp.where(valid, t, INF),
                              jnp.where(valid, tid, INF)))
            while len(cands) > 1:
                nxt = []
                for a, bb in zip(cands[0::2], cands[1::2]):
                    take = (bb[0] < a[0]) | ((bb[0] == a[0]) & (bb[1] < a[1]))
                    nxt.append((jnp.where(take, bb[0], a[0]),
                                jnp.where(take, bb[1], a[1])))
                if len(cands) % 2:
                    nxt.append(cands[-1])
                cands = nxt
            bt, bid = cands[0]
            acc = (bt < cur_t) | ((bt == cur_t) & (bid < cur_id))
            return (jnp.where(acc, bt, cur_t), jnp.where(acc, bid, cur_id))

        init = (jnp.full(shape, 1e30, jnp.float32),
                jnp.full(shape, 1e30, jnp.float32))
        t_f, id_f = jax.lax.fori_loop(0, STEPS, body, init)
        out_ref[:] = t_f + id_f

    return kernel


def make_leaf_kernel(n_chains: int = 1):
    shape = (ROWS, 128)

    def kernel(tris_ref, rays_ref, out_ref, stack_ref):
        ox, oy, oz = rays_ref[0:ROWS], rays_ref[ROWS:2*ROWS], rays_ref[2*ROWS:3*ROWS]
        dx, dy, dz = (rays_ref[3*ROWS:4*ROWS], rays_ref[4*ROWS:5*ROWS],
                      rays_ref[5*ROWS:6*ROWS])
        tn = jnp.zeros(shape, jnp.float32)
        INF = np.float32(3e38)

        def chain_step(k, s, cur_t, cur_id):
            trow = tris_ref[pl.ds(jax.lax.rem(k + s * 17, NROWS), 1), :]
            cands = []
            for jj in range(12):
                b = 10 * jj
                v0x, v0y, v0z = trow[0, b+0], trow[0, b+1], trow[0, b+2]
                e1x, e1y, e1z = trow[0, b+3], trow[0, b+4], trow[0, b+5]
                e2x, e2y, e2z = trow[0, b+6], trow[0, b+7], trow[0, b+8]
                tid = trow[0, b+9].astype(jnp.int32)
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv = np.float32(1.0) / jnp.where(det == 0, np.float32(1.0), det)
                tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
                u = (tvx * px + tvy * py + tvz * pz) * inv
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv
                t = (e2x * qx + e2y * qy + e2z * qz) * inv
                valid = ((det != 0) & (tid >= 0) & (u >= 0) & (v >= 0)
                         & (u + v <= 1) & (t > tn))
                cands.append((jnp.where(valid, t, INF),
                              jnp.where(valid, tid, jnp.int32(0x7FFFFFFF))))
            while len(cands) > 1:
                nxt = []
                for a, bb in zip(cands[0::2], cands[1::2]):
                    take = (bb[0] < a[0]) | ((bb[0] == a[0]) & (bb[1] < a[1]))
                    nxt.append((jnp.where(take, bb[0], a[0]),
                                jnp.where(take, bb[1], a[1])))
                if len(cands) % 2:
                    nxt.append(cands[-1])
                cands = nxt
            bt, bid = cands[0]
            acc = (bt < cur_t) | ((bt == cur_t) & (bid < cur_id))
            return (jnp.where(acc, bt, cur_t), jnp.where(acc, bid, cur_id))

        def body(k, hs):
            ts, ids = hs
            outs = [chain_step(k, s, ts[s], ids[s]) for s in range(n_chains)]
            return (tuple(o[0] for o in outs), tuple(o[1] for o in outs))

        init = (tuple(jnp.full(shape, 1e30, jnp.float32)
                      for _ in range(n_chains)),
                tuple(jnp.full(shape, -1, jnp.int32)
                      for _ in range(n_chains)))
        t_f, id_f = jax.lax.fori_loop(0, STEPS, body, init)
        tot = t_f[0] + id_f[0].astype(jnp.float32)
        for s in range(1, n_chains):
            tot = tot + t_f[s] + id_f[s].astype(jnp.float32)
        out_ref[:] = tot

    return kernel


def time_level(level, grid):
    rng = np.random.default_rng(0)
    nodes = rng.standard_normal((NROWS, 128), dtype=np.float32)
    # enc lanes small ints so the spine walk stays in range
    enc = rng.integers(0, 7, size=(NROWS, 8)).astype(np.float32)
    nodes[:, 12] = enc[:, 0]
    nodes[:, 13] = enc[:, 1]
    rays = rng.standard_normal((grid * 6 * ROWS, 128), dtype=np.float32)
    if level.startswith("E"):
        ke, n = level[1:].split("x")
        kern = make_extract_kernel(int(ke), int(n))
    elif level == "PLT":
        kern = make_leaf_t_kernel()
    elif level.startswith("PL"):
        kern = make_leaf_kernel(int(level[3:]) if "x" in level else 1)
    elif "x" in level:
        base, n = level.split("x")
        kern = make_multi_kernel(base, int(n))
    else:
        kern = make_kernel(level)
    fn = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((6 * ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * ROWS, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((128,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(NROWS * 512 + (24 << 20), 127 << 20)),
    )

    @jax.jit
    def run(n, r):
        return fn(n, r).sum()

    args = (jnp.asarray(nodes), jnp.asarray(rays))
    jax.block_until_ready(run(*args))
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        float(run(*args))
        best = min(best, time.time() - t0)
    return best



def make_extract_kernel(n_extracts: int, n_chains: int):
    """Price lane extracts: load + K static-lane extracts, scalar-summed."""
    def kernel(nodes_ref, rays_ref, out_ref, stack_ref):
        def body(k, c):
            nodes, accs = c
            acc = accs[0]
            outn = []
            for s in range(n_chains):
                node = nodes[s]
                row = nodes_ref[pl.ds(jax.lax.rem(node + s, NROWS), 1), :]
                enc = row[0, 12].astype(jnp.int32)  # ints 0..7: stays in range
                tot = row[0, 0]
                for j in range(1, n_extracts):
                    tot = tot + row[0, j % 12]
                acc = acc + tot  # keep extracts live without steering the walk
                outn.append(node + enc + 1)
            return tuple(outn), (acc,)

        init = (tuple(jnp.int32(1 + s) for s in range(n_chains)),
                (jnp.zeros((ROWS, 128), jnp.float32),))
        fn, fa = jax.lax.fori_loop(0, STEPS, body, init)
        tot = fa[0] + fn[0].astype(jnp.float32)
        for s in range(1, n_chains):
            tot = tot + fn[s].astype(jnp.float32)
        out_ref[:] = tot

    return kernel


levels = sys.argv[1].split(",") if len(sys.argv) > 1 else (
    "P0", "P1", "P2", "P3", "P4", "PL")
for level in levels:
    t_small = time_level(level, 8)
    t_big = time_level(level, 40)
    ns = (t_big - t_small) / ((40 - 8) * STEPS) * 1e9
    print(f"{level}: {ns:7.1f} ns/step  (g8 {t_small*1e3:.1f} ms, "
          f"g40 {t_big*1e3:.1f} ms)", flush=True)

