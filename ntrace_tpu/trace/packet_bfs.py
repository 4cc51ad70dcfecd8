"""Breadth-first node-batch packet traversal (Pallas TPU kernel).

Reference contract: same as trace/packet_pallas.py (the persistent
while-while / packet CUDA kernels, SURVEY.md SS3.3) -- closest/any hit
over a 2-wide BVH with Moller-Trumbore leaves, identical results.

Why another schedule: the shared-stack packet kernel is bound by a
~350-500 ns SERIAL chain per traversal unit -- one scalar-indexed row
load + one cross-lane reduce + ~25 scalar decision ops, on a single
in-order scalar pipe that round-2 probes showed does NOT overlap across
interleaved chains (PERF_NOTES.md "round-2 kernel-structure findings").
The same probes showed the parts that DO overlap: independent row loads
(4 chains for the price of 1) and VPU work (~free under the chain).

This kernel restructures the traversal so the per-NODE scalar work is
divided by a batch factor B: each step pops up to B=8 nodes from the
shared stack, issues 8 INDEPENDENT node-row loads, slab-tests all 16
children on the VPU (operand lane-broadcasts, no scalar extracts),
folds the 16 hit masks into 4 packed cross-lane reduces (independent,
so their latencies overlap), and routes the 16 children with masked
SMEM pushes -- hit internal children back to the stack, hit leaves to a
per-step queue processed by one nested loop. The stack pop order keeps
a DFS-ish near-first flavour (per node the near child by the pack-time
order code is pushed last), so hitT still tightens early; ordering only
affects speed, never results (closest-hit select with lowest-id
tie-break is visit-order invariant).

Tables: bvh/packed.py layout with nodes_per_row == 1 (one record per
row -- the batch loads want direct row addressing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntrace_tpu.bvh.packed import TRI_LANES
from ntrace_tpu.ops.aabb import safe_inv_dir
from ntrace_tpu.trace.packet_common import rep_rows

STACK_DEPTH = 4096          # BFS cut width >> DFS depth; 16 KB SMEM
INF = np.float32(3.0e38)
MAX_STEPS = 1_000_000
B = 8                       # nodes popped per step


def _make_kernel(rows: int, any_hit: bool, tpr: int, light: bool = False,
                 lu: int = 1, verdict: str = "sum4", probe: str = "none"):
    """probe != "none" builds a WRONG-RESULTS compile-bisect variant (the
    full kernel crashes the TPU backend compiler with an opaque helper
    error -- see packet_bdl._make_kernel): noslab / novrd / noleafq
    knock out one section each to locate the lethal construct."""
    shape = (rows, 128)

    def kernel(nodes_ref, tris_ref, rays_ref, out_f, out_id, stack_ref,
               lq_ref):
        views = tuple(rays_ref[c * rows: (c + 1) * rows, :]
                      for c in range(11))
        ox, oy, oz, ix, iy, iz, dx, dy, dz, tn, tx = views
        dead = tx <= tn
        signs = ((jnp.sum(dx) >= 0).astype(jnp.int32)
                 | ((jnp.sum(dy) >= 0).astype(jnp.int32) << 1)
                 | ((jnp.sum(dz) >= 0).astype(jnp.int32) << 2))

        def slab(ln, base, live_t):
            tlo_x = (ln(base + 0) - ox) * ix
            thi_x = (ln(base + 1) - ox) * ix
            tlo_y = (ln(base + 2) - oy) * iy
            thi_y = (ln(base + 3) - oy) * iy
            tlo_z = (ln(base + 4) - oz) * iz
            thi_z = (ln(base + 5) - oz) * iz
            begin = jnp.fmax(
                jnp.fmax(jnp.fmin(tlo_x, thi_x), jnp.fmin(tlo_y, thi_y)),
                jnp.fmax(jnp.fmin(tlo_z, thi_z), tn),
            )
            end = jnp.fmin(
                jnp.fmin(jnp.fmax(tlo_x, thi_x), jnp.fmax(tlo_y, thi_y)),
                jnp.fmin(jnp.fmax(tlo_z, thi_z), live_t),
            )
            return begin <= end

        def leaf_rows(row0, nrows, hs):
            """Same Moller-Trumbore row loop as packet_pallas (leafbc
            operand-broadcast form); bit-identical results."""
            def lbody(k, hs):
                cur_t, cur_id, cur_u, cur_v = hs
                # lu > 1: issue the (independent) row loads together so
                # their latencies overlap; stray rows past a run's end
                # are a neighbour's real triangles or inert pad rows,
                # both closest/any-hit safe (bvh/packed.py).
                tbs = [rep_rows(
                    tris_ref[pl.ds(row0 + k * lu + u_i, 1), :], rows)
                    for u_i in range(lu)]
                cands = []
                for tb in tbs:
                    ln = lambda c, tb=tb: tb[:, c: c + 1]
                    cands.extend(_mt_row(ln))
                while len(cands) > 1:
                    nxt = []
                    for a, bnd in zip(cands[0::2], cands[1::2]):
                        take = (bnd[0] < a[0]) | ((bnd[0] == a[0])
                                                  & (bnd[1] < a[1]))
                        nxt.append(tuple(
                            jnp.where(take, bnd[i], a[i])
                            for i in range(2 if light else 4)))
                    if len(cands) % 2:
                        nxt.append(cands[-1])
                    cands = nxt
                bt, bid = cands[0][0], cands[0][1]
                acc = (bt < cur_t) | ((bt == cur_t) & (bid < cur_id))
                cur_t = jnp.where(acc, bt, cur_t)
                cur_id = jnp.where(acc, bid, cur_id)
                if not light:
                    cur_u = jnp.where(acc, cands[0][2], cur_u)
                    cur_v = jnp.where(acc, cands[0][3], cur_v)
                return cur_t, cur_id, cur_u, cur_v

            def _mt_row(ln):
                cands = []
                for jj in range(tpr):
                    b = TRI_LANES * jj
                    v0x, v0y, v0z = ln(b + 0), ln(b + 1), ln(b + 2)
                    e1x, e1y, e1z = ln(b + 3), ln(b + 4), ln(b + 5)
                    e2x, e2y, e2z = ln(b + 6), ln(b + 7), ln(b + 8)
                    tid = ln(b + 9).astype(jnp.int32)
                    px = dy * e2z - dz * e2y
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    inv = np.float32(1.0) / jnp.where(
                        det == 0, np.float32(1.0), det)
                    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
                    u = (tvx * px + tvy * py + tvz * pz) * inv
                    qx = tvy * e1z - tvz * e1y
                    qy = tvz * e1x - tvx * e1z
                    qz = tvx * e1y - tvy * e1x
                    v = (dx * qx + dy * qy + dz * qz) * inv
                    t = (e2x * qx + e2y * qy + e2z * qz) * inv
                    valid = ((det != 0) & (tid >= 0) & (u >= 0) & (v >= 0)
                             & (u + v <= 1) & (t > tn))
                    cands.append((
                        jnp.where(valid, t, INF),
                        jnp.where(valid, tid, jnp.int32(0x7FFFFFFF)),
                        u, v,
                    ))
                return cands

            n_it = nrows if lu == 1 else (nrows + (lu - 1)) // lu
            return jax.lax.fori_loop(0, n_it, lbody, hs)

        def cond(c):
            return (c[1] > 0) & (c[0] < MAX_STEPS)

        def body(c):
            steps, sp, hit_t, hit_id, hit_u, hit_v = c
            live_t = jnp.where(dead, -INF, hit_t) if any_hit else hit_t

            # --- pop up to B nodes (top of stack = nearest-priority) ---
            nodes = []
            for j in range(B):
                idx = sp - 1 - j
                nodes.append(jnp.where(
                    idx >= 0, stack_ref[jnp.maximum(idx, 0)], -1))
            sp = jnp.maximum(sp - B, 0)

            # --- 8 independent row loads + 16 vector slab tests --------
            recs = [nodes_ref[pl.ds(jnp.maximum(nd, 0), 1), :]
                    for nd in nodes]
            p = jnp.zeros(shape, jnp.int32)
            if probe == "noslab":   # compile-bisect: wants = everything
                p = p + jnp.int32(0xFFFF)
            else:
                for j in range(B):
                    rb = rep_rows(recs[j], rows)
                    rln = lambda c, rb=rb: rb[:, c: c + 1]
                    h0 = slab(rln, 0, live_t)
                    h1 = slab(rln, 6, live_t)
                    # (h & act) not jnp.where(act, h, False): a traced
                    # rank-0 cond in a vector select crashes the Mosaic
                    # backend (scripts/bfs_construct_bisect.py sc_where);
                    # the rank-0 binop broadcast lowers fine.
                    act = nodes[j] >= 0
                    p = (p
                         | (h0 & act).astype(jnp.int32) << (2 * j)
                         | (h1 & act).astype(jnp.int32) << (2 * j + 1))

            # --- verdict: sublane-OR fold, then either 4 independent
            # packed reduces (each int32 holds 4 fields of 8 bits; <=128
            # lanes contribute <=1 each after the fold, so fields never
            # overflow -- independent reduces overlap their latencies) or
            # a 7-step lane roll-OR tree + ONE extract (verdict="roll").
            if probe == "novrd":    # compile-bisect: bits = all set
                def bit(s):
                    return jnp.bool_(True)

                p = p  # fold + reduce skipped
                verdict_done = True
            else:
                verdict_done = False
            w = rows
            while w > 1 and not verdict_done:
                w //= 2
                p = p[:w] | p[w:2 * w]
            if verdict_done:
                pass
            elif verdict == "roll":
                for sh in (64, 32, 16, 8, 4, 2, 1):
                    p = p | pltpu.roll(p, sh, axis=1)
                vbits = p[0, 0]

                def bit(s):  # any-hit bool of child slot s (0..15)
                    return ((vbits >> s) & 1) > 0
            else:
                vs = []
                for k in range(4):
                    q = (((p >> (4 * k)) & 1)
                         | (((p >> (4 * k + 1)) & 1) << 8)
                         | (((p >> (4 * k + 2)) & 1) << 16)
                         | (((p >> (4 * k + 3)) & 1) << 24))
                    vs.append(jnp.sum(q))

                def bit(s):  # any-hit bool of child slot s (0..15)
                    return ((vs[s // 4] >> (8 * (s % 4))) & 255) > 0

            # --- route 16 children: masked SMEM pushes ------------------
            # Reverse batch order: batch slot 0 was the top of the stack
            # (nearest priority), so its children must be pushed LAST to
            # pop first next step -- keeps the DFS-ish near-first order.
            hs = (hit_t, hit_id, hit_u, hit_v)
            lqc = jnp.int32(0)
            for j in reversed(range(B)):
                rec = recs[j]
                enc0 = rec[0, 12].astype(jnp.int32)
                enc1 = rec[0, 13].astype(jnp.int32)
                code = rec[0, 14].astype(jnp.int32)
                cnt0 = rec[0, 14].astype(jnp.int32)
                cnt1 = rec[0, 15].astype(jnp.int32)
                b0 = bit(2 * j)
                b1 = bit(2 * j + 1)
                # leaves -> queue (row0, nrows)
                for enc, cnt, bb in ((enc0, cnt0, b0), (enc1, cnt1, b1)):
                    is_leaf = enc < 0
                    take = bb & is_leaf
                    slot = jnp.where(take, jnp.minimum(lqc, 31), 32)
                    lq_ref[2 * slot] = -enc - 1
                    lq_ref[2 * slot + 1] = cnt
                    lqc = lqc + take.astype(jnp.int32)
                # internal -> stack, far first so the NEAR child (by the
                # pack-time order code vs packet direction signs) pops
                # first: DFS-ish ordering keeps hitT tightening early.
                i0 = b0 & (enc0 >= 0)
                i1 = b1 & (enc1 >= 0)
                first0 = (jnp.bitwise_and(
                    jax.lax.shift_right_logical(signs, code >> 1), 1
                ) == jnp.bitwise_and(code, 1))
                near = jnp.where(first0, enc0, enc1)
                far = jnp.where(first0, enc1, enc0)
                near_ok = jnp.where(first0, i0, i1)
                far_ok = jnp.where(first0, i1, i0)
                for val, ok in ((far, far_ok), (near, near_ok)):
                    tgt = jnp.where(ok, jnp.minimum(sp, STACK_DEPTH - 2),
                                    STACK_DEPTH - 1)
                    stack_ref[tgt] = val
                    sp = sp + ok.astype(jnp.int32)

            # --- batched leaf work --------------------------------------
            def qbody(q, hs):
                row0 = lq_ref[2 * q]
                nr = lq_ref[2 * q + 1]
                return leaf_rows(row0, nr, hs)

            if probe != "noleafq":  # compile-bisect: skip leaf batch
                hs = jax.lax.fori_loop(0, lqc, qbody, hs)
            hit_t, hit_id, hit_u, hit_v = hs
            if any_hit:
                sp = jnp.where(jnp.all((hit_id >= 0) | dead),
                               jnp.int32(0), sp)
            return steps + 1, sp, hit_t, hit_id, hit_u, hit_v

        stack_ref[0] = jnp.int32(0)   # root
        zero = jnp.zeros(shape, jnp.float32)
        init = (jnp.int32(0), jnp.int32(1), tx,
                jnp.full(shape, -1, jnp.int32), zero, zero)
        final = jax.lax.while_loop(cond, body, init)
        out_f[0:rows, :] = final[2]
        out_id[:, :] = final[3]
        out_f[rows: 2 * rows, :] = final[4]
        out_f[2 * rows: 3 * rows, :] = final[5]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "rows", "interpret", "vmem_limit",
                     "tris_per_row", "light", "leaf_unroll", "verdict",
                     "probe"),
)
def trace_packet_bfs(nodes8, tris12, orig, dirn, tmin, tmax, *,
                     any_hit: bool = False, rows: int = 16,
                     interpret: bool = False, vmem_limit: int = 0,
                     tris_per_row: int = 12, light: bool = False,
                     leaf_unroll: int = 1, verdict: str = "sum4",
                     probe: str = "none"):
    """Trace rays through a PackedBVH (nodes_per_row == 1) with the
    BFS node-batch kernel. Same contract as trace_packet."""
    if rows % 8 != 0:
        raise ValueError("rows must be a multiple of 8")
    R = orig.shape[0]
    packet = rows * 128
    pad = (-R) % packet
    if pad:
        orig = jnp.concatenate([orig, jnp.zeros((pad, 3), orig.dtype)])
        dirn = jnp.concatenate([dirn, jnp.ones((pad, 3), dirn.dtype)])
        tmin = jnp.concatenate([tmin, jnp.ones((pad,), tmin.dtype)])
        tmax = jnp.concatenate([tmax, jnp.zeros((pad,), tmax.dtype)])
    rp = R + pad
    inv = safe_inv_dir(jnp, dirn)

    def tile(a):
        return a.reshape(-1, rows, 128)

    comps = jnp.stack([
        tile(orig[:, 0]), tile(orig[:, 1]), tile(orig[:, 2]),
        tile(inv[:, 0]), tile(inv[:, 1]), tile(inv[:, 2]),
        tile(dirn[:, 0]), tile(dirn[:, 1]), tile(dirn[:, 2]),
        tile(tmin), tile(tmax),
    ], axis=1)
    grid = rp // packet
    rays_in = comps.reshape(grid * 11 * rows, 128)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_spec = pl.BlockSpec((11 * rows, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    outf_spec = pl.BlockSpec((3 * rows, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    outi_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((grid * 3 * rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((grid * rows, 128), jnp.int32),
    ]
    scratch = [pltpu.SMEM((STACK_DEPTH,), jnp.int32),
               pltpu.SMEM((66,), jnp.int32)]
    params = {}
    if not interpret:
        table_bytes = (nodes8.shape[0] + tris12.shape[0]) * 128 * 4
        limit = vmem_limit or min(table_bytes + (24 << 20), 127 << 20)
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=limit)
    outs = pl.pallas_call(
        _make_kernel(rows, any_hit, tris_per_row, light, leaf_unroll,
                     verdict, probe),
        grid=(grid,),
        in_specs=[table_spec, table_spec, in_spec],
        out_specs=[outf_spec, outi_spec],
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **params,
    )(nodes8, tris12, rays_in)
    tuv = outs[0].reshape(grid, 3, rows, 128)
    flat = lambda a: a.reshape(-1)[:R]
    return (flat(outs[1]), flat(tuv[:, 0]), flat(tuv[:, 1]),
            flat(tuv[:, 2]))
