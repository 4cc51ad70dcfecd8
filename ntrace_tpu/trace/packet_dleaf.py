"""Deferred-leaf packet traversal (Pallas TPU kernel).

Reference contract: same as trace/packet_pallas.py (the persistent
packet / while-while CUDA kernels, expected src/rt/kernels/*.cu,
SURVEY.md SS3.3) -- closest/any hit over a 2-wide BVH with
Moller-Trumbore leaves, identical results to every other engine.

Why this schedule exists (measured, scripts/leaf_union_probe.py +
PERF_NOTES.md round-3 frame decomposition): at rows=16 the leaf phase is
~58% of the conference frame because the packet is LOCKSTEP -- every
visited leaf row is MT-tested against all rows*128 rays.  Grouping rays
at 128-lane-row granularity instead of whole-packet granularity shrinks
the (ray_row, leaf_row) pair count 3.9x on conference primaries
(results_leaf_union.json: 106 vs 418 MT tests/ray).  This kernel claims
that win by DEFERRING leaf work:

  node phase   unchanged: one shared-stack traversal step per iteration
               (scalar row load, both-children slab test, one packed
               cross-lane reduce, order-code descent).
  leaf entry   instead of testing the leaf on all rows inline, fold the
               per-ROW wants bits (7 lane roll-ORs + one packed reduce:
               each 128-lane row contributes one bit) and push the
               leaf's triangle-row run onto the PER-ROW run queues of
               exactly the rows that want it (SMEM, branchless
               junk-slot pushes).
  drain        when enough work is queued (or the stack is exhausted),
               one drain step pops one triangle row from EVERY row's
               queue and runs a single (rows, 128) Moller-Trumbore tile
               in which sublane r tests ITS OWN queued row against its
               own rays: per-sublane operand broadcasts, no ray
               gathering, no hit-state scatter.  Rows with an empty
               queue re-test triangle row 0 -- closest-hit updates are
               superset-invariant (any extra candidate is a real scene
               intersection with t >= the true minimum, and ties break
               on the smallest id which full traversal also finds), so
               junk work costs throughput, never correctness.

Deferral means slab tests see a slightly STALE hitT (it tightens at
drain time, not leaf-entry time).  That only enlarges the visited node
set; results are unchanged for the same superset reason.

Large packets are the point: lockstep leaf waste was what made rows=32+
lose (PERF_NOTES rows sweep); with leaf pairs counted per 128-ray row,
doubling rows halves the per-ray NODE work while leaf work stays nearly
flat.

Tables: bvh/packed.py layout.  Numerics match ops/aabb.py slab_test and
ops/intersect.py moller_trumbore exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntrace_tpu.bvh.packed import NODES_PER_ROW, TRI_LANES, TRIS_PER_ROW
from ntrace_tpu.ops.aabb import safe_inv_dir
from ntrace_tpu.trace.packet_common import (INF, node_record, packet_signs,
                                            ray_views, stage_rays)

STACK_DEPTH = 128
MAX_STEPS = 4_000_000   # malformed-tree backstop
QCAP = 96               # queued runs per ray row. Unreachable by design:
                        # the drain while-loop keeps pending < drain_min
                        # (<= 64) after every step and a step pushes <= 2
                        # runs per row, so depth <= 66 < 96; the junk-slot
                        # guard is belt-and-braces only.


def _mt_tile(tb, ox, oy, oz, dx, dy, dz, tn, tpr: int, light: bool):
    """Moller-Trumbore on a (rows, 128) tile where SUBLANE r holds the
    triangle row queued by ray row r.  ln(c) is a (rows, 1) static lane
    slice: each sublane's constants broadcast across its own lanes, so
    different rows test DIFFERENT triangles in one vector pass.  Same
    fp32 elementwise ops as packet_common.mt_row_best -- bit-identical
    per-lane results."""
    ln = lambda c: tb[:, c: c + 1]
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
                      jnp.where(valid, tid, jnp.int32(0x7FFFFFFF)),
                      u, v))
    while len(cands) > 1:
        nxt = []
        for a, bnd in zip(cands[0::2], cands[1::2]):
            take = (bnd[0] < a[0]) | ((bnd[0] == a[0]) & (bnd[1] < a[1]))
            nxt.append(tuple(jnp.where(take, bnd[i], a[i])
                             for i in range(2 if light else 4)))
        if len(cands) % 2:
            nxt.append(cands[-1])
        cands = nxt
    c = cands[0]
    if light:
        return c[0], c[1]
    return c


def _make_kernel(rows: int, any_hit: bool, light: bool, tpr: int, npr: int,
                 drain_min: int):
    shape = (rows, 128)

    def kernel(nodes_ref, tris_ref, rays_ref, out_f, out_id, stack_ref,
               q_ref, qn_ref, arow_ref, aleft_ref):
        (view,) = ray_views(rays_ref, rows, 1)
        ox, oy, oz, ix, iy, iz, dx, dy, dz, tn, tx = view
        dead = tx <= tn
        (signs,) = packet_signs([view])
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        rowi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)

        # Scratch persists across grid steps: reset the queue state.
        for r in range(rows):
            qn_ref[r] = jnp.int32(0)
            arow_ref[r] = jnp.int32(0)
            aleft_ref[r] = jnp.int32(0)

        def slab(rec, base, live_t):
            tlo_x = (rec[0, base + 0] - ox) * ix
            thi_x = (rec[0, base + 1] - ox) * ix
            tlo_y = (rec[0, base + 2] - oy) * iy
            thi_y = (rec[0, base + 3] - oy) * iy
            tlo_z = (rec[0, base + 4] - oz) * iz
            thi_z = (rec[0, base + 5] - oz) * iz
            begin = jnp.fmax(
                jnp.fmax(jnp.fmin(tlo_x, thi_x), jnp.fmin(tlo_y, thi_y)),
                jnp.fmax(jnp.fmin(tlo_z, thi_z), tn))
            end = jnp.fmin(
                jnp.fmin(jnp.fmax(tlo_x, thi_x), jnp.fmax(tlo_y, thi_y)),
                jnp.fmin(jnp.fmax(tlo_z, thi_z), live_t))
            return begin <= end

        def enqueue(h, row0, nrows, pending):
            """Fold per-ROW wants bits from the (rows, 128) child hit
            mask and push (row0, nrows) onto each wanting row's queue.
            One packed cross-lane reduce yields all row bits: after the
            lane roll-OR fold every lane holds its row's any-bit, so
            masking to lane 0 leaves exactly one contribution per row
            and the shifted sum is an exact bit-OR (rows <= 32)."""
            m = h.astype(jnp.int32)
            for sh in (64, 32, 16, 8, 4, 2, 1):
                m = m | pltpu.roll(m, sh, axis=1)
            bits = jnp.sum(jnp.where(lane == 0,
                                     jax.lax.shift_left(m, rowi), 0))
            accepted = []
            for r in range(rows):
                take = jnp.bitwise_and(
                    jax.lax.shift_right_logical(bits, r), 1)
                qn = qn_ref[r]
                ok = take & (qn < QCAP).astype(jnp.int32)
                # Branchless push: rejected pushes land in the junk slot.
                slot = jnp.where(ok > 0, r * QCAP + jnp.minimum(qn, QCAP - 1),
                                 rows * QCAP)
                q_ref[2 * slot] = row0
                q_ref[2 * slot + 1] = nrows
                qn_ref[r] = qn + ok
                accepted.append(ok)
            # pending counts ACCEPTED tri-rows only (tree-fold the bits).
            while len(accepted) > 1:
                accepted = [a + b for a, b in
                            zip(accepted[0::2], accepted[1::2])] + (
                    [accepted[-1]] if len(accepted) % 2 else [])
            return pending + accepted[0] * nrows

        def drain(args):
            """One deferred-leaf step: refill every empty active run
            from its queue, pop one triangle row per ray row (row 0 as
            the inert filler), and run one per-sublane-distinct MT tile.
            All refill/advance chains are independent across rows."""
            pending, hit_t, hit_id, hit_u, hit_v = args
            loads = []
            used = []
            for r in range(rows):
                aleft = aleft_ref[r]
                arow = arow_ref[r]
                qn = qn_ref[r]
                need = ((aleft == 0) & (qn > 0)).astype(jnp.int32)
                base = 2 * (r * QCAP + jnp.maximum(qn - 1, 0))
                arow = jnp.where(need > 0, q_ref[base], arow)
                aleft = jnp.where(need > 0, q_ref[base + 1], aleft)
                qn_ref[r] = qn - need
                use = (aleft > 0).astype(jnp.int32)
                rowsel = jnp.where(use > 0, arow, 0)
                arow_ref[r] = arow + use
                aleft_ref[r] = aleft - use
                used.append(use)
                loads.append(tris_ref[pl.ds(rowsel, 1), :])
            tb = jnp.concatenate(loads, axis=0)
            if light:
                bt, bid = _mt_tile(tb, ox, oy, oz, dx, dy, dz, tn, tpr,
                                   True)
                bu = bv = None
            else:
                bt, bid, bu, bv = _mt_tile(tb, ox, oy, oz, dx, dy, dz, tn,
                                           tpr, False)
            acc = (bt < hit_t) | ((bt == hit_t) & (bid < hit_id))
            hit_t = jnp.where(acc, bt, hit_t)
            hit_id = jnp.where(acc, bid, hit_id)
            if not light:
                hit_u = jnp.where(acc, bu, hit_u)
                hit_v = jnp.where(acc, bv, hit_v)
            while len(used) > 1:
                used = [a + b for a, b in zip(used[0::2], used[1::2])] + (
                    [used[-1]] if len(used) % 2 else [])
            return pending - used[0], hit_t, hit_id, hit_u, hit_v

        def cond(c):
            steps, node, sp, pending = c[0], c[1], c[2], c[3]
            return ((node >= 0) | (pending > 0)) & (steps < MAX_STEPS)

        def body(c):
            steps, node, sp, pending, hit_t, hit_id, hit_u, hit_v = c
            active = node >= 0
            rec = node_record(nodes_ref, jnp.maximum(node, 0), npr)
            live_t = jnp.where(dead, -INF, hit_t) if any_hit else hit_t
            h0 = slab(rec, 0, live_t)
            h1 = slab(rec, 6, live_t)
            # One packed reduce yields both children's any-hit flags;
            # near-first order from the pack-time order code (lane 14).
            hs_sum = jnp.sum(h0.astype(jnp.int32) << 16
                             | h1.astype(jnp.int32))
            any0 = (hs_sum >= (1 << 16)) & active
            any1 = ((hs_sum & 0xFFFF) > 0) & active
            code = rec[0, 14].astype(jnp.int32)
            first0 = (jnp.bitwise_and(
                jax.lax.shift_right_logical(signs, code >> 1), 1
            ) == jnp.bitwise_and(code, 1))
            enc0 = rec[0, 12].astype(jnp.int32)
            enc1 = rec[0, 13].astype(jnp.int32)
            leaf0 = enc0 < 0
            leaf1 = enc1 < 0

            pending = jax.lax.cond(
                any0 & leaf0,
                lambda p: enqueue(h0, -enc0 - 1,
                                  rec[0, 14].astype(jnp.int32), p),
                lambda p: p, pending)
            pending = jax.lax.cond(
                any1 & leaf1,
                lambda p: enqueue(h1, -enc1 - 1,
                                  rec[0, 15].astype(jnp.int32), p),
                lambda p: p, pending)

            i0 = any0 & jnp.logical_not(leaf0)
            i1 = any1 & jnp.logical_not(leaf1)
            both = i0 & i1
            near = jnp.where(first0, enc0, enc1)
            far = jnp.where(first0, enc1, enc0)

            @pl.when(both)
            def _():
                stack_ref[jnp.minimum(sp, STACK_DEPTH - 1)] = far

            sp1 = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH), sp)
            desc = jnp.where(both, near,
                             jnp.where(i0, enc0, jnp.where(i1, enc1, -1)))
            need_pop = jnp.logical_not(i0 | i1)
            can_pop = sp1 > 0
            popped = stack_ref[jnp.maximum(sp1 - 1, 0)]
            node2 = jnp.where(need_pop, jnp.where(can_pop, popped, -1), desc)
            sp2 = jnp.where(need_pop & can_pop, sp1 - 1, sp1)

            # Drain while enough rows are queued to fill the tile, and to
            # empty once the stack is exhausted (tail flush). A WHILE, not
            # a single cond: draining back below drain_min every step
            # bounds per-row queue depth at drain_min + 2 entries (one
            # step pushes <= 2 runs per row), so the QCAP junk-slot guard
            # can never be reached and no leaf work is ever dropped --
            # a single drain per step could fall behind on leaf-dense
            # scenes (hairball-class) and silently overflow.
            def dcond(a):
                return (a[0] >= drain_min) | ((node2 < 0) & (a[0] > 0))

            pending, hit_t, hit_id, hit_u, hit_v = jax.lax.while_loop(
                dcond, drain, (pending, hit_t, hit_id, hit_u, hit_v))
            if any_hit:
                all_hit = jnp.all((hit_id >= 0) | dead)
                node2 = jnp.where(all_hit, jnp.int32(-1), node2)
                pending = jnp.where(all_hit, jnp.int32(0), pending)
            return (steps + 1, node2, sp2, pending,
                    hit_t, hit_id, hit_u, hit_v)

        zero = jnp.zeros(shape, jnp.float32)
        init = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                tx, jnp.full(shape, -1, jnp.int32), zero, zero)
        final = jax.lax.while_loop(cond, body, init)
        out_f[0: rows, :] = final[4]
        out_id[:, :] = final[5]
        out_f[rows: 2 * rows, :] = final[6]
        out_f[2 * rows: 3 * rows, :] = final[7]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "rows", "interpret", "vmem_limit",
                     "tris_per_row", "nodes_per_row", "light", "drain_min"),
)
def trace_packet_dleaf(nodes8, tris12, orig, dirn, tmin, tmax, *,
                       any_hit: bool = False, rows: int = 16,
                       interpret: bool = False, vmem_limit: int = 0,
                       tris_per_row: int = TRIS_PER_ROW,
                       nodes_per_row: int = NODES_PER_ROW,
                       light: bool = False, drain_min: int = 0):
    """Trace rays through a PackedBVH with the deferred-leaf packet
    kernel.  Same contract as trace_packet: returns (hit_tri, t, u, v),
    hit_tri == -1 on miss; rays padded to whole rows*128 packets.

    drain_min: queued tri-rows required before a drain step fires
    (0 -> rows, i.e. expect a mostly-full tile).
    """
    if rows % 8 != 0 or rows > 32:
        raise ValueError("rows must be a multiple of 8, <= 32 "
                         "(wants-bitmask packs one bit per row in int32)")
    dmin = drain_min or rows
    if dmin > 64:
        raise ValueError("drain_min must be <= 64 (QCAP bound)")
    R = orig.shape[0]
    rays_in, grid, rp = stage_rays(orig, dirn, tmin, tmax, rows, 1,
                                   safe_inv_dir)
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
    scratch = [
        pltpu.SMEM((STACK_DEPTH,), jnp.int32),
        pltpu.SMEM((rows * QCAP * 2 + 2,), jnp.int32),   # run queues + junk
        pltpu.SMEM((rows,), jnp.int32),                  # queue depths
        pltpu.SMEM((rows,), jnp.int32),                  # active run row
        pltpu.SMEM((rows,), jnp.int32),                  # active run left
    ]
    params = {}
    if not interpret:
        table_bytes = (nodes8.shape[0] + tris12.shape[0]) * 128 * 4
        limit = vmem_limit or min(table_bytes + (24 << 20), 127 << 20)
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=limit)
    outs = pl.pallas_call(
        _make_kernel(rows, any_hit, light, tris_per_row, nodes_per_row,
                     dmin),
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
