"""Batched-node + deferred-leaf packet traversal (Pallas TPU kernel).

Reference contract: same as trace/packet_pallas.py (the persistent
packet / while-while CUDA kernels, expected src/rt/kernels/*.cu,
SURVEY.md SS3.3) -- closest/any hit over a 2-wide BVH with
Moller-Trumbore leaves, identical results to every other engine.

This kernel composes the round-3 levers that packet_bfs and
packet_dleaf each claim alone, because they attack INDEPENDENT parts
of the measured frame (PERF_NOTES.md round-3 decomposition: node
scalar chain ~42%, lockstep leaf work ~58% at rows=16):

  node phase (from packet_bfs): pop up to B=8 nodes per step from the
      shared stack, 8 INDEPENDENT node-row loads (round-2 probes:
      independent loads overlap near-perfectly), 16 vector slab tests
      accumulated into one (rows, 128) int32 bitfield -- the per-node
      serial scalar chain is amortized across the batch.

  verdict (new): instead of packet_bfs's sublane fold (which destroys
      per-row information), the bitfield is lane-roll-OR-folded ONLY
      across lanes, then rows/2 independent packed reduces extract the
      PER-ROW 16-child wants masks as scalars (two rows' 16-bit masks
      per int32; lane-0 masking makes the sum an exact bit-OR).  The
      batch any-bits fall out of OR-ing those same scalars -- the leaf
      path costs no extra vector reduces at all.

  leaf phase (from packet_dleaf): visited leaves are NOT tested in
      lockstep on all rows; each wanting 128-ray row gets the leaf's
      triangle-row run pushed onto its own SMEM run queue (branchless
      junk-slot pushes driven by the scalar wants bits).  Drain steps
      pop one triangle row per ray row and run one (rows, 128)
      Moller-Trumbore tile in which sublane r tests ITS OWN queued row
      (per-sublane operand broadcasts).  Rows with nothing queued
      re-test row 0 -- closest-hit updates are superset-invariant, so
      junk work costs throughput, never correctness.

Ordering: children are routed in reverse batch order with the near
child (pack-time order code vs packet direction signs) pushed last,
keeping the DFS-ish near-first flavour so hitT still tightens early.
Deferral + breadth both leave slab tests with a slightly stale hitT;
that only enlarges the visited-node superset, never the result.

Tables: bvh/packed.py layout with nodes_per_row == 1 (batch loads want
direct row addressing).  Numerics match ops/aabb.py slab_test and
ops/intersect.py moller_trumbore exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntrace_tpu.bvh.packed import TRIS_PER_ROW
from ntrace_tpu.ops.aabb import safe_inv_dir
from ntrace_tpu.trace.packet_common import (INF, packet_signs, ray_views,
                                            rep_rows, stage_rays)
from ntrace_tpu.trace.packet_dleaf import _mt_tile

STACK_DEPTH = 4096      # BFS cut width >> DFS depth; 16 KB SMEM
MAX_STEPS = 1_000_000   # malformed-tree backstop (steps cover B nodes)
QCAP = 96               # queued runs per queue (row or qgroup-row group);
                        # bounded: drains keep pending < drain_min <= 64
                        # and one step adds <= 2*B entries per queue
B = 8                   # nodes popped per step


def _make_kernel(rows: int, any_hit: bool, light: bool, tpr: int,
                 drain_min: int, merge_sibs: bool, qgroup: int,
                 probe: str = "none"):
    """probe != "none" builds a WRONG-RESULTS compile-bisect variant: the
    full kernel crashes the TPU backend compiler with an opaque helper
    error (round-3c), so each value knocks out one section to locate the
    lethal construct on device (scripts/bdl_compile_bisect.py):
      noslab -- skip node-record loads + slab tests (wants = all)
      novrd  -- skip the roll-fold/sum verdict (bits = all)
      noenq  -- skip leaf enqueues
      nodrn  -- skip the drain while-loop
    """
    shape = (rows, 128)
    # Queue granularity: one run queue per GROUP of qgroup ray rows.
    # qgroup == 1 is the per-row dleaf scheme; larger groups divide the
    # dominant per-event scalar push chain (PERF_NOTES round-3 session-4
    # cost model: ~9 ops x rows per wanted leaf) by qgroup, at the price
    # of every row in a group testing the UNION of its members' runs --
    # a superset of each row's wants, so closest/any-hit stay exact.
    G = rows // qgroup

    def kernel(nodes_ref, tris_ref, rays_ref, out_f, out_id, stack_ref,
               q_ref, qn_ref, arow_ref, aleft_ref):
        (view,) = ray_views(rays_ref, rows, 1)
        ox, oy, oz, ix, iy, iz, dx, dy, dz, tn, tx = view
        dead = tx <= tn
        (signs,) = packet_signs([view])
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        rowi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)

        # Scratch persists across grid steps: reset the queue state.
        for r in range(G):
            qn_ref[r] = jnp.int32(0)
            arow_ref[r] = jnp.int32(0)
            aleft_ref[r] = jnp.int32(0)

        def slab(rb, base, live_t):
            """Operand-broadcast slab test: rb is the (rows, 128)
            broadcast node record; (rows, 1) static lane slices keep
            the bounds on the vector pipe (no scalar extracts)."""
            ln = lambda c: rb[:, c: c + 1]
            tlo_x = (ln(base + 0) - ox) * ix
            thi_x = (ln(base + 1) - ox) * ix
            tlo_y = (ln(base + 2) - oy) * iy
            thi_y = (ln(base + 3) - oy) * iy
            tlo_z = (ln(base + 4) - oz) * iz
            thi_z = (ln(base + 5) - oz) * iz
            begin = jnp.fmax(
                jnp.fmax(jnp.fmin(tlo_x, thi_x), jnp.fmin(tlo_y, thi_y)),
                jnp.fmax(jnp.fmin(tlo_z, thi_z), tn))
            end = jnp.fmin(
                jnp.fmin(jnp.fmax(tlo_x, thi_x), jnp.fmax(tlo_y, thi_y)),
                jnp.fmin(jnp.fmax(tlo_z, thi_z), live_t))
            return begin <= end

        def drain(args):
            """One deferred-leaf step (same machinery as packet_dleaf):
            refill empty active runs, pop one triangle row per ray row
            (row 0 as the inert filler), one per-sublane-distinct MT
            tile.  All refill/advance chains independent across rows."""
            pending, hit_t, hit_id, hit_u, hit_v = args
            loads = []
            used = []
            for r in range(G):
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
                ld = tris_ref[pl.ds(rowsel, 1), :]
                loads.append(rep_rows(ld, qgroup))
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
            steps, sp, pending = c[0], c[1], c[2]
            return ((sp > 0) | (pending > 0)) & (steps < MAX_STEPS)

        def body(c):
            steps, sp, pending, hit_t, hit_id, hit_u, hit_v = c
            live_t = jnp.where(dead, -INF, hit_t) if any_hit else hit_t

            # --- pop up to B nodes (top of stack = nearest-priority) ---
            nodes = []
            for j in range(B):
                idx = sp - 1 - j
                nodes.append(jnp.where(
                    idx >= 0, stack_ref[jnp.maximum(idx, 0)], -1))
            sp = jnp.maximum(sp - B, 0)

            # --- B independent row loads + 2B vector slab tests --------
            recs = [nodes_ref[pl.ds(jnp.maximum(nd, 0), 1), :]
                    for nd in nodes]
            p = jnp.zeros(shape, jnp.int32)
            if probe == "noslab":   # compile-bisect: wants = everything
                p = p + jnp.int32(0xFFFF)
            else:
                for j in range(B):
                    rb = rep_rows(recs[j], rows)
                    h0 = slab(rb, 0, live_t)
                    h1 = slab(rb, 6, live_t)
                    # (h & act) not jnp.where(act, h, False): a traced
                    # rank-0 cond in a vector select crashes the Mosaic
                    # backend (scripts/bfs_construct_bisect.py sc_where);
                    # the rank-0 binop broadcast lowers fine.
                    act = nodes[j] >= 0
                    p = (p
                         | (h0 & act).astype(jnp.int32) << (2 * j)
                         | (h1 & act).astype(jnp.int32) << (2 * j + 1))

            # --- per-ROW wants masks as scalars -------------------------
            # Lane roll-OR keeps the row axis: every lane of row r ends
            # holding row r's 16 child bits.  rows/2 INDEPENDENT packed
            # reduces (latencies overlap) then extract two rows' masks
            # per int32: lane-0 masking leaves exactly one contribution
            # per row, so the sum is an exact bit-OR.
            if probe == "novrd":    # compile-bisect: bits = all set
                def bit(s):
                    return jnp.bool_(True)

                gm = [jnp.int32(0xFFFF)] * G
            else:
                for sh in (64, 32, 16, 8, 4, 2, 1):
                    p = p | pltpu.roll(p, sh, axis=1)
                p0 = jnp.where(lane == 0, p, 0)
                ws = []
                for q in range(rows // 2):
                    ws.append(jnp.sum(
                        jnp.where(rowi == 2 * q, p0, 0)
                        + jnp.where(rowi == 2 * q + 1,
                                    jax.lax.shift_left(p0, 16), 0)))
                anyb = ws[0]
                for w in ws[1:]:
                    anyb = anyb | w
                anyb = anyb | jax.lax.shift_right_logical(anyb, 16)

                def bit(s):  # any-hit bool of child slot s (0..2B-1)
                    return jnp.bitwise_and(
                        jax.lax.shift_right_logical(anyb, s), 1) > 0

                # Per-GROUP 16-bit wants masks (computed once per step;
                # the enqueue bit tests read these).  ws[q] packs row
                # 2q's mask in the low half and row 2q+1's in the high
                # half; a group's mask is the OR over its member rows.
                # High-half junk above bit 15 is harmless: enqueue
                # extracts single bits <= 15.
                gm = []
                if qgroup == 1:
                    for r in range(rows):
                        gm.append(jax.lax.shift_right_logical(
                            ws[r // 2], 16 * (r % 2)))
                else:
                    for g in range(G):
                        qs = range(g * qgroup // 2, (g + 1) * qgroup // 2)
                        acc = None
                        for q in qs:
                            acc = ws[q] if acc is None else acc | ws[q]
                        gm.append(acc
                                  | jax.lax.shift_right_logical(acc, 16))

            def enqueue(s, row0, nrows, pending, s2=-1):
                """Push (row0, nrows) onto the queue of every GROUP whose
                wants bit for child slot s is set (branchless junk-slot
                pushes; independent per-group chains). s2 >= 0 ORs a
                second slot's wants bit in (merged contiguous sibling
                runs): a group wanting either child tests the union run
                -- a superset, so closest/any-hit results are
                unchanged."""
                accepted = []
                for r in range(G):
                    b = jax.lax.shift_right_logical(gm[r], s)
                    if s2 >= 0:
                        b = b | jax.lax.shift_right_logical(gm[r], s2)
                    take = jnp.bitwise_and(b, 1)
                    qn = qn_ref[r]
                    ok = take & (qn < QCAP).astype(jnp.int32)
                    slot = jnp.where(ok > 0,
                                     r * QCAP + jnp.minimum(qn, QCAP - 1),
                                     G * QCAP)
                    q_ref[2 * slot] = row0
                    q_ref[2 * slot + 1] = nrows
                    qn_ref[r] = qn + ok
                    accepted.append(ok)
                while len(accepted) > 1:
                    accepted = [a + b for a, b in
                                zip(accepted[0::2], accepted[1::2])] + (
                        [accepted[-1]] if len(accepted) % 2 else [])
                return pending + accepted[0] * nrows

            # --- route 2B children -------------------------------------
            # Reverse batch order: batch slot 0 was the top of the stack
            # (nearest priority), so its children are pushed LAST and
            # pop first next step.
            for j in reversed(range(B)):
                rec = recs[j]
                enc0 = rec[0, 12].astype(jnp.int32)
                enc1 = rec[0, 13].astype(jnp.int32)
                code = rec[0, 14].astype(jnp.int32)
                cnt0 = rec[0, 14].astype(jnp.int32)
                cnt1 = rec[0, 15].astype(jnp.int32)
                b0 = bit(2 * j)
                b1 = bit(2 * j + 1)
                # leaves -> per-row run queues
                if probe == "noenq":   # compile-bisect: skip enqueues
                    pass
                elif merge_sibs:
                    # Contiguous sibling leaf runs (flatten.py emits
                    # sibling leaves adjacently) collapse into ONE
                    # enqueue with OR'd wants: halves the dominant
                    # per-event 16-row scalar push chain; rows wanting
                    # only one sibling test a superset (still exact).
                    l0 = b0 & (enc0 < 0)
                    l1 = b1 & (enc1 < 0)
                    contig = (enc0 < 0) & (enc1 < 0) & (
                        (-enc1 - 1) == (-enc0 - 1) + cnt0)
                    both = l0 & l1 & contig
                    pending = jax.lax.cond(
                        both,
                        lambda p, j=j, enc0=enc0, cnt0=cnt0, cnt1=cnt1:
                            enqueue(2 * j, -enc0 - 1, cnt0 + cnt1, p,
                                    s2=2 * j + 1),
                        lambda p: p, pending)
                    pending = jax.lax.cond(
                        l0 & ~both,
                        lambda p, j=j, enc0=enc0, cnt0=cnt0:
                            enqueue(2 * j, -enc0 - 1, cnt0, p),
                        lambda p: p, pending)
                    pending = jax.lax.cond(
                        l1 & ~both,
                        lambda p, j=j, enc1=enc1, cnt1=cnt1:
                            enqueue(2 * j + 1, -enc1 - 1, cnt1, p),
                        lambda p: p, pending)
                else:
                    pending = jax.lax.cond(
                        b0 & (enc0 < 0),
                        lambda p, j=j, enc0=enc0, cnt0=cnt0:
                            enqueue(2 * j, -enc0 - 1, cnt0, p),
                        lambda p: p, pending)
                    pending = jax.lax.cond(
                        b1 & (enc1 < 0),
                        lambda p, j=j, enc1=enc1, cnt1=cnt1:
                            enqueue(2 * j + 1, -enc1 - 1, cnt1, p),
                        lambda p: p, pending)
                # internal -> stack, far first so the near child pops
                # first next step
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

            # --- drains: to below threshold; to empty when stack is ----
            def dcond(a):
                return (a[0] >= drain_min) | ((sp == 0) & (a[0] > 0))

            if probe != "nodrn":   # compile-bisect: skip the drain loop
                pending, hit_t, hit_id, hit_u, hit_v = jax.lax.while_loop(
                    dcond, drain, (pending, hit_t, hit_id, hit_u, hit_v))
            if any_hit:
                all_hit = jnp.all((hit_id >= 0) | dead)
                sp = jnp.where(all_hit, jnp.int32(0), sp)
                pending = jnp.where(all_hit, jnp.int32(0), pending)
            return steps + 1, sp, pending, hit_t, hit_id, hit_u, hit_v

        stack_ref[0] = jnp.int32(0)   # root
        zero = jnp.zeros(shape, jnp.float32)
        init = (jnp.int32(0), jnp.int32(1), jnp.int32(0),
                tx, jnp.full(shape, -1, jnp.int32), zero, zero)
        final = jax.lax.while_loop(cond, body, init)
        out_f[0: rows, :] = final[3]
        out_id[:, :] = final[4]
        out_f[rows: 2 * rows, :] = final[5]
        out_f[2 * rows: 3 * rows, :] = final[6]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "rows", "interpret", "vmem_limit",
                     "tris_per_row", "light", "drain_min", "merge_sibs",
                     "qgroup", "probe"),
)
def trace_packet_bdl(nodes8, tris12, orig, dirn, tmin, tmax, *,
                     any_hit: bool = False, rows: int = 16,
                     interpret: bool = False, vmem_limit: int = 0,
                     tris_per_row: int = TRIS_PER_ROW,
                     light: bool = False, drain_min: int = 0,
                     merge_sibs: bool = False, qgroup: int = 1,
                     probe: str = "none"):
    """Trace rays through a PackedBVH (nodes_per_row == 1) with the
    batched-node + deferred-leaf kernel.  Same contract as trace_packet:
    returns (hit_tri, t, u, v), hit_tri == -1 on miss; rays padded to
    whole rows*128 packets.

    drain_min: queued tri-rows required before drain steps fire
    (0 -> one per queue, i.e. expect a mostly-full tile); <= 64 so
    queue depth stays under QCAP.

    qgroup: ray rows per run queue (1 = per-row dleaf scheme).  Larger
    groups divide the per-leaf-event scalar push chain by qgroup; every
    row in a group tests the union of the group's queued runs (superset
    -> identical results).
    """
    if rows % 8 != 0 or rows > 64:
        # unlike dleaf's 1-bit-per-row int32 mask, the 16-bit-per-row /
        # 2-rows-per-int32 extraction scales to any row count; 64 is the
        # largest packet the VPU register budget plausibly tolerates
        raise ValueError("rows must be a multiple of 8, <= 64")
    if qgroup not in (1, 2, 4, 8, 16) or rows % qgroup != 0:
        raise ValueError("qgroup must be a power of two dividing rows")
    n_groups = rows // qgroup
    dmin = drain_min or n_groups
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
        pltpu.SMEM((n_groups * QCAP * 2 + 2,), jnp.int32),  # run queues + junk
        pltpu.SMEM((n_groups,), jnp.int32),                 # queue depths
        pltpu.SMEM((n_groups,), jnp.int32),                 # active run row
        pltpu.SMEM((n_groups,), jnp.int32),                 # active run left
    ]
    params = {}
    if not interpret:
        table_bytes = (nodes8.shape[0] + tris12.shape[0]) * 128 * 4
        limit = vmem_limit or min(table_bytes + (24 << 20), 127 << 20)
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=limit)
    outs = pl.pallas_call(
        _make_kernel(rows, any_hit, light, tris_per_row, dmin, merge_sibs,
                     qgroup, probe),
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
