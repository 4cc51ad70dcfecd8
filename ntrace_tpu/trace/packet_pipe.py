"""Software-pipelined while-while packet traversal (Pallas TPU kernel).

Reference contract: same as trace/packet_ww.py (the persistent while-while
kernels, SURVEY.md SS3.3). This schedule exists because the TPU core is
IN-ORDER with a static instruction schedule: interleaving independent
packets never paid in practice (PERF_NOTES.md round-2 findings) because a
long loop body compiles to serialized chains. What an in-order machine
does reward is classic SOFTWARE PIPELINING, done here by hand:

  node phase: the loop CARRIES the current node's row. Each iteration
    first issues the loads of ALL THREE possible next rows -- child0,
    child1, and the stack top (a step that pops cannot also have pushed,
    so the pre-step stack top is always the correct pop target) -- then
    does the slab tests / decision work on the carried row while those
    loads are in flight, and finally SELECTS the next carried row from
    the three prefetched ones. The ~130 ns VMEM load latency leaves the
    per-step critical path entirely.

  leaf phase: the loop carries (queue entry, its triangle row). The next
    entry is computable at the top of the body (run continues -> entry+31;
    run exhausted -> the queue slot below), so its row load issues before
    the Moller-Trumbore work on the carried row. The queue is never
    rewritten (the carried entry replaces the advance-in-place write).

Tables, encodings, and results are identical to trace/packet_ww.py
(bvh/packed.py layout; exact per-lane tests, lowest-tri-id tie-break).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntrace_tpu.bvh.packed import NODES_PER_ROW, TRIS_PER_ROW
from ntrace_tpu.ops.aabb import safe_inv_dir
from ntrace_tpu.trace.packet_common import (INF, mt_row_best, node_record,
                                            packet_signs, ray_views,
                                            slab_child, stage_rays)

STACK_DEPTH = 128
QCAP = 32
DONE = np.int32(0x40000000)
MAX_OUTER = 1 << 20


def _make_kernel(rows: int, any_hit: bool, light: bool, ilv: int,
                 tpr: int, npr: int, stats: bool):
    shape = (rows, 128)

    def kernel(nodes_ref, tris_ref, rays_ref, out_f, out_id, *rest):
        if stats:
            stats_ref, stack_ref, queue_ref = rest
        else:
            stack_ref, queue_ref = rest
        r = rows
        n_tri_rows = tris_ref.shape[0]
        max_node = nodes_ref.shape[0] * npr - 1
        views = ray_views(rays_ref, rows, ilv)
        signs = packet_signs(views)
        deads = [v[10] <= v[9] for v in views]

        def fetch_node(idx):
            return node_record(nodes_ref, jnp.clip(idx, 0, max_node), npr)

        def fetch_tri(entry):
            row = jnp.minimum(
                jax.lax.shift_right_logical(jnp.maximum(entry, 0), 5),
                n_tri_rows - 1)
            return tris_ref[pl.ds(row, 1), :]

        # ---- node phase: pipelined step of packet s ----------------------
        def node_step(s, item, rec, sp, qn, hit_t):
            ox, oy, oz, ix, iy, iz, _, _, _, tn, _ = views[s]
            act = (item != DONE) & (qn < QCAP - 2)
            sbase = s * (STACK_DEPTH + 1)
            qbase = s * (QCAP + 1)
            # 1. prefetch all possible next rows (issue FIRST; latency
            #    overlaps the slab/decision work below)
            enc0 = rec[0, 12].astype(jnp.int32)
            enc1 = rec[0, 13].astype(jnp.int32)
            cnt0 = rec[0, 14].astype(jnp.int32)
            cnt1 = rec[0, 15].astype(jnp.int32)
            top = stack_ref[sbase + jnp.maximum(sp - 1, 0)]
            rowA = fetch_node(enc0)
            rowB = fetch_node(enc1)
            rowS = fetch_node(top)
            # 2. compute on the carried row
            live_t = jnp.where(deads[s], -INF, hit_t) if any_hit else hit_t
            h0, _ = slab_child(rec, 0, ox, oy, oz, ix, iy, iz, tn, live_t)
            h1, _ = slab_child(rec, 6, ox, oy, oz, ix, iy, iz, tn, live_t)
            hv = h0.astype(jnp.int32) * 2 + h1.astype(jnp.int32)
            rr = rows
            while rr > 1:
                hv = jnp.bitwise_or(hv[: rr // 2], hv[rr // 2:])
                rr //= 2
            sh = 64
            while sh >= 1:
                hv = jnp.bitwise_or(hv, pltpu.roll(hv, sh, axis=1))
                sh //= 2
            hbits = hv[0, 0]
            any0 = (hbits >= 2) & act
            any1 = (jnp.bitwise_and(hbits, 1) > 0) & act
            leaf0 = enc0 < 0
            leaf1 = enc1 < 0
            i0 = any0 & jnp.logical_not(leaf0)
            i1 = any1 & jnp.logical_not(leaf1)
            l0 = any0 & leaf0
            l1 = any1 & leaf1
            q0 = -(enc0 + 1) * 32 + jnp.clip(cnt0 - 1, 0, 31)
            q1 = -(enc1 + 1) * 32 + jnp.clip(cnt1 - 1, 0, 31)
            qi0 = jnp.where(l0, jnp.minimum(qn, QCAP - 1), QCAP)
            queue_ref[qbase + qi0] = q0
            qn1 = qn + l0.astype(jnp.int32)
            qi1 = jnp.where(l1, jnp.minimum(qn1, QCAP - 1), QCAP)
            queue_ref[qbase + qi1] = q1
            qn2 = qn1 + l1.astype(jnp.int32)
            both = i0 & i1
            code_first0 = (jnp.bitwise_and(
                jax.lax.shift_right_logical(signs[s], cnt0 >> 1), 1
            ) == jnp.bitwise_and(cnt0, 1))
            first0 = jnp.where(both, code_first0, i0)
            near = jnp.where(first0, enc0, enc1)
            far = jnp.where(first0, enc1, enc0)
            widx = jnp.where(both, jnp.minimum(sp, STACK_DEPTH - 1),
                             STACK_DEPTH)
            stack_ref[sbase + widx] = far
            sp1 = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH), sp)
            desc = jnp.where(both, near, jnp.where(i0, enc0, enc1))
            need_pop = jnp.logical_not(i0 | i1)
            # a popping step never pushed, so `top`/`rowS` are the targets
            can_pop = sp > 0
            item2 = jnp.where(
                need_pop, jnp.where(can_pop, top, DONE), desc)
            sp2 = jnp.where(need_pop & can_pop, sp - 1, sp1)
            item2 = jnp.where(act, item2, item)
            sp2 = jnp.where(act, sp2, sp)
            # 3. select the next carried row from the prefetched ones
            take0 = item2 == jnp.where(leaf0, DONE - 1, enc0)
            take1 = item2 == jnp.where(leaf1, DONE - 1, enc1)
            rec2 = jnp.where(take0, rowA, jnp.where(take1, rowB, rowS))
            rec2 = jnp.where(act, rec2, rec)
            return item2, rec2, sp2, qn2

        # ---- leaf phase: pipelined step of packet s ----------------------
        def leaf_step(s, item, entry, trow, qn, hs):
            ox, oy, oz, _, _, _, dx, dy, dz, tn, _ = views[s]
            qbase = s * (QCAP + 1)
            act = qn > 0
            # 1. next entry + prefetch its row (issue first)
            rem = jnp.bitwise_and(jnp.maximum(entry, 0), 31)
            more = rem > 0
            qn2 = jnp.where(act & jnp.logical_not(more), qn - 1, qn)
            below = queue_ref[qbase + jnp.maximum(qn - 2, 0)]
            entry2 = jnp.where(more, entry + 31, below)
            trow2 = fetch_tri(entry2)
            # 2. Moller-Trumbore on the carried row
            bt, bid, bu, bv = mt_row_best(
                trow, ox, oy, oz, dx, dy, dz, tn, tpr, light)
            cur_t, cur_id, cur_u, cur_v = hs
            acc = act & ((bt < cur_t) | ((bt == cur_t) & (bid < cur_id)))
            cur_t = jnp.where(acc, bt, cur_t)
            cur_id = jnp.where(acc, bid, cur_id)
            if not light:
                cur_u = jnp.where(acc, bu, cur_u)
                cur_v = jnp.where(acc, bv, cur_v)
            if any_hit:
                finished = jnp.all((cur_id >= 0) | deads[s])
                qn2 = jnp.where(finished, 0, qn2)
                item = jnp.where(finished, DONE, item)
            entry2 = jnp.where(act, entry2, entry)
            trow2 = jnp.where(act, trow2, trow)
            return item, entry2, trow2, qn2, (cur_t, cur_id, cur_u, cur_v)

        # ---- phase loops -------------------------------------------------
        def node_loop(items, recs, sps, qns, hts, nsteps):
            def cond(c):
                items, _, _, qns = c[0], c[1], c[2], c[3]
                go = (items[0] != DONE) & (qns[0] < QCAP - 2)
                for s in range(1, ilv):
                    go = go | ((items[s] != DONE) & (qns[s] < QCAP - 2))
                return go

            def body(c):
                items, recs, sps, qns, n = c
                outs = [node_step(s, items[s], recs[s], sps[s], qns[s],
                                  hts[s]) for s in range(ilv)]
                return (tuple(o[0] for o in outs), tuple(o[1] for o in outs),
                        tuple(o[2] for o in outs), tuple(o[3] for o in outs),
                        n + 1)

            return jax.lax.while_loop(
                cond, body, (items, recs, sps, qns, nsteps))

        def leaf_loop(items, qns, hss, lsteps):
            entries = tuple(
                queue_ref[s * (QCAP + 1) + jnp.maximum(qns[s] - 1, 0)]
                for s in range(ilv))
            trows = tuple(fetch_tri(entries[s]) for s in range(ilv))

            def cond(c):
                qns = c[3]
                go = qns[0] > 0
                for s in range(1, ilv):
                    go = go | (qns[s] > 0)
                return go

            def body(c):
                items, entries, trows, qns, hss, n = c
                outs = [leaf_step(s, items[s], entries[s], trows[s], qns[s],
                                  hss[s]) for s in range(ilv)]
                return (tuple(o[0] for o in outs), tuple(o[1] for o in outs),
                        tuple(o[2] for o in outs), tuple(o[3] for o in outs),
                        tuple(o[4] for o in outs), n + 1)

            out = jax.lax.while_loop(
                cond, body, (items, entries, trows, qns, hss, lsteps))
            return out[0], out[3], out[4], out[5]

        def outer_cond(c):
            items, k = c[0], c[6]
            go = items[0] != DONE
            for s in range(1, ilv):
                go = go | (items[s] != DONE)
            return go & (k < MAX_OUTER)

        def outer_body(c):
            items, recs, sps, qns, hss, counts, k = c
            hts = tuple(h[0] for h in hss)
            items, recs, sps, qns, n = node_loop(items, recs, sps, qns, hts,
                                                 counts[0])
            items, qns, hss, m = leaf_loop(items, qns, hss, counts[1])
            return (items, recs, sps, qns, hss, (n, m), k + 1)

        zero = jnp.zeros(shape, jnp.float32)
        root = fetch_node(jnp.int32(0))
        init = (
            tuple(jnp.int32(0) for _ in range(ilv)),
            tuple(root for _ in range(ilv)),
            tuple(jnp.int32(0) for _ in range(ilv)),
            tuple(jnp.int32(0) for _ in range(ilv)),
            tuple((views[s][10], jnp.full(shape, -1, jnp.int32), zero, zero)
                  for s in range(ilv)),
            (jnp.int32(0), jnp.int32(0)),
            jnp.int32(0),
        )
        final = jax.lax.while_loop(outer_cond, outer_body, init)
        hss = final[4]
        for s in range(ilv):
            out_f[s * 3 * r: s * 3 * r + r, :] = hss[s][0]
            out_id[s * r: (s + 1) * r, :] = hss[s][1]
            out_f[s * 3 * r + r: s * 3 * r + 2 * r, :] = hss[s][2]
            out_f[s * 3 * r + 2 * r: s * 3 * r + 3 * r, :] = hss[s][3]
        if stats:
            lane = jax.lax.broadcasted_iota(jnp.int32, (ilv * rows, 128), 1)
            n, m = final[5]
            stats_ref[:] = jnp.where(lane == 0, n,
                                     jnp.where(lane == 1, m, 0))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "rows", "interpret", "vmem_limit",
                     "light", "interleave", "tris_per_row", "nodes_per_row",
                     "stats"),
)
def trace_packet_pipe(nodes8, tris12, orig, dirn, tmin, tmax, *,
                      any_hit: bool = False, rows: int = 8,
                      interpret: bool = False, vmem_limit: int = 0,
                      light: bool = False, interleave: int = 1,
                      tris_per_row: int = TRIS_PER_ROW,
                      nodes_per_row: int = NODES_PER_ROW,
                      stats: bool = False):
    """Trace rays with the software-pipelined while-while packet kernel.

    Same contract and tables as trace_packet_ww."""
    R = orig.shape[0]
    ilv = interleave
    rays_in, grid, _ = stage_rays(orig, dirn, tmin, tmax, rows, ilv,
                                  safe_inv_dir)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_spec = pl.BlockSpec((ilv * 11 * rows, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    outf_spec = pl.BlockSpec((ilv * 3 * rows, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    outi_spec = pl.BlockSpec((ilv * rows, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((grid * ilv * 3 * rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((grid * ilv * rows, 128), jnp.int32),
    ]
    out_specs = [outf_spec, outi_spec]
    if stats:
        out_shape.append(
            jax.ShapeDtypeStruct((grid * ilv * rows, 128), jnp.int32))
        out_specs.append(outi_spec)
    scratch = [pltpu.SMEM((ilv * (STACK_DEPTH + 1),), jnp.int32),
               pltpu.SMEM((ilv * (QCAP + 1),), jnp.int32)]
    params = {}
    if not interpret:
        table_bytes = (nodes8.shape[0] + tris12.shape[0]) * 128 * 4
        limit = vmem_limit or min(table_bytes + (24 << 20), 127 << 20)
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=limit,
        )
    outs = pl.pallas_call(
        _make_kernel(rows, any_hit, light, ilv, tris_per_row, nodes_per_row,
                     stats),
        grid=(grid,),
        in_specs=[table_spec, table_spec, in_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **params,
    )(nodes8, tris12, rays_in)
    tuv = outs[0].reshape(grid * ilv, 3, rows, 128)
    flat = lambda a: a.reshape(-1)[:R]
    result = (flat(outs[1]), flat(tuv[:, 0]), flat(tuv[:, 1]),
              flat(tuv[:, 2]))
    if stats:
        s = outs[2].reshape(grid * ilv, rows, 128)
        return result + (s[::ilv, 0, :2],)
    return result
