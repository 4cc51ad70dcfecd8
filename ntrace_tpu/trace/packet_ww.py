"""Phase-separated "while-while" packet traversal: branch-free Pallas kernel.

Reference contract: the while-while persistent CUDA kernels (expected
src/rt/kernels/fermi_speculative_while_while.cu, tesla_persistent_while_while
.cu; SURVEY.md SS3.3): an inner node loop that traverses until leaves
accumulate, then a leaf loop that intersects them, repeated until the ray
set is done.

TPU schedule rationale (measured; scripts/chain_probe.py, packet_probe.py):
  - the cond-structured kernel (trace/packet_pallas.py) serializes on its
    lax.cond leaf phases: interleaving independent packets does not overlap
    their ~600 ns serial chains;
  - the branch-free speculative if-if kernel (trace/packet_ifif.py) fixes
    the serialization but pays BOTH phases' VPU work on every step, so it
    is VPU-throughput-bound instead.
This kernel does neither: the node loop runs ONLY slab work, the leaf loop
runs ONLY Moller-Trumbore work, both loops are branch-free (conditional
stack/queue effects use computed-index dump-slot writes, never lax.cond),
and `interleave` packets run in lockstep phases so their load->extract
chains overlap inside each loop.

Per packet: an SMEM node stack plus an SMEM leaf queue of row-run entries
(entry = first_row * 32 + rows_remaining, decoded from bvh/packed.py's enc
and cnt lanes at push time -- both float lanes are exact below 2**24). The
node loop pauses when the queue nears capacity; the leaf loop drains it;
hitT shrinks with at most a queue's worth of lag, which keeps the slab
culling close to the cond kernel's inline shrink.

Results are pixel-identical to the other packet engines (same slab test,
same MT with lowest-tri-id tie-break; superset-invariant acceptance).
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
QCAP = 32                       # leaf-queue entries per packet
DONE = np.int32(0x40000000)
MAX_OUTER = 1 << 20             # malformed-tree backstop


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

        # ---- node phase: one masked traversal step of packet s ----------
        def node_step(s, item, sp, qn, hit_t):
            ox, oy, oz, ix, iy, iz, _, _, _, tn, _ = views[s]
            act = (item != DONE) & (qn < QCAP - 2)
            sbase = s * (STACK_DEPTH + 1)
            qbase = s * (QCAP + 1)
            rec = node_record(nodes_ref, jnp.clip(item, 0, max_node), npr)
            live_t = jnp.where(deads[s], -INF, hit_t) if any_hit else hit_t
            h0, _ = slab_child(rec, 0, ox, oy, oz, ix, iy, iz, tn, live_t)
            h1, _ = slab_child(rec, 6, ox, oy, oz, ix, iy, iz, tn, live_t)
            hs_sum = jnp.sum(h0.astype(jnp.int32) << 16
                             | h1.astype(jnp.int32))
            any0 = (hs_sum >= (1 << 16)) & act
            any1 = ((hs_sum & 0xFFFF) > 0) & act
            enc0 = rec[0, 12].astype(jnp.int32)
            enc1 = rec[0, 13].astype(jnp.int32)
            cnt0 = rec[0, 14].astype(jnp.int32)
            cnt1 = rec[0, 15].astype(jnp.int32)
            leaf0 = enc0 < 0
            leaf1 = enc1 < 0
            i0 = any0 & jnp.logical_not(leaf0)   # internal hit children
            i1 = any1 & jnp.logical_not(leaf1)
            l0 = any0 & leaf0                    # leaf hit children
            l1 = any1 & leaf1
            # queue pushes (dump-slot writes when not pushing)
            q0 = -(enc0 + 1) * 32 + jnp.clip(cnt0 - 1, 0, 31)
            q1 = -(enc1 + 1) * 32 + jnp.clip(cnt1 - 1, 0, 31)
            qi0 = jnp.where(l0, jnp.minimum(qn, QCAP - 1), QCAP)
            queue_ref[qbase + qi0] = q0
            qn1 = qn + l0.astype(jnp.int32)
            qi1 = jnp.where(l1, jnp.minimum(qn1, QCAP - 1), QCAP)
            queue_ref[qbase + qi1] = q1
            qn2 = qn1 + l1.astype(jnp.int32)
            # stack push / descend among internal children
            both = i0 & i1
            code_first0 = (jnp.bitwise_and(
                jax.lax.shift_right_logical(signs[s], cnt0 >> 1), 1
            ) == jnp.bitwise_and(cnt0, 1))
            near = jnp.where(code_first0, enc0, enc1)
            far = jnp.where(code_first0, enc1, enc0)
            widx = jnp.where(both, jnp.minimum(sp, STACK_DEPTH - 1),
                             STACK_DEPTH)
            stack_ref[sbase + widx] = far
            sp1 = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH), sp)
            desc = jnp.where(both, near, jnp.where(i0, enc0, enc1))
            need_pop = jnp.logical_not(i0 | i1)
            can_pop = sp1 > 0
            popped = stack_ref[sbase + jnp.maximum(sp1 - 1, 0)]
            item2 = jnp.where(
                need_pop, jnp.where(can_pop, popped, DONE), desc)
            sp2 = jnp.where(need_pop & can_pop, sp1 - 1, sp1)
            item2 = jnp.where(act, item2, item)
            sp2 = jnp.where(act, sp2, sp)
            return item2, sp2, qn2

        # ---- leaf phase: intersect one queued row of packet s -----------
        def leaf_step(s, item, qn, hs):
            ox, oy, oz, _, _, _, dx, dy, dz, tn, _ = views[s]
            qbase = s * (QCAP + 1)
            act = qn > 0
            entry = queue_ref[qbase + jnp.maximum(qn - 1, 0)]
            row = jnp.minimum(
                jax.lax.shift_right_logical(entry, 5), n_tri_rows - 1)
            rem = jnp.bitwise_and(entry, 31)
            trow = tris_ref[pl.ds(row, 1), :]
            bt, bid, bu, bv = mt_row_best(
                trow, ox, oy, oz, dx, dy, dz, tn, tpr, light)
            cur_t, cur_id, cur_u, cur_v = hs
            acc = act & ((bt < cur_t) | ((bt == cur_t) & (bid < cur_id)))
            cur_t = jnp.where(acc, bt, cur_t)
            cur_id = jnp.where(acc, bid, cur_id)
            if not light:
                cur_u = jnp.where(acc, bu, cur_u)
                cur_v = jnp.where(acc, bv, cur_v)
            adv = act & (rem > 0)
            widx = jnp.where(adv, jnp.maximum(qn - 1, 0), QCAP)
            queue_ref[qbase + widx] = entry + 31   # row+1, rem-1
            qn2 = jnp.where(act & (rem == 0), qn - 1, qn)
            if any_hit:
                finished = jnp.all((cur_id >= 0) | deads[s])
                qn2 = jnp.where(finished, 0, qn2)
                item = jnp.where(finished, DONE, item)
            return item, qn2, (cur_t, cur_id, cur_u, cur_v)

        # ---- phase loops over the interleaved group ----------------------
        def node_loop(items, sps, qns, hts, nsteps):
            def cond(c):
                items, _, qns = c[0], c[1], c[2]
                go = (items[0] != DONE) & (qns[0] < QCAP - 2)
                for s in range(1, ilv):
                    go = go | ((items[s] != DONE) & (qns[s] < QCAP - 2))
                return go

            def body(c):
                items, sps, qns, n = c
                outs = [node_step(s, items[s], sps[s], qns[s], hts[s])
                        for s in range(ilv)]
                return (tuple(o[0] for o in outs), tuple(o[1] for o in outs),
                        tuple(o[2] for o in outs), n + 1)

            return jax.lax.while_loop(cond, body, (items, sps, qns, nsteps))

        def leaf_loop(items, qns, hss, lsteps):
            def cond(c):
                qns = c[1]
                go = qns[0] > 0
                for s in range(1, ilv):
                    go = go | (qns[s] > 0)
                return go

            def body(c):
                items, qns, hss, n = c
                outs = [leaf_step(s, items[s], qns[s], hss[s])
                        for s in range(ilv)]
                return (tuple(o[0] for o in outs), tuple(o[1] for o in outs),
                        tuple(o[2] for o in outs), n + 1)

            return jax.lax.while_loop(cond, body, (items, qns, hss, lsteps))

        def outer_cond(c):
            items, qns, k = c[0], c[2], c[5]
            go = items[0] != DONE
            for s in range(1, ilv):
                go = go | (items[s] != DONE)
            return go & (k < MAX_OUTER)

        def outer_body(c):
            items, sps, qns, hss, counts, k = c
            hts = tuple(h[0] for h in hss)
            items, sps, qns, n = node_loop(items, sps, qns, hts, counts[0])
            items, qns, hss, m = leaf_loop(items, qns, hss, counts[1])
            return (items, sps, qns, hss, (n, m), k + 1)

        zero = jnp.zeros(shape, jnp.float32)
        init = (
            tuple(jnp.int32(0) for _ in range(ilv)),
            tuple(jnp.int32(0) for _ in range(ilv)),
            tuple(jnp.int32(0) for _ in range(ilv)),
            tuple((views[s][10], jnp.full(shape, -1, jnp.int32), zero, zero)
                  for s in range(ilv)),
            (jnp.int32(0), jnp.int32(0)),
            jnp.int32(0),
        )
        final = jax.lax.while_loop(outer_cond, outer_body, init)
        hss = final[3]
        for s in range(ilv):
            out_f[s * 3 * r: s * 3 * r + r, :] = hss[s][0]
            out_id[s * r: (s + 1) * r, :] = hss[s][1]
            out_f[s * 3 * r + r: s * 3 * r + 2 * r, :] = hss[s][2]
            out_f[s * 3 * r + 2 * r: s * 3 * r + 3 * r, :] = hss[s][3]
        if stats:
            lane = jax.lax.broadcasted_iota(jnp.int32, (ilv * rows, 128), 1)
            n, m = final[4]
            stats_ref[:] = jnp.where(lane == 0, n,
                                     jnp.where(lane == 1, m, 0))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "rows", "interpret", "vmem_limit",
                     "light", "interleave", "tris_per_row", "nodes_per_row",
                     "stats"),
)
def trace_packet_ww(nodes8, tris12, orig, dirn, tmin, tmax, *,
                    any_hit: bool = False, rows: int = 8,
                    interpret: bool = False, vmem_limit: int = 0,
                    light: bool = False, interleave: int = 1,
                    tris_per_row: int = TRIS_PER_ROW,
                    nodes_per_row: int = NODES_PER_ROW,
                    stats: bool = False):
    """Trace rays with the phase-separated while-while packet kernel.

    Same contract as trace_packet (trace/packet_pallas.py). stats=True
    appends a (packet_groups, 2) array of [node steps, leaf steps] per
    interleave GROUP (phase loops are shared across the group).
    """
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
