"""Speculative "if-if" packet traversal: a branch-free Pallas TPU kernel.

Reference contract: the speculative if-if CUDA kernels (expected
src/rt/kernels/fermi_speculative_while_while.cu and the tesla if-if
variants; SURVEY.md SS3.3) -- one uniform inner loop whose every iteration
executes BOTH the node phase and the leaf phase, with the inactive phase's
results masked out, so the warp never diverges on phase boundaries.

Why this exists on TPU (measured, scripts/chain_probe.py + packet_probe.py):
the cond-structured packet kernel (trace/packet_pallas.py) costs ~600-700 ns
per traversal unit and interleaving independent packets does NOT help,
because its `lax.cond` leaf phases are scalar-core branches that serialize
the whole pipeline. Branch-free chains, by contrast, overlap almost
perfectly (a pure load->extract chain runs 4 packets at the cost of one).
This kernel therefore has NO control flow in its step: the traversal stack
holds mixed work items (internal nodes OR leaf row runs), each step fetches
one node row AND one triangle row (the irrelevant one is garbage and its
results are select-masked), and packet interleaving actually pays.

Work item encoding (scalar int32, exact; the packed tables' float lanes
stay below 2**24 so their int decode is exact):
  item >= 0 : internal node index
  item <  0 : leaf rows; v = -item - 1, first row = v >> 5, v & 31 more
              rows follow after this one (row runs come from bvh/packed.py
              leaf encodings: enc lane -> first row, cnt lane -> span).
  item == DONE (0x40000000): packet finished.

Numerics match trace/packet_pallas.py exactly (same slab test, same
Moller-Trumbore with the lowest-tri-id tie-break) -- the two engines are
pixel-identical, only their schedules differ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntrace_tpu.bvh.packed import (NODE_LANES, NODES_PER_ROW, TRI_LANES,
                                   TRIS_PER_ROW)
from ntrace_tpu.ops.aabb import safe_inv_dir
from ntrace_tpu.trace.packet_pallas import _node_record, _slab_child

STACK_DEPTH = 128
INF = np.float32(3.0e38)
DONE = np.int32(0x40000000)
MAX_STEPS = 8_000_000  # malformed-tree backstop


def _make_kernel(rows: int, any_hit: bool, light: bool, ilv: int,
                 tpr: int, npr: int, stats: bool):
    shape = (rows, 128)

    def kernel(nodes_ref, tris_ref, rays_ref, out_f, out_id, *rest):
        if stats:
            stats_ref, stack_ref = rest
        else:
            (stack_ref,) = rest
        r = rows
        n_tri_rows = tris_ref.shape[0]
        views = []
        for s in range(ilv):
            b = s * 11 * r
            views.append(tuple(
                rays_ref[b + c * r: b + (c + 1) * r, :] for c in range(11)))

        signs = []
        deads = []
        for view in views:
            _, _, _, _, _, _, dx, dy, dz, tn, tx = view
            signs.append((jnp.sum(dx) >= 0).astype(jnp.int32)
                         | ((jnp.sum(dy) >= 0).astype(jnp.int32) << 1)
                         | ((jnp.sum(dz) >= 0).astype(jnp.int32) << 2))
            deads.append(tx <= tn)

        def step_packet(s, item, sp, hit_t, hit_id, hit_u, hit_v, lr_count):
            ox, oy, oz, ix, iy, iz, dx, dy, dz, tn, tx = views[s]
            dead = deads[s]
            sbase = s * (STACK_DEPTH + 1)
            is_done = item == DONE
            is_leaf = item < 0
            lv = -jnp.minimum(item, -1) - 1      # leaf decode (garbage if node)
            leaf_row = jnp.minimum(
                jax.lax.shift_right_logical(lv, 5), n_tri_rows - 1)
            leaf_rem = jnp.bitwise_and(lv, 31)

            # --- node phase (garbage when is_leaf/is_done; masked below) ---
            nidx = jnp.clip(item, 0, nodes_ref.shape[0] * npr - 1)
            rec = _node_record(nodes_ref, nidx, npr)
            live_t = jnp.where(dead, -INF, hit_t) if any_hit else hit_t
            rln = lambda c: rec[0, c]  # scalar lane accessor (see _slab_child)
            h0, _ = _slab_child(rln, 0, ox, oy, oz, ix, iy, iz, tn, live_t)
            h1, _ = _slab_child(rln, 6, ox, oy, oz, ix, iy, iz, tn, live_t)
            hs_sum = jnp.sum(h0.astype(jnp.int32) << 16
                             | h1.astype(jnp.int32))
            enc0 = rec[0, 12].astype(jnp.int32)
            enc1 = rec[0, 13].astype(jnp.int32)
            cnt0 = rec[0, 14].astype(jnp.int32)
            cnt1 = rec[0, 15].astype(jnp.int32)
            leaf0 = enc0 < 0
            leaf1 = enc1 < 0
            any0 = (hs_sum >= (1 << 16)) & jnp.logical_not(is_leaf) & jnp.logical_not(is_done)
            any1 = ((hs_sum & 0xFFFF) > 0) & jnp.logical_not(is_leaf) & jnp.logical_not(is_done)
            # child -> work item (int arithmetic on exact float lanes)
            it0 = jnp.where(
                leaf0,
                -(jax.lax.shift_left(-enc0 - 1, 5)
                  | jnp.clip(cnt0 - 1, 0, 31)) - 1,
                enc0)
            it1 = jnp.where(
                leaf1,
                -(jax.lax.shift_left(-enc1 - 1, 5)
                  | jnp.clip(cnt1 - 1, 0, 31)) - 1,
                enc1)
            # near-first: pack-time order code when both internal (lane 14
            # holds it exactly then); leaf-first when mixed (immediate hitT
            # shrink); child0 when both leaves.
            both_internal = jnp.logical_not(leaf0) & jnp.logical_not(leaf1)
            code_first0 = (jnp.bitwise_and(
                jax.lax.shift_right_logical(signs[s], cnt0 >> 1), 1
            ) == jnp.bitwise_and(cnt0, 1))
            first0 = jnp.where(both_internal, code_first0, leaf0)
            both = any0 & any1
            near = jnp.where(first0, it0, it1)
            far = jnp.where(first0, it1, it0)

            # --- leaf phase (garbage when node; masked into hit state) ----
            trow = tris_ref[pl.ds(leaf_row, 1), :]
            cands = []
            for jj in range(tpr):
                b = TRI_LANES * jj
                v0x, v0y, v0z = trow[0, b + 0], trow[0, b + 1], trow[0, b + 2]
                e1x, e1y, e1z = trow[0, b + 3], trow[0, b + 4], trow[0, b + 5]
                e2x, e2y, e2z = trow[0, b + 6], trow[0, b + 7], trow[0, b + 8]
                tid = trow[0, b + 9].astype(jnp.int32)
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
                    take = (bnd[0] < a[0]) | ((bnd[0] == a[0])
                                              & (bnd[1] < a[1]))
                    nxt.append(tuple(
                        jnp.where(take, bnd[i], a[i])
                        for i in range(2 if light else 4)))
                if len(cands) % 2:
                    nxt.append(cands[-1])
                cands = nxt
            bt, bid = cands[0][0], cands[0][1]
            # Strict t < hitT + lowest-id tie-break: packet-order invariant.
            acc = is_leaf & ((bt < hit_t) | ((bt == hit_t) & (bid < hit_id)))
            hit_t = jnp.where(acc, bt, hit_t)
            hit_id = jnp.where(acc, bid, hit_id)
            if not light:
                hit_u = jnp.where(acc, cands[0][2], hit_u)
                hit_v = jnp.where(acc, cands[0][3], hit_v)

            # --- merge: stack ops and the next item, all branch-free ------
            # push slot STACK_DEPTH is the dump slot for non-pushing steps.
            widx = jnp.where(both, jnp.minimum(sp, STACK_DEPTH - 1),
                             STACK_DEPTH)
            stack_ref[sbase + widx] = far
            sp1 = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH), sp)
            desc = jnp.where(both, near,
                             jnp.where(any0, it0, jnp.where(any1, it1, DONE)))
            more_leaf = is_leaf & (leaf_rem > 0)
            need_pop = jnp.where(is_leaf, leaf_rem == 0,
                                 jnp.logical_not(any0 | any1))
            can_pop = sp1 > 0
            popped = stack_ref[sbase + jnp.maximum(sp1 - 1, 0)]
            nxt_item = jnp.where(
                more_leaf, item - 31,
                jnp.where(need_pop, jnp.where(can_pop, popped, DONE), desc))
            nxt_item = jnp.where(is_done, DONE, nxt_item)
            sp2 = jnp.where(need_pop & can_pop & jnp.logical_not(is_done),
                            sp1 - 1, sp1)
            if any_hit:
                nxt_item = jnp.where(jnp.all((hit_id >= 0) | dead),
                                     DONE, nxt_item)
            lr_count = lr_count + is_leaf.astype(jnp.int32)
            return nxt_item, sp2, hit_t, hit_id, hit_u, hit_v, lr_count

        def cond(c):
            steps, items = c[0], c[1]
            alive = items[0] != DONE
            for s in range(1, ilv):
                alive = alive | (items[s] != DONE)
            return alive & (steps < MAX_STEPS)

        def body(c):
            steps, items, sps, hts, hids, hus, hvs, lrs = c
            outs = [step_packet(s, items[s], sps[s], hts[s], hids[s],
                                hus[s], hvs[s], lrs[s]) for s in range(ilv)]
            return (steps + 1,) + tuple(
                tuple(o[k] for o in outs) for k in range(7))

        zero = jnp.zeros(shape, jnp.float32)
        init = (
            jnp.int32(0),
            tuple(jnp.int32(0) for _ in range(ilv)),
            tuple(jnp.int32(0) for _ in range(ilv)),
            tuple(v[10] for v in views),
            tuple(jnp.full(shape, -1, jnp.int32) for _ in range(ilv)),
            tuple(zero for _ in range(ilv)),
            tuple(zero for _ in range(ilv)),
            tuple(jnp.int32(0) for _ in range(ilv)),
        )
        final = jax.lax.while_loop(cond, body, init)
        for s in range(ilv):
            out_f[s * 3 * r: s * 3 * r + r, :] = final[3][s]
            out_id[s * r: (s + 1) * r, :] = final[4][s]
            out_f[s * 3 * r + r: s * 3 * r + 2 * r, :] = final[5][s]
            out_f[s * 3 * r + 2 * r: s * 3 * r + 3 * r, :] = final[6][s]
        if stats:
            # per packet: lane 0 = total group steps, lane 1 = leaf rows.
            lane = jax.lax.broadcasted_iota(jnp.int32, (ilv * rows, 128), 1)
            leafv = jnp.concatenate(
                [jnp.full(shape, final[7][s], jnp.int32) for s in range(ilv)])
            stats_ref[:] = jnp.where(
                lane == 0, final[0], jnp.where(lane == 1, leafv, 0))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "rows", "interpret", "vmem_limit",
                     "light", "interleave", "tris_per_row", "nodes_per_row",
                     "stats"),
)
def trace_packet_ifif(nodes8, tris12, orig, dirn, tmin, tmax, *,
                      any_hit: bool = False, rows: int = 8,
                      interpret: bool = False, vmem_limit: int = 0,
                      light: bool = False, interleave: int = 1,
                      tris_per_row: int = TRIS_PER_ROW,
                      nodes_per_row: int = NODES_PER_ROW,
                      stats: bool = False):
    """Trace rays with the branch-free if-if packet kernel.

    Same contract as trace_packet (trace/packet_pallas.py): returns
    (hit_tri, hit_t, u, v); with stats=True appends a (packets, 2) array of
    [group steps, leaf rows] per packet.
    """
    R = orig.shape[0]
    ilv = interleave
    packet = rows * 128 * ilv
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
    rays_in = comps.reshape(grid * ilv * 11 * rows, 128)
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
    scratch = [pltpu.SMEM((ilv * (STACK_DEPTH + 1),), jnp.int32)]
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
        return result + (s[:, 0, :2],)
    return result
