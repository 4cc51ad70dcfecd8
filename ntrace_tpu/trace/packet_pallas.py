"""Packet traversal: a Pallas TPU kernel, one shared stack per VPU tile.

Reference contract: the persistent packet/while-while CUDA kernels (expected
src/rt/kernels/tesla_persistent_packet.cu, fermi_speculative_while_while.cu;
SURVEY.md SS3.3) -- per-warp shared traversal with slab tests, near-child
ordering, leaf triangle tests that shrink hitT, any-hit early out.

TPU redesign (NOT a translation): a CUDA warp of 32 rays sharing a stack
becomes a VPU tile of `rows`*128 rays (1024+) sharing ONE traversal stack in
SMEM. Every node fetch is then a *scalar*-indexed row load from a
VMEM-resident packed table (bvh/packed.py) broadcast to all lanes -- the
per-lane HBM gather that capped the XLA lockstep engines at ~38 ns/ray-step
(PERF_NOTES.md) never happens. The packet visits the union of nodes its rays
want; screen-coherent ray order (ray/pixeltable.py Morton order) keeps that
union tight, exactly like packet tracing on GPUs.

Hot-loop design rules (all measured on v5e; PERF_NOTES.md "packet step
anatomy"):
  - hit state (t/id/u/v tiles) lives in while-loop CARRIES (vector
    registers), not refs: a leaf's VMEM write followed by the next step's
    VMEM read serializes the pipeline (~600 ns/step); value-carried state
    runs at tens of ns/step.
  - vreg->sreg scalar extracts are ~free; per-lane broadcasts of extracted
    scalars are free inside arithmetic.
  - leaf phases are value-returning lax.cond branches, outputs are written
    exactly once after the loop.

Per step:
  inner: fetch one node record, slab-test BOTH children on all lanes (VPU),
         reduce to per-child any-hit (+ nearest-entry) scalars, descend the
         nearer hit child, push the farther, pop on miss.
  leaf : fetch 12-triangle rows, unrolled Moller-Trumbore on all lanes,
         closest-hit update with a lowest-index tie-break (order-independent
         results; see ops/intersect.py conventions).

Numerics match ops/aabb.py slab_test + ops/intersect.py moller_trumbore.
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
from ntrace_tpu.trace.packet_common import rep_rows

STACK_DEPTH = 128
INF = np.float32(3.0e38)
MAX_STEPS = 4_000_000  # malformed-tree backstop, far above any real trace


def _node_record(nodes_ref, node, npr: int):
    """(1, 128) with node's 16 lanes rolled to the front; scalar `node`.

    npr == 1 (one record per row) needs no roll at all -- the roll was
    +68 ns of the inner step's serial chain (scripts/chain_probe.py)."""
    if npr == 1:
        return nodes_ref[pl.ds(node, 1), :]
    shift_rows = npr.bit_length() - 1
    row = nodes_ref[pl.ds(jax.lax.shift_right_logical(node, shift_rows), 1), :]
    j = jnp.bitwise_and(node, npr - 1)
    shift = jnp.bitwise_and(128 - NODE_LANES * j, 127)
    return pltpu.roll(row, shift, axis=1)


def _slab_child(ln, base, ox, oy, oz, ix, iy, iz, tmin, tmax):
    """Slab-test one child whose 6 bounds start at lane `base` of the node
    record; `ln(c)` yields lane c as a scalar or a (rows, 1) lane slice
    (slabbc mode -- vector-pipe operand broadcast, bit-identical values).

    Matches ops/aabb.py slab_test: NaN-suppressing min/max, entry clamped
    to tmin, exit clamped to the per-lane running hitT.
    Returns (hit lanes, entry t lanes).
    """
    tlo_x = (ln(base + 0) - ox) * ix
    thi_x = (ln(base + 1) - ox) * ix
    tlo_y = (ln(base + 2) - oy) * iy
    thi_y = (ln(base + 3) - oy) * iy
    tlo_z = (ln(base + 4) - oz) * iz
    thi_z = (ln(base + 5) - oz) * iz
    begin = jnp.fmax(
        jnp.fmax(jnp.fmin(tlo_x, thi_x), jnp.fmin(tlo_y, thi_y)),
        jnp.fmax(jnp.fmin(tlo_z, thi_z), tmin),
    )
    end = jnp.fmin(
        jnp.fmin(jnp.fmax(tlo_x, thi_x), jnp.fmax(tlo_y, thi_y)),
        jnp.fmin(jnp.fmax(tlo_z, thi_z), tmax),
    )
    return begin <= end, begin


def _make_kernel(rows: int, any_hit: bool, stats: bool = False,
                 order: str = "mins", light: bool = False, ilv: int = 1,
                 probe: str = "none", tpr: int = TRIS_PER_ROW,
                 npr: int = NODES_PER_ROW, lu: int = 1,
                 anyred: str = "sum", leafbc: bool = False,
                 slabbc: bool = False):
    """Build the packet kernel body.

    ilv > 1 interleaves that many INDEPENDENT packets (each with its own
    stack, hit state, and current node) inside one program: the per-step
    serial chain (row load -> roll -> extracts -> slab -> reduce) is
    latency-bound (~365 ns, PERF_NOTES.md "packet step anatomy"), so the
    chains of different packets overlap in the pipeline nearly for free.
    The group steps until its slowest packet finishes; screen-Morton ray
    order keeps sibling packets' work similar.
    """
    assert not (stats and ilv != 1), "stats mode is single-packet only"
    shape = (rows, 128)

    def kernel(nodes_ref, tris_ref, rays_ref, out_f, out_id, *rest):
        if stats:
            stats_ref, stack_ref, ctr_ref = rest
            ctr_ref[0] = jnp.int32(0)
        else:
            (stack_ref,) = rest
        r = rows
        views = []
        for s in range(ilv):
            b = s * 11 * r
            views.append(tuple(
                rays_ref[b + c * r: b + (c + 1) * r, :] for c in range(11)))

        def make_leaf_rows(view):
            ox, oy, oz, _, _, _, dx, dy, dz, tn, _ = view

            def leaf_rows(row0, nrows, hs):
                """Moller-Trumbore over `nrows` 12-slot rows; value-carried.

                The 12 per-slot tests are independent; their results merge
                through a BALANCED tree of (t, id) selects (depth 4) instead
                of a 12-long sequential fold -- the fold was the serial chain
                that made a leaf row cost ~1 us (packet_probe.py).

                lu > 1 unrolls the row loop: the per-row serial cost is row
                LOAD LATENCY, not VPU work (PERF_NOTES.md packet anatomy),
                and consecutive rows' loads are independent, so issuing lu
                loads per iteration hides all but the first. Stray rows past
                the run's end are a neighbour leaf's real triangles (dense
                packing) or all-zero pad rows -- both closest-hit-safe."""
                def lbody(k, hs):
                    if stats:
                        ctr_ref[0] = ctr_ref[0] + 1
                    cur_t, cur_id, cur_u, cur_v = hs
                    # Rows may straddle leaves (bvh/packed.py); testing a
                    # neighbour leaf's real triangles is safe: the closest-
                    # hit update + tie-break is superset-invariant.
                    trows = [tris_ref[pl.ds(row0 + k * lu + u_i, 1), :]
                             for u_i in range(lu)]
                    cands = []
                    for u_i in range(lu):
                        trow = trows[u_i]
                        if leafbc:
                            # VECTOR-pipe operand broadcast: the ~10*tpr
                            # scalar lane extracts per row are the leaf
                            # phase's measured serial binder (~2.7 ns each,
                            # single in-order scalar pipe, no overlap --
                            # PERF_NOTES "round-2 kernel-structure").
                            # Replicate the row across sublanes ONCE, then
                            # every constant is a (rows, 1) static lane
                            # slice that lane-broadcasts inside the MT
                            # arithmetic -- permute/VPU work that pipelines
                            # with the tests instead of serializing before
                            # them. Values are bit-identical: same fp32
                            # elementwise ops, operands merely vector-
                            # shaped. (concat, not broadcast_to: the
                            # latter crashes the TPU backend compiler on
                            # dynamic rows -- packet_common.rep_rows.)
                            tb = rep_rows(trow, rows)
                            ln = lambda c: tb[:, c: c + 1]
                        else:
                            ln = lambda c: trow[0, c]
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
                            valid = (
                                (det != 0) & (tid >= 0)
                                & (u >= 0) & (v >= 0) & (u + v <= 1)
                                & (t > tn)
                            )
                            # Invalid slots become (t=INF, id=INT_MAX): never
                            # accepted -- acceptance below needs strict t < cur_t
                            # or a tie won on a SMALLER id.
                            cands.append((
                                jnp.where(valid, t, INF),
                                jnp.where(valid, tid, jnp.int32(0x7FFFFFFF)),
                                u, v,
                            ))
                    while len(cands) > 1:
                        nxt = []
                        for a, bnd in zip(cands[0::2], cands[1::2]):
                            take = (bnd[0] < a[0]) | ((bnd[0] == a[0])
                                                      & (bnd[1] < a[1]))
                            nxt.append(tuple(
                                jnp.where(take, bnd[i], a[i])
                                for i in range(2 if light else 4)
                            ))
                        if len(cands) % 2:
                            nxt.append(cands[-1])
                        cands = nxt
                    bt, bid = cands[0][0], cands[0][1]
                    # Strict t < hitT plus lowest-tri-id tie-break: results
                    # do not depend on packet visit order.
                    acc = (bt < cur_t) | ((bt == cur_t) & (bid < cur_id))
                    cur_t = jnp.where(acc, bt, cur_t)
                    cur_id = jnp.where(acc, bid, cur_id)
                    if not light:
                        cur_u = jnp.where(acc, cands[0][2], cur_u)
                        cur_v = jnp.where(acc, cands[0][3], cur_v)
                    return cur_t, cur_id, cur_u, cur_v

                n_it = nrows if lu == 1 else (nrows + (lu - 1)) // lu
                return jax.lax.fori_loop(0, n_it, lbody, hs)

            return leaf_rows

        leaf_fns = [make_leaf_rows(v) for v in views]
        # Packet-mean direction signs steer near-child ordering in "code"
        # mode (one-time reduces replacing per-step near-t min-reduces).
        signs = []
        deads = []
        for view in views:
            _, _, _, _, _, _, dx, dy, dz, tn, tx = view
            signs.append((jnp.sum(dx) >= 0).astype(jnp.int32)
                         | ((jnp.sum(dy) >= 0).astype(jnp.int32) << 1)
                         | ((jnp.sum(dz) >= 0).astype(jnp.int32) << 2))
            deads.append(tx <= tn)  # padding / pre-killed rays

        def cond(c):
            steps, nodes = c[0], c[1]
            alive = nodes[0] >= 0
            for s in range(1, ilv):
                alive = alive | (nodes[s] >= 0)
            return alive & (steps < MAX_STEPS)

        def step_packet(s, node, sp, hit_t, hit_id, hit_u, hit_v):
            """One traversal step of packet s; node == -1 means finished
            (the step still executes but all its updates are masked)."""
            ox, oy, oz, ix, iy, iz, dx, dy, dz, tn, tx = views[s]
            dead = deads[s]
            active = node >= 0
            rec = _node_record(nodes_ref, jnp.maximum(node, 0), npr)
            if slabbc:
                recb = rep_rows(rec, rows)
                rln = lambda c: recb[:, c: c + 1]
            else:
                rln = lambda c: rec[0, c]
            live_t = jnp.where(dead, -INF, hit_t) if any_hit else hit_t
            h0, t0 = _slab_child(rln, 0, ox, oy, oz, ix, iy, iz, tn, live_t)
            h1, t1 = _slab_child(rln, 6, ox, oy, oz, ix, iy, iz, tn, live_t)
            if order == "mins":
                n0 = jnp.min(jnp.where(h0, t0, INF))
                n1 = jnp.min(jnp.where(h1, t1, INF))
                any0 = (n0 < INF) & active
                any1 = (n1 < INF) & active
                first0 = n0 <= n1
            elif anyred == "or":
                # any-hit via a bitwise-OR roll tree + one plain lane
                # extract: candidates for replacing jnp.sum's cross-lane
                # reduce (+115 ns of the step's serial chain -- likely the
                # vector->scalar boundary of the reduction instruction).
                m = h0.astype(jnp.int32) | (h1.astype(jnp.int32) << 1)
                for sh in (64, 32, 16, 8, 4, 2, 1):
                    m = m | pltpu.roll(m, sh, axis=1)
                sh = 1
                while sh < rows:
                    m = m | pltpu.roll(m, sh, axis=0)
                    sh *= 2
                bits = m[0, 0]
                any0 = ((bits & 1) > 0) & active
                any1 = ((bits & 2) > 0) & active
                code = rec[0, 14].astype(jnp.int32)
                first0 = (jnp.bitwise_and(
                    jax.lax.shift_right_logical(signs[s], code >> 1), 1
                ) == jnp.bitwise_and(code, 1))
            else:
                # One reduce yields both children's any-hit flags
                # (bit-packed; lane count < 2**16 keeps the fields apart),
                # near-first order comes from the pack-time order code
                # (lane 14 = axis*2 + low-side bit; present exactly when
                # both children are internal, the only case it's read).
                hs_sum = jnp.sum(h0.astype(jnp.int32) << 16
                                 | h1.astype(jnp.int32))
                any0 = (hs_sum >= (1 << 16)) & active
                any1 = ((hs_sum & 0xFFFF) > 0) & active
                code = rec[0, 14].astype(jnp.int32)
                first0 = (jnp.bitwise_and(
                    jax.lax.shift_right_logical(signs[s], code >> 1), 1
                ) == jnp.bitwise_and(code, 1))
            enc0 = rec[0, 12].astype(jnp.int32)
            enc1 = rec[0, 13].astype(jnp.int32)
            leaf0 = enc0 < 0
            leaf1 = enc1 < 0

            hs = (hit_t, hit_id, hit_u, hit_v)
            if probe == "none":        # real kernel
                hs = jax.lax.cond(
                    any0 & leaf0,
                    lambda hs: leaf_fns[s](-enc0 - 1, rec[0, 14].astype(jnp.int32), hs),
                    lambda hs: hs, hs,
                )
                hs = jax.lax.cond(
                    any1 & leaf1,
                    lambda hs: leaf_fns[s](-enc1 - 1, rec[0, 15].astype(jnp.int32), hs),
                    lambda hs: hs, hs,
                )
            elif probe == "noleafwork":  # WRONG results: conds taken, MT skipped
                def empty(row0, nrows, hs):
                    def lbody(k, hs):
                        if stats:
                            ctr_ref[0] = ctr_ref[0] + 1
                        return hs
                    n_it = nrows if lu == 1 else (nrows + (lu - 1)) // lu
                    return jax.lax.fori_loop(0, n_it, lbody, hs)
                hs = jax.lax.cond(
                    any0 & leaf0,
                    lambda hs: empty(-enc0 - 1, rec[0, 14].astype(jnp.int32), hs),
                    lambda hs: hs, hs,
                )
                hs = jax.lax.cond(
                    any1 & leaf1,
                    lambda hs: empty(-enc1 - 1, rec[0, 15].astype(jnp.int32), hs),
                    lambda hs: hs, hs,
                )
            # probe == "noleaf": WRONG results: leaves ignored entirely.
            hit_t, hit_id, hit_u, hit_v = hs

            i0 = any0 & jnp.logical_not(leaf0)
            i1 = any1 & jnp.logical_not(leaf1)
            both = i0 & i1
            near = jnp.where(first0, enc0, enc1)
            far = jnp.where(first0, enc1, enc0)
            sbase = s * STACK_DEPTH

            @pl.when(both)
            def _():
                stack_ref[sbase + jnp.minimum(sp, STACK_DEPTH - 1)] = far

            sp1 = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH), sp)
            desc = jnp.where(both, near,
                             jnp.where(i0, enc0, jnp.where(i1, enc1, -1)))
            need_pop = jnp.logical_not(i0 | i1)
            can_pop = sp1 > 0
            popped = stack_ref[sbase + jnp.maximum(sp1 - 1, 0)]
            node2 = jnp.where(need_pop, jnp.where(can_pop, popped, -1), desc)
            if any_hit:
                node2 = jnp.where(jnp.all((hit_id >= 0) | dead),
                                  jnp.int32(-1), node2)
            sp2 = jnp.where(need_pop & can_pop, sp1 - 1, sp1)
            return node2, sp2, hit_t, hit_id, hit_u, hit_v

        def body(c):
            steps, nodes, sps, hts, hids, hus, hvs = c
            outs = [step_packet(s, nodes[s], sps[s], hts[s], hids[s],
                                hus[s], hvs[s]) for s in range(ilv)]
            return (steps + 1,) + tuple(
                tuple(o[k] for o in outs) for k in range(6))

        zero = jnp.zeros(shape, jnp.float32)
        init = (
            jnp.int32(0),
            tuple(jnp.int32(0) for _ in range(ilv)),
            tuple(jnp.int32(0) for _ in range(ilv)),
            tuple(v[10] for v in views),                        # hit_t = tmax
            tuple(jnp.full(shape, -1, jnp.int32) for _ in range(ilv)),
            tuple(zero for _ in range(ilv)),
            tuple(zero for _ in range(ilv)),
        )
        final = jax.lax.while_loop(cond, body, init)
        # Per packet: out_f packs [t | u | v] along sublanes; out_id = tri id.
        for s in range(ilv):
            out_f[s * 3 * r: s * 3 * r + r, :] = final[3][s]
            out_id[s * r: (s + 1) * r, :] = final[4][s]
            out_f[s * 3 * r + r: s * 3 * r + 2 * r, :] = final[5][s]
            out_f[s * 3 * r + 2 * r: s * 3 * r + 3 * r, :] = final[6][s]
        if stats:
            # lane 0: inner steps, lane 1: leaf tri-rows visited.
            lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            stats_ref[:] = jnp.where(
                lane == 0, final[0],
                jnp.where(lane == 1, ctr_ref[0], 0),
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "rows", "interpret", "vmem_limit", "stats",
                     "order", "light", "interleave", "probe",
                     "tris_per_row", "nodes_per_row", "leaf_unroll",
                     "anyred", "leafbc", "slabbc"),
)
def trace_packet(nodes8, tris12, orig, dirn, tmin, tmax, *,
                 any_hit: bool = False, rows: int = 8,
                 interpret: bool = False, vmem_limit: int = 0,
                 stats: bool = False, order: str = "mins",
                 light: bool = False, interleave: int = 1,
                 probe: str = "none", tris_per_row: int = TRIS_PER_ROW,
                 nodes_per_row: int = NODES_PER_ROW, leaf_unroll: int = 1,
                 anyred: str = "sum", leafbc: bool = False,
                 slabbc: bool = False):
    """Trace rays through a PackedBVH with the packet kernel.

    nodes8/tris12: device arrays of bvh/packed.py layout.
    orig/dirn (R,3), tmin/tmax (R,). Returns (hit_tri, hit_t, u, v), each
    (R,); hit_tri == -1 on miss. Rays are padded to a whole number of
    `rows`*128*`interleave` packet groups internally.
    """
    if stats and interleave != 1:
        raise ValueError("stats mode is single-packet only")
    if stats and leaf_unroll != 1:
        raise ValueError("stats mode counts rows, not unrolled groups")
    if leaf_unroll not in (1, 2, 4):
        raise ValueError("leaf_unroll in {1, 2, 4} (pack spare-row bound)")
    if (rows * interleave) % 8 != 0:
        # Mosaic block shapes need sublane counts divisible by 8; the ray
        # block is (interleave*11*rows, 128).
        raise ValueError("rows * interleave must be a multiple of 8")
    R = orig.shape[0]
    packet = rows * 128 * interleave
    pad = (-R) % packet
    if pad:
        orig = jnp.concatenate([orig, jnp.zeros((pad, 3), orig.dtype)])
        dirn = jnp.concatenate([dirn, jnp.ones((pad, 3), dirn.dtype)])
        tmin = jnp.concatenate([tmin, jnp.ones((pad,), tmin.dtype)])
        tmax = jnp.concatenate([tmax, jnp.zeros((pad,), tmax.dtype)])
    rp = R + pad
    inv = safe_inv_dir(jnp, dirn)

    def tile(a):
        return a.reshape(-1, rows, 128)  # (packets, rows, 128)

    # ONE fused ray-input block per packet (11 separate component inputs +
    # 4 outputs cost measurable per-grid-step DMA orchestration).
    comps = jnp.stack([
        tile(orig[:, 0]), tile(orig[:, 1]), tile(orig[:, 2]),
        tile(inv[:, 0]), tile(inv[:, 1]), tile(inv[:, 2]),
        tile(dirn[:, 0]), tile(dirn[:, 1]), tile(dirn[:, 2]),
        tile(tmin), tile(tmax),
    ], axis=1)  # (packets, 11, rows, 128)
    ilv = interleave
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
        jax.ShapeDtypeStruct((grid * ilv * rows, 128), jnp.int32),   # hit id
    ]
    out_specs = [outf_spec, outi_spec]
    scratch = [pltpu.SMEM((ilv * STACK_DEPTH,), jnp.int32)]
    if stats:
        out_shape.append(jax.ShapeDtypeStruct((grid * rows, 128), jnp.int32))
        out_specs.append(outi_spec)
        scratch.append(pltpu.SMEM((2,), jnp.int32))
    params = {}
    if not interpret:
        # Default Mosaic scoped-VMEM limit is 16 MiB; the tables must be
        # VMEM-resident (that is the entire point of this engine), so size
        # the limit from them. v5e has 128 MiB of VMEM per core.
        table_bytes = (nodes8.shape[0] + tris12.shape[0]) * 128 * 4
        limit = vmem_limit or min(table_bytes + (24 << 20), 127 << 20)
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=limit,
        )
    outs = pl.pallas_call(
        _make_kernel(rows, any_hit, stats, order, light, ilv, probe,
                     tris_per_row, nodes_per_row, leaf_unroll, anyred,
                     leafbc, slabbc),
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
        # (packets, 2): inner steps and leaf rows per packet.
        s = outs[2].reshape(grid, rows, 128)
        return result + (s[:, 0, :2],)
    return result
