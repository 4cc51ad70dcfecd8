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

from ntrace_tpu.bvh.packed import NODE_LANES, TRI_LANES, TRIS_PER_ROW
from ntrace_tpu.ops.aabb import safe_inv_dir

STACK_DEPTH = 128
INF = np.float32(3.0e38)
MAX_STEPS = 4_000_000  # malformed-tree backstop, far above any real trace


def _node_record(nodes_ref, node):
    """(1, 128) with node's 16 lanes rolled to the front; scalar `node`."""
    row = nodes_ref[pl.ds(jax.lax.shift_right_logical(node, 3), 1), :]
    j = jnp.bitwise_and(node, 7)
    shift = jnp.bitwise_and(128 - NODE_LANES * j, 127)
    return pltpu.roll(row, shift, axis=1)


def _slab_child(rec, base, ox, oy, oz, ix, iy, iz, tmin, tmax):
    """Slab-test one child whose 6 bounds start at lane `base` of rec.

    Matches ops/aabb.py slab_test: NaN-suppressing min/max, entry clamped
    to tmin, exit clamped to the per-lane running hitT.
    Returns (hit lanes, entry t lanes).
    """
    tlo_x = (rec[0, base + 0] - ox) * ix
    thi_x = (rec[0, base + 1] - ox) * ix
    tlo_y = (rec[0, base + 2] - oy) * iy
    thi_y = (rec[0, base + 3] - oy) * iy
    tlo_z = (rec[0, base + 4] - oz) * iz
    thi_z = (rec[0, base + 5] - oz) * iz
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
                 order: str = "mins", light: bool = False):
    shape = (rows, 128)

    def kernel(nodes_ref, tris_ref, rays_ref, out_f, out_id, *rest):
        if stats:
            stats_ref, stack_ref, ctr_ref = rest
            ctr_ref[0] = jnp.int32(0)
        else:
            (stack_ref,) = rest
        r = rows
        ox, oy, oz = (rays_ref[0:r, :], rays_ref[r:2 * r, :],
                      rays_ref[2 * r:3 * r, :])
        ix, iy, iz = (rays_ref[3 * r:4 * r, :], rays_ref[4 * r:5 * r, :],
                      rays_ref[5 * r:6 * r, :])
        dx, dy, dz = (rays_ref[6 * r:7 * r, :], rays_ref[7 * r:8 * r, :],
                      rays_ref[8 * r:9 * r, :])
        tn, tx = rays_ref[9 * r:10 * r, :], rays_ref[10 * r:11 * r, :]
        dead = tx <= tn  # padding / pre-killed rays

        def leaf_rows(row0, nrows, hs):
            """Moller-Trumbore over `nrows` 12-slot rows; value-carried."""
            def lbody(k, hs):
                if stats:
                    ctr_ref[0] = ctr_ref[0] + 1
                cur_t, cur_id, cur_u, cur_v = hs
                # Rows may straddle leaves (dense packing, bvh/packed.py);
                # testing a neighbour leaf's real triangles is safe: the
                # closest-hit update + tie-break is superset-invariant.
                trow = tris_ref[pl.ds(row0 + k, 1), :]
                for jj in range(TRIS_PER_ROW):
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
                    valid = (
                        (det != 0) & (tid >= 0)
                        & (u >= 0) & (v >= 0) & (u + v <= 1)
                        & (t > tn)
                    )
                    # Strict t < hitT plus lowest-tri-id tie-break: results
                    # do not depend on packet visit order.
                    closer = (t < cur_t) | ((t == cur_t) & (tid < cur_id))
                    acc = valid & closer
                    cur_t = jnp.where(acc, t, cur_t)
                    cur_id = jnp.where(acc, tid, cur_id)
                    if not light:
                        cur_u = jnp.where(acc, u, cur_u)
                        cur_v = jnp.where(acc, v, cur_v)
                return cur_t, cur_id, cur_u, cur_v

            return jax.lax.fori_loop(0, nrows, lbody, hs)

        # Packet-mean direction signs steer near-child ordering in "code"
        # mode (one-time reduces replacing per-step near-t min-reduces).
        signs = ((jnp.sum(dx) >= 0).astype(jnp.int32)
                 | ((jnp.sum(dy) >= 0).astype(jnp.int32) << 1)
                 | ((jnp.sum(dz) >= 0).astype(jnp.int32) << 2))

        def cond(c):
            return (c[0] >= 0) & jnp.logical_not(c[2]) & (c[3] < MAX_STEPS)

        def body(c):
            node, sp, done, steps, hit_t, hit_id, hit_u, hit_v = c
            rec = _node_record(nodes_ref, node)
            live_t = jnp.where(dead, -INF, hit_t) if any_hit else hit_t
            h0, t0 = _slab_child(rec, 0, ox, oy, oz, ix, iy, iz, tn, live_t)
            h1, t1 = _slab_child(rec, 6, ox, oy, oz, ix, iy, iz, tn, live_t)
            if order == "mins":
                n0 = jnp.min(jnp.where(h0, t0, INF))
                n1 = jnp.min(jnp.where(h1, t1, INF))
                any0 = n0 < INF
                any1 = n1 < INF
                first0 = n0 <= n1
            else:
                # One reduce yields both children's any-hit flags
                # (bit-packed; lane count < 2**16 keeps the fields apart),
                # near-first order comes from the pack-time order code
                # (lane 14 = axis*2 + low-side bit; present exactly when
                # both children are internal, the only case it's read).
                hs_sum = jnp.sum(h0.astype(jnp.int32) << 16
                                 | h1.astype(jnp.int32))
                any0 = hs_sum >= (1 << 16)
                any1 = (hs_sum & 0xFFFF) > 0
                code = rec[0, 14].astype(jnp.int32)
                first0 = (jnp.bitwise_and(
                    jax.lax.shift_right_logical(signs, code >> 1), 1
                ) == jnp.bitwise_and(code, 1))
            enc0 = rec[0, 12].astype(jnp.int32)
            enc1 = rec[0, 13].astype(jnp.int32)
            leaf0 = enc0 < 0
            leaf1 = enc1 < 0

            hs = (hit_t, hit_id, hit_u, hit_v)
            hs = jax.lax.cond(
                any0 & leaf0,
                lambda hs: leaf_rows(-enc0 - 1, rec[0, 14].astype(jnp.int32), hs),
                lambda hs: hs, hs,
            )
            hs = jax.lax.cond(
                any1 & leaf1,
                lambda hs: leaf_rows(-enc1 - 1, rec[0, 15].astype(jnp.int32), hs),
                lambda hs: hs, hs,
            )
            hit_t, hit_id, hit_u, hit_v = hs

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
            done2 = done
            if any_hit:
                done2 = jnp.all((hit_id >= 0) | dead)
            return (node2, sp2, done2, steps + 1,
                    hit_t, hit_id, hit_u, hit_v)

        zero = jnp.zeros(shape, jnp.float32)
        final = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0), jnp.bool_(False), jnp.int32(0),
             tx, jnp.full(shape, -1, jnp.int32), zero, zero),
        )
        # out_f packs [t | u | v] along sublanes; out_id is the tri id.
        out_f[0:r, :] = final[4]
        out_id[:] = final[5]
        out_f[r:2 * r, :] = final[6]
        out_f[2 * r:3 * r, :] = final[7]
        if stats:
            # lane 0: inner steps, lane 1: leaf tri-rows visited.
            lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            stats_ref[:] = jnp.where(
                lane == 0, final[3],
                jnp.where(lane == 1, ctr_ref[0], 0),
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "rows", "interpret", "vmem_limit", "stats",
                     "order", "light"),
)
def trace_packet(nodes8, tris12, orig, dirn, tmin, tmax, *,
                 any_hit: bool = False, rows: int = 8,
                 interpret: bool = False, vmem_limit: int = 0,
                 stats: bool = False, order: str = "mins",
                 light: bool = False):
    """Trace rays through a PackedBVH with the packet kernel.

    nodes8/tris12: device arrays of bvh/packed.py layout.
    orig/dirn (R,3), tmin/tmax (R,). Returns (hit_tri, hit_t, u, v), each
    (R,); hit_tri == -1 on miss. Rays are padded to a whole number of
    `rows`*128 packets internally.
    """
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
        return a.reshape(-1, rows, 128)  # (packets, rows, 128)

    # ONE fused ray-input block per packet (11 separate component inputs +
    # 4 outputs cost measurable per-grid-step DMA orchestration).
    comps = jnp.stack([
        tile(orig[:, 0]), tile(orig[:, 1]), tile(orig[:, 2]),
        tile(inv[:, 0]), tile(inv[:, 1]), tile(inv[:, 2]),
        tile(dirn[:, 0]), tile(dirn[:, 1]), tile(dirn[:, 2]),
        tile(tmin), tile(tmax),
    ], axis=1)  # (packets, 11, rows, 128)
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
        jax.ShapeDtypeStruct((grid * 3 * rows, 128), jnp.float32),  # t,u,v
        jax.ShapeDtypeStruct((grid * rows, 128), jnp.int32),        # hit id
    ]
    out_specs = [outf_spec, outi_spec]
    scratch = [pltpu.SMEM((STACK_DEPTH,), jnp.int32)]
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
        _make_kernel(rows, any_hit, stats, order, light),
        grid=(grid,),
        in_specs=[table_spec, table_spec, in_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **params,
    )(nodes8, tris12, rays_in)
    tuv = outs[0].reshape(grid, 3, rows, 128)
    flat = lambda a: a.reshape(-1)[:R]
    result = (flat(outs[1]), flat(tuv[:, 0]), flat(tuv[:, 1]),
              flat(tuv[:, 2]))
    if stats:
        # (packets, 2): inner steps and leaf rows per packet.
        s = outs[2].reshape(grid, rows, 128)
        return result + (s[:, 0, :2],)
    return result
