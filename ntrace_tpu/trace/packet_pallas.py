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

Per step:
  inner: fetch one node record, slab-test BOTH children on all lanes (VPU),
         reduce to per-child any-hit + nearest-entry scalars, descend the
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


def _make_kernel(rows: int, any_hit: bool):
    shape = (rows, 128)

    def kernel(nodes_ref, tris_ref,
               ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref,
               dx_ref, dy_ref, dz_ref, tn_ref, tx_ref,
               out_t, out_id, out_u, out_v, stack_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        ix, iy, iz = ix_ref[:], iy_ref[:], iz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        tn, tx = tn_ref[:], tx_ref[:]
        dead = tx <= tn  # padding / pre-killed rays

        out_t[:] = tx
        out_id[:] = jnp.full(shape, -1, jnp.int32)
        out_u[:] = jnp.zeros(shape, jnp.float32)
        out_v[:] = jnp.zeros(shape, jnp.float32)

        def leaf_phase(start, nrows):
            def lbody(k, _):
                trow = tris_ref[pl.ds(start + k, 1), :]
                cur_t = out_t[:]
                cur_id = out_id[:]
                cur_u = out_u[:]
                cur_v = out_v[:]
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
                    cur_u = jnp.where(acc, u, cur_u)
                    cur_v = jnp.where(acc, v, cur_v)
                out_t[:] = cur_t
                out_id[:] = cur_id
                out_u[:] = cur_u
                out_v[:] = cur_v
                return 0

            jax.lax.fori_loop(0, nrows, lbody, 0)

        def cond(c):
            node, sp, done, steps = c
            return (node >= 0) & jnp.logical_not(done) & (steps < MAX_STEPS)

        def body(c):
            node, sp, done, steps = c
            rec = _node_record(nodes_ref, node)
            cur_t = out_t[:]
            live_t = jnp.where(dead, -INF, cur_t) if any_hit else cur_t
            h0, t0 = _slab_child(rec, 0, ox, oy, oz, ix, iy, iz, tn, live_t)
            h1, t1 = _slab_child(rec, 6, ox, oy, oz, ix, iy, iz, tn, live_t)
            n0 = jnp.min(jnp.where(h0, t0, INF))
            n1 = jnp.min(jnp.where(h1, t1, INF))
            any0 = n0 < INF
            any1 = n1 < INF
            enc0 = rec[0, 12].astype(jnp.int32)
            enc1 = rec[0, 13].astype(jnp.int32)
            cnt0 = rec[0, 14].astype(jnp.int32)
            cnt1 = rec[0, 15].astype(jnp.int32)
            leaf0 = enc0 < 0
            leaf1 = enc1 < 0

            @pl.when(any0 & leaf0)
            def _():
                leaf_phase(-enc0 - 1, cnt0)

            @pl.when(any1 & leaf1)
            def _():
                leaf_phase(-enc1 - 1, cnt1)

            i0 = any0 & jnp.logical_not(leaf0)
            i1 = any1 & jnp.logical_not(leaf1)
            both = i0 & i1
            first0 = n0 <= n1
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
                done2 = jnp.all((out_id[:] >= 0) | dead)
            return node2, sp2, done2, steps + 1

        jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0), jnp.bool_(False), jnp.int32(0)),
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("any_hit", "rows", "interpret", "vmem_limit")
)
def trace_packet(nodes8, tris12, orig, dirn, tmin, tmax, *,
                 any_hit: bool = False, rows: int = 8,
                 interpret: bool = False, vmem_limit: int = 0):
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
        return a.reshape(-1, 128)

    comps = (
        tile(orig[:, 0]), tile(orig[:, 1]), tile(orig[:, 2]),
        tile(inv[:, 0]), tile(inv[:, 1]), tile(inv[:, 2]),
        tile(dirn[:, 0]), tile(dirn[:, 1]), tile(dirn[:, 2]),
        tile(tmin), tile(tmax),
    )
    grid = rp // packet
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.int32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((rp // 128, 128), jnp.float32),
    ]
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
    out_t, out_id, out_u, out_v = pl.pallas_call(
        _make_kernel(rows, any_hit),
        grid=(grid,),
        in_specs=[table_spec, table_spec] + [ray_spec] * 11,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
        **params,
    )(nodes8, tris12, *comps)
    flat = lambda a: a.reshape(-1)[:R]
    return flat(out_id), flat(out_t), flat(out_u), flat(out_v)
