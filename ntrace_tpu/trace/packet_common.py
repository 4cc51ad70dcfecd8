"""Shared pieces of the Pallas packet traversal kernels.

Three engines share these: the cond-structured while-while kernel
(trace/packet_pallas.py), the branch-free speculative if-if kernel
(trace/packet_ifif.py), and the phase-separated branch-free while-while
kernel (trace/packet_ww.py). Numerics follow ops/aabb.py slab_test and
ops/intersect.py moller_trumbore so every engine is pixel-identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntrace_tpu.bvh.packed import NODE_LANES, TRI_LANES

INF = np.float32(3.0e38)


def rep_rows(row, n: int):
    """Replicate a (1, 128) row tile to (n, 128), Mosaic-safely.

    jnp.broadcast_to on a dynamically-loaded row crashes the TPU backend
    compiler (tpu_compile_helper subprocess exit 1, swallowing the real
    error -- round-3 device sweep: every kernel using it failed while
    packet_dleaf's concat formulation compiled and ran). Values are
    identical either way; concat keeps the replication as plain
    vector-pipe data movement the backend handles.
    """
    if n == 1:
        return row
    return jnp.concatenate([row] * n, axis=0)


def node_record(nodes_ref, node, npr: int):
    """(1, 128) with node's 16 lanes rolled to the front; scalar `node`.

    npr == 1 (one record per row) needs no roll at all -- the roll is
    +68 ns of the inner step's serial chain (scripts/chain_probe.py)."""
    if npr == 1:
        return nodes_ref[pl.ds(node, 1), :]
    shift_rows = npr.bit_length() - 1
    row = nodes_ref[pl.ds(jax.lax.shift_right_logical(node, shift_rows), 1), :]
    j = jnp.bitwise_and(node, npr - 1)
    shift = jnp.bitwise_and(128 - NODE_LANES * j, 127)
    return pltpu.roll(row, shift, axis=1)


def slab_child(rec, base, ox, oy, oz, ix, iy, iz, tmin, tmax):
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


def mt_row_best(trow, ox, oy, oz, dx, dy, dz, tn, tpr: int, light: bool):
    """Moller-Trumbore over one lane-packed triangle row.

    Tests the row's `tpr` slots on every lane and merges through a balanced
    select tree. Returns (t, id, u, v) of the row's best candidate per lane;
    invalid slots yield (INF, INT_MAX) which can never win an acceptance
    test of the form  (t < cur) | ((t == cur) & (id < cur_id)).
    """
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
            take = (bnd[0] < a[0]) | ((bnd[0] == a[0]) & (bnd[1] < a[1]))
            nxt.append(tuple(
                jnp.where(take, bnd[i], a[i])
                for i in range(2 if light else 4)))
        if len(cands) % 2:
            nxt.append(cands[-1])
        cands = nxt
    c = cands[0]
    if light:
        return c[0], c[1], None, None
    return c


def ray_views(rays_ref, rows: int, ilv: int):
    """Slice the fused ray-input block into per-packet component views."""
    views = []
    for s in range(ilv):
        b = s * 11 * rows
        views.append(tuple(
            rays_ref[b + c * rows: b + (c + 1) * rows, :] for c in range(11)))
    return views


def packet_signs(views):
    """Packet-mean direction sign octants (for pack-time order codes)."""
    out = []
    for view in views:
        dx, dy, dz = view[6], view[7], view[8]
        out.append((jnp.sum(dx) >= 0).astype(jnp.int32)
                   | ((jnp.sum(dy) >= 0).astype(jnp.int32) << 1)
                   | ((jnp.sum(dz) >= 0).astype(jnp.int32) << 2))
    return out


def stage_rays(orig, dirn, tmin, tmax, rows: int, ilv: int, safe_inv_dir):
    """Pad to whole packet groups and fuse the 11 ray components into the
    kernel's single input block. Returns (rays_in, grid, padded_count)."""
    R = orig.shape[0]
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
    return comps.reshape(grid * ilv * 11 * rows, 128), grid, rp
