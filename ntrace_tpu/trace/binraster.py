"""Screen-space binned primary-ray engine ("bin-raster", TPU-first).

Reference parity: serves the same benchmark surface as the upstream
persistent packet tracers on PRIMARY rays (SURVEY.md SS3.3 -- coherent
camera rays are the headline workload), with identical results: exact
Moller-Trumbore intersection, closest hit, lowest-tri-id tie-break.
The upstream has no counterpart component -- this engine exists because
BVH pointer-chasing is the TPU's worst case (one in-order scalar pipe
drives every traversal decision; PERF_NOTES.md round-2/3 kernel-structure
findings put the packet family's plateau at ~43 Mrays/s), while dense
per-tile intersection is its best case.

How it works (all stages on device, jit):
  1. Project the scene's triangle vertices into continuous pixel coords
     with the same camera model as ray/raygen.py primary().
  2. Conservative screen-space bins: each triangle's pixel bbox selects
     a range of TILE x TILE pixel bins (triangles crossing the
     minimum-hit plane are exactly clipped and bboxed; triangles fully
     behind/nearer than any possible hit or off-screen are culled --
     both exact, see _counts).
  3. Stream-expand (bin, tri) pairs and sort them by (bin, zmin) with a
     single fused int32 key; gather triangle data into 128-lane rows of
     12 tris (bvh/packed.py lane layout, lane 120 = row zmin).
  4. One Pallas program loops over bins: the bin's (8, 128) ray-dir tile
     (Morton pixel order makes every aligned 32x32 pixel block 1024
     CONTIGUOUS ray slots), then walks the bin's contiguous, z-ascending
     triangle rows front-to-back with unrolled independent row loads.
     Early-z: once every ray in the tile has a hit nearer than the next
     row's conservative zmin, the remaining rows cannot produce a closer
     hit (t >= z along unit fwd for unit dirs) and the bin terminates.

Exactness: bins only CULL; every surviving candidate runs the identical
MT arithmetic as trace/packet_pallas.py (same op order, same f32
rounding), and lexicographic (t, tri_id) min is visit-order invariant.
Rows straddling bin boundaries test a neighbour's real triangles --
extra exact tests can't change a closest hit (bvh/packed.py argument).
Early-z skips only rows with zmin_enc > max t in the tile, where
zmin_enc <= zmin_true * (1 - Z_MARGIN) absorbs f32 rounding between the
projection arithmetic and the MT t computation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntrace_tpu.bvh.packed import TRI_LANES

TPB = 12                 # triangles per 128-lane row (12 * 10 lanes)
ZLANE = 120              # row lane holding the row's conservative zmin
INF = np.float32(3.0e38)
Z_MARGIN = np.float32(3e-5)   # relative slack: projection vs MT rounding


# --------------------------------------------------------------------------
# Host-side bin bookkeeping


def bin_order(tx_bins: int, ty_bins: int) -> np.ndarray:
    """(ty*TX+tx) -> bin slot, matching the Morton pixel table's block
    order: sorting pixels by 2D Morton code makes every aligned 2^k x 2^k
    pixel block contiguous, and blocks appear in Morton order of their
    block coordinates -- exactly pixel_table(TX, TY)'s inverse map."""
    from ntrace_tpu.ray.pixeltable import pixel_table

    _, inv = pixel_table(tx_bins, ty_bins)
    return inv.astype(np.int32)


def pick_pmax(total: int) -> int:
    """Static pair-capacity bucket (geometric, multiple of TPB*8 so the
    row table reshapes cleanly); bounded recompiles as the camera moves."""
    cap = 96 * 1024
    while cap < total * 1.15 + 96:
        cap = cap * 3 // 2
        cap -= cap % 96
    return cap


# --------------------------------------------------------------------------
# Device prep: project -> bin -> expand -> sort -> row table


def _project(verts, cam):
    """Continuous pixel coords + camera-space depth of every vertex.

    Matches ray/raygen.py primary(): ndc_x = (q.R)/(q.F)/tan_x, pixel
    center x+0.5 at px = (ndc_x+1)/2*W.
    """
    q = verts - cam["pos"]                       # (n, 3, 3)
    zc = jnp.einsum("nvc,c->nv", q, cam["fwd"])
    xc = jnp.einsum("nvc,c->nv", q, cam["right"])
    yc = jnp.einsum("nvc,c->nv", q, cam["up"])
    return xc, yc, zc


def _counts(verts, cam, *, width, height, tile):
    """Per-tri bin-rectangle + pair count (stage shared by the cheap
    count-only pass and the full prep).

    Near-plane handling is an exact CLIP, not a full-screen fallback: no
    primary hit can be nearer than t = tmin = znear along a frustum dir,
    so z_hit >= znear / sqrt(1 + tan_x^2 + tan_y^2) in camera space.
    Every triangle is clipped at 99% of that plane and the clipped
    polygon's projected bbox is used -- crossers get their real (usually
    small) screen rect, and unhittably-near geometry culls itself. The
    1% z margin plus the enlarged 2-pixel pad on crossers absorb the f32
    rounding of the edge-intersection arithmetic (on-screen coordinates
    carry ~1e-6 relative error; points whose error could reach pixels
    are >1e6 px off-screen and clamp to the boundary bin regardless).
    Assumes the kernel rejects t <= znear (raygen.primary's tmin).
    """
    txn, tyn = width // tile, height // tile
    xc, yc, zc = _project(verts, cam)
    tanx, tany = cam["tan_x"], cam["tan_y"]
    zclip = jnp.maximum(
        cam["znear"] * jax.lax.rsqrt(1.0 + tanx * tanx + tany * tany)
        * jnp.float32(0.99), jnp.float32(1e-30))
    vin = zc >= zclip                             # (n, 3)
    wsafe = jnp.where(vin, zc, jnp.float32(1.0))
    pxv = (xc / wsafe / tanx + 1.0) * jnp.float32(0.5 * width)
    pyv = (1.0 - yc / wsafe / tany) * jnp.float32(0.5 * height)
    BIG = jnp.float32(3e38)
    minx = jnp.min(jnp.where(vin, pxv, BIG), axis=1)
    maxx = jnp.max(jnp.where(vin, pxv, -BIG), axis=1)
    miny = jnp.min(jnp.where(vin, pyv, BIG), axis=1)
    maxy = jnp.max(jnp.where(vin, pyv, -BIG), axis=1)
    anyc = jnp.zeros(vin.shape[:1], bool)
    for i, j in ((0, 1), (1, 2), (2, 0)):
        cross = vin[:, i] != vin[:, j]
        zi, zj = zc[:, i], zc[:, j]
        # s suffers catastrophic cancellation when the edge is nearly
        # parallel to the clip plane (|zj-zi| ~ f32 ulp of zclip): clamp
        # it to the segment, and for near-parallel crossers additionally
        # cover BOTH endpoints projected at the clip plane -- the true
        # crossing point lies between them, so the bbox stays
        # conservative regardless of the cancelled quotient.
        s = jnp.clip(
            (zclip - zi) / jnp.where(cross, zj - zi, jnp.float32(1.0)),
            jnp.float32(0.0), jnp.float32(1.0))
        xi = xc[:, i] + s * (xc[:, j] - xc[:, i])
        yi = yc[:, i] + s * (yc[:, j] - yc[:, i])
        pxe = (xi / zclip / tanx + 1.0) * jnp.float32(0.5 * width)
        pye = (1.0 - yi / zclip / tany) * jnp.float32(0.5 * height)
        minx = jnp.minimum(minx, jnp.where(cross, pxe, BIG))
        maxx = jnp.maximum(maxx, jnp.where(cross, pxe, -BIG))
        miny = jnp.minimum(miny, jnp.where(cross, pye, BIG))
        maxy = jnp.maximum(maxy, jnp.where(cross, pye, -BIG))
        npar = cross & (jnp.abs(zj - zi) < jnp.float32(1e-4) * zclip)
        for xe, ye in ((xc[:, i], yc[:, i]), (xc[:, j], yc[:, j])):
            pxn = (xe / zclip / tanx + 1.0) * jnp.float32(0.5 * width)
            pyn = (1.0 - ye / zclip / tany) * jnp.float32(0.5 * height)
            minx = jnp.minimum(minx, jnp.where(npar, pxn, BIG))
            maxx = jnp.maximum(maxx, jnp.where(npar, pxn, -BIG))
            miny = jnp.minimum(miny, jnp.where(npar, pyn, BIG))
            maxy = jnp.maximum(maxy, jnp.where(npar, pyn, -BIG))
        anyc = anyc | cross
    pad = jnp.where(anyc, jnp.float32(2.0), jnp.float32(1e-2))
    minx, maxx = minx - pad, maxx + pad
    miny, maxy = miny - pad, maxy + pad
    # Pixel-center sample points live at (x+0.5, y+0.5) in (0, W)x(0, H).
    contrib = jnp.any(vin, axis=1)
    offscreen = (maxx < 0) | (minx > width) | (maxy < 0) | (miny > height)
    cull = (~contrib) | offscreen
    ts = jnp.float32(tile)
    tx0 = jnp.clip(jnp.floor(minx / ts).astype(jnp.int32), 0, txn - 1)
    tx1 = jnp.clip(jnp.floor(maxx / ts).astype(jnp.int32), 0, txn - 1)
    ty0 = jnp.clip(jnp.floor(miny / ts).astype(jnp.int32), 0, tyn - 1)
    ty1 = jnp.clip(jnp.floor(maxy / ts).astype(jnp.int32), 0, tyn - 1)
    cnt = jnp.where(cull, 0, (tx1 - tx0 + 1) * (ty1 - ty0 + 1))
    zmin_v = jnp.min(jnp.where(vin, zc, BIG), axis=1)
    zmin = jnp.where(anyc, jnp.minimum(zmin_v, zclip), zmin_v)
    zmin = jnp.where(cull, jnp.float32(0.0), zmin)
    return tx0, tx1, ty0, ty1, cnt.astype(jnp.int32), zmin


@functools.partial(jax.jit, static_argnames=("width", "height", "tile"))
def count_pairs(verts, cam, *, width, height, tile):
    """Total (bin, tri) pair count -- host pulls this one scalar to pick
    the static p_max bucket before tracing."""
    *_, cnt, _ = _counts(verts, cam, width=width, height=height, tile=tile)
    return jnp.sum(cnt)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "tile", "p_max"))
def binraster_prep(verts, cam, block_bin, *, width, height, tile, p_max):
    """Build the bin-raster tables: z-sorted per-bin triangle rows.

    Returns (rows (NR,128) f32, row0 (NB,) i32, row1 (NB,) i32,
    total_pairs i32). Overflow (total > p_max) must be checked by the
    caller via total_pairs; rows are exact for any total <= p_max.
    """
    n = verts.shape[0]
    txn, tyn = width // tile, height // tile
    nb = txn * tyn
    tx0, tx1, ty0, ty1, cnt, zmin = _counts(
        verts, cam, width=width, height=height, tile=tile)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)[:-1].astype(jnp.int32)])
    total = starts[-1] + cnt[-1]

    # Stream expansion: pair j belongs to the first tri whose cumulative
    # end exceeds j (scatter-add at ends + cumsum == searchsorted-right,
    # O(P) instead of a log-n gather cascade).
    ends = starts + cnt
    marks = jnp.zeros((p_max + 1,), jnp.int32).at[
        jnp.minimum(ends, p_max)].add(1, mode="drop")
    tri_of = jnp.cumsum(marks[:p_max])           # (p_max,)
    tri_of = jnp.minimum(tri_of, n - 1)
    j = jnp.arange(p_max, dtype=jnp.int32)
    valid = j < total
    local = j - starts[tri_of]
    wbin = tx1[tri_of] - tx0[tri_of] + 1
    bx = tx0[tri_of] + local % wbin
    by = ty0[tri_of] + local // wbin
    bin_slot = block_bin[by * txn + bx]

    # Fused sort key: bin in the high bits, truncated zmin bits low.
    # Truncation (>> 11) rounds positive floats DOWN -> decoded row zmin
    # is conservative. 21 z bits keep ~12 mantissa bits at any scale.
    zsafe = jnp.maximum(zmin[tri_of] * (1.0 - Z_MARGIN), 0.0)
    zbits = (jax.lax.bitcast_convert_type(zsafe, jnp.int32) >> 11) & 0x1FFFFF
    key = jnp.where(valid, (bin_slot << 21) | zbits, jnp.int32(0x7FFFFFFF))
    key, stri = jax.lax.sort((key, tri_of), num_keys=1)
    sbin = key >> 21

    # Per-bin row ranges (rows may straddle bins; superset testing is
    # exact, see module docstring).
    bins = jnp.arange(nb, dtype=jnp.int32)
    pair0 = jnp.searchsorted(sbin, bins, side="left").astype(jnp.int32)
    pair1 = jnp.searchsorted(sbin, bins, side="right").astype(jnp.int32)
    row0 = pair0 // TPB
    row1 = (pair1 + TPB - 1) // TPB

    # Row table: bvh/packed.py triangle lane layout (v0, e1, e2, tid).
    sv = verts[stri]                             # (p_max, 3, 3)
    svalid = key != jnp.int32(0x7FFFFFFF)
    v0 = sv[:, 0]
    lanes = jnp.concatenate([
        v0, sv[:, 1] - v0, sv[:, 2] - v0,
        jnp.where(svalid, stri, -1).astype(jnp.float32)[:, None],
    ], axis=1)                                   # (p_max, 10)
    nr = p_max // TPB
    rows = jnp.zeros((nr, 128), jnp.float32)
    rows = rows.at[:, : TPB * TRI_LANES].set(
        lanes.reshape(nr, TPB * TRI_LANES))
    # Lane 120: conservative row zmin for the kernel's early-z cutoff
    # (truncated bits round down, so decoded <= true zmin).
    zdec = jax.lax.bitcast_convert_type((key & 0x1FFFFF) << 11, jnp.float32)
    zdec = jnp.where(svalid, zdec, INF)
    rowz = jnp.min(zdec.reshape(nr, TPB), axis=1)
    rows = rows.at[:, ZLANE].set(rowz)
    return rows, row0, row1, total


# --------------------------------------------------------------------------
# Gather-free "fixed-slot" prep (v2)
#
# The v0 prep's stream expansion gathers ~7 per-tri arrays at p_max random
# indices plus a (p_max, 3, 3) verts gather -- and large-index gathers are
# the TPU's slowest primitive (PERF_NOTES.md: the LBVH bounds gathers were
# that build's dominant cost too). The fixed-slot formulation has ZERO
# p_max-sized gathers: each triangle owns k_slots static pair slots
# (slot k -> bin rect cell k, dense vectorized math over the tri axis),
# the triangle's 10 row lanes ride the sort as payload operands (the
# 17-operand LBVH sort proved wide payload sorts cheap), and the handful
# of triangles covering more than k_slots bins (plus near-plane crossers)
# fall into a z-sorted GLOBAL row prefix every bin tests first.


def _bin_mcodes(txn: int, tyn: int) -> np.ndarray:
    """Sorted 2D Morton codes of all bins: bin slot b (Morton block rank,
    == bin_order's target space) has code _bin_mcodes(...)[b]."""
    from ntrace_tpu.ops.morton import morton2d

    bx, by = np.meshgrid(np.arange(txn), np.arange(tyn))
    mc = np.sort(morton2d(np, bx.ravel(), by.ravel()))
    if mc[-1] >= 1 << 10:
        raise ValueError("bin grid too large for the 31-bit fused sort key")
    return mc.astype(np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile", "k_slots", "k2_slots"))
def count_pairs_fast(verts, cam, *, width, height, tile, k_slots,
                     k2_slots=64):
    """(sorted-tier pair count incl. the k2 mid tier, mid-tier tri count,
    walked-global tri count) -- host pulls these to pick the static
    p_max / g_max / g2_max buckets."""
    *_, cnt, _ = _counts(verts, cam, width=width, height=height, tile=tile)
    over = cnt > k_slots
    over2 = cnt > k2_slots
    return (jnp.sum(jnp.where(over2, 0, cnt)),
            jnp.sum((over & ~over2).astype(jnp.int32)),
            jnp.sum(over2.astype(jnp.int32)))


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile", "k_slots", "g_max",
                     "p_max", "payload", "k2_slots", "g2_max"))
def binraster_prep_fast(verts, cam, mcodes, *, width, height, tile,
                        k_slots, g_max, p_max, payload=True,
                        k2_slots=64, g2_max=192):
    """Gather-free bin-raster prep (two fixed-slot tiers + tiny global).

    Tier 1: every tri covering <= k_slots bins owns k_slots static pair
    slots (dense math over the tri axis). Tier 2: tris covering
    (k_slots, k2_slots] bins are compacted to <= g_max slots by a small
    z-sort, then expanded with k2_slots static slots each -- so big
    occluders still land in exactly their covered bins, preserving the
    per-bin z-order that drives the kernel's early-z. Both tiers merge
    into ONE (bin, z)-keyed sort whose 10 payload operands carry the row
    lanes (no p_max-sized gathers anywhere). Only tris covering more
    than k2_slots bins (near-plane crossers, ~degenerate-huge tris) fall
    into the z-sorted walked-global prefix of <= g2_max tris every bin
    tests first.

    Returns (rows, row0, row1, g_r1 (1,) i32, ok bool scalar). `rows`
    holds g2_max//TPB global rows first, then p_max//TPB sorted-tier
    rows; row0/row1 are absolute row ranges per bin. `ok` is False when
    a static bucket overflowed (sorted pairs > p_max, overflow tris >
    g_max, or walked-global tris > g2_max) -- results are then
    incomplete and the caller must rebuild with bigger buckets
    (trace_binraster_primary poisons hits with -2 so an unchecked
    overflow fails golden gates loudly instead of silently).
    """
    from ntrace_tpu.ops.morton import _part1by1

    n = verts.shape[0]
    tx0, tx1, ty0, ty1, cnt, zmin = _counts(
        verts, cam, width=width, height=height, tile=tile)
    wbin = tx1 - tx0 + 1
    over = cnt > k_slots
    over2 = cnt > k2_slots
    n_over = jnp.sum(over.astype(jnp.int32))
    n_over2 = jnp.sum(over2.astype(jnp.int32))
    zsafe = jnp.maximum(zmin * (1.0 - Z_MARGIN), 0.0)
    zbits = (jax.lax.bitcast_convert_type(zsafe, jnp.int32) >> 11) & 0x1FFFFF
    SENT = jnp.int32(0x7FFFFFFF)

    def slot_key(k, t0x, t0y, w, zb, valid):
        kk = jnp.int32(k)
        bx = t0x + kk % w
        by = t0y + kk // w
        mc = ((_part1by1(jnp, by) << jnp.uint32(1))
              | _part1by1(jnp, bx)).astype(jnp.int32)
        return jnp.where(valid, (mc << 21) | zb, SENT)

    # Tier 1: slot k of tri i = cell k of i's bin rect (row-major).
    cols = [slot_key(k, tx0, ty0, wbin, zbits,
                     (~over) & (jnp.int32(k) < cnt))
            for k in range(k_slots)]
    keys = jnp.stack(cols).reshape(-1)              # (k_slots * n,)

    # Overflow compaction: ALL cnt > k_slots tris, z-ascending, first
    # g_max slots (mid tier + walked-global both come from this list).
    okey = jnp.where(over, zbits, SENT)
    oidx = jnp.arange(n, dtype=jnp.int32)
    if n < g_max:
        okey = jnp.concatenate([okey, jnp.full((g_max - n,), SENT)])
        oidx = jnp.concatenate([oidx, jnp.zeros((g_max - n,), jnp.int32)])
    sok, sidx = jax.lax.sort((okey, oidx), num_keys=1)
    gk, gi = sok[:g_max], sidx[:g_max]
    gvalid = gk != SENT
    # Small gathers (g_max-sized) of the compacted tris' rects + verts.
    t0xg, t0yg = tx0[gi], ty0[gi]
    wbing, cntg = wbin[gi], cnt[gi]
    zbg = gk & 0x1FFFFF
    midv = gvalid & (cntg <= k2_slots)
    gv = verts[gi]
    gv0 = gv[:, 0]

    # Tier 2 keys: k2_slots static slots per compacted tri.
    cols2 = [slot_key(k, t0xg, t0yg, wbing, zbg,
                      midv & (jnp.int32(k) < cntg))
             for k in range(k2_slots)]
    keys2 = jnp.stack(cols2).reshape(-1)            # (k2_slots * g_max,)
    keys = jnp.concatenate([keys, keys2])

    def padto(a, fill):                             # tiny scene: pad up
        if a.shape[0] >= p_max:
            return a
        return jnp.concatenate(
            [a, jnp.full((p_max - a.shape[0],), fill, a.dtype)])

    keys = padto(keys, SENT)
    v0 = verts[:, 0]

    def tiers(col_all, col_g):                      # tier-matched payload
        return jnp.concatenate(
            [jnp.tile(col_all, k_slots), jnp.tile(col_g, k2_slots)])

    if payload:
        pay = [(v0[:, c], gv0[:, c]) for c in range(3)]
        pay += [(verts[:, 1, c] - v0[:, c], gv[:, 1, c] - gv0[:, c])
                for c in range(3)]
        pay += [(verts[:, 2, c] - v0[:, c], gv[:, 2, c] - gv0[:, c])
                for c in range(3)]
        tid = jnp.arange(n, dtype=jnp.int32).astype(jnp.float32)
        pay.append((tid, gi.astype(jnp.float32)))
        ops = (keys,) + tuple(padto(tiers(a, g), 0) for a, g in pay)
        srt = jax.lax.sort(ops, num_keys=1)
        skey = srt[0][:p_max]
        spay = [s[:p_max] for s in srt[1:]]
        svalid = skey != SENT
        spay[9] = jnp.where(svalid, spay[9], jnp.float32(-1.0))
        lanes = jnp.stack(spay, axis=1)             # (p_max, 10)
    else:
        idx = padto(tiers(jnp.arange(n, dtype=jnp.int32), gi), 0)
        skey, stri = jax.lax.sort((keys, idx), num_keys=1)
        skey, stri = skey[:p_max], stri[:p_max]
        svalid = skey != SENT
        sv = verts[stri]
        sv0 = sv[:, 0]
        lanes = jnp.concatenate([
            sv0, sv[:, 1] - sv0, sv[:, 2] - sv0,
            jnp.where(svalid, stri, -1).astype(jnp.float32)[:, None],
        ], axis=1)
    nr = p_max // TPB
    rows_b = jnp.zeros((nr, 128), jnp.float32).at[:, : TPB * TRI_LANES].set(
        lanes.reshape(nr, TPB * TRI_LANES))
    zdec = jax.lax.bitcast_convert_type((skey & 0x1FFFFF) << 11, jnp.float32)
    zdec = jnp.where(svalid, zdec, INF)
    rows_b = rows_b.at[:, ZLANE].set(jnp.min(zdec.reshape(nr, TPB), axis=1))
    sgroup = skey >> 21
    pair0 = jnp.searchsorted(sgroup, mcodes, side="left").astype(jnp.int32)
    pair1 = jnp.searchsorted(sgroup, mcodes, side="right").astype(jnp.int32)
    row0 = pair0 // TPB
    row1 = jnp.minimum((pair1 + TPB - 1) // TPB, nr)

    # Walked-global tier: cnt > k2_slots tris only, z-ascending.
    okey2 = jnp.where(gvalid & ~midv, gk, SENT)
    sok2, gslot = jax.lax.sort(
        (okey2, jnp.arange(g_max, dtype=jnp.int32)), num_keys=1)
    g2k = sok2[:g2_max]
    g2valid = g2k != SENT
    g2i = gi[gslot[:g2_max]]
    g2v = verts[g2i]
    g2v0 = g2v[:, 0]
    glanes = jnp.concatenate([
        g2v0, g2v[:, 1] - g2v0, g2v[:, 2] - g2v0,
        jnp.where(g2valid, g2i, -1).astype(jnp.float32)[:, None],
    ], axis=1)
    gnr = g2_max // TPB
    grows = jnp.zeros((gnr, 128), jnp.float32).at[:, : TPB * TRI_LANES].set(
        glanes.reshape(gnr, TPB * TRI_LANES))
    gzdec = jax.lax.bitcast_convert_type((g2k & 0x1FFFFF) << 11, jnp.float32)
    gzdec = jnp.where(g2valid, gzdec, INF)
    grows = grows.at[:, ZLANE].set(jnp.min(gzdec.reshape(gnr, TPB), axis=1))
    g_r1 = (jnp.minimum(n_over2, g2_max) + TPB - 1) // TPB

    rows = jnp.concatenate([grows, rows_b], axis=0)
    sorted_total = jnp.sum(jnp.where(over2, 0, cnt))
    ok = ((sorted_total <= p_max) & (n_over <= g_max)
          & (n_over2 <= g2_max))
    return (rows, row0 + gnr, row1 + gnr,
            g_r1.reshape(1).astype(jnp.int32), ok)


# --------------------------------------------------------------------------
# The Pallas kernel


def _make_kernel(n_bins: int, unroll: int, ez_chunk: int, n_rows: int,
                 g_prefix: bool = False):
    shape = (8, 128)

    def kernel(*refs):
        if g_prefix:
            (scal_ref, row0_ref, row1_ref, gref, rows_ref, dirs_ref,
             out_t, out_id, out_u, out_v) = refs
        else:
            (scal_ref, row0_ref, row1_ref, rows_ref, dirs_ref,
             out_t, out_id, out_u, out_v) = refs
        nr8 = n_bins * 8
        ox, oy, oz = scal_ref[0], scal_ref[1], scal_ref[2]
        tn, tx = scal_ref[3], scal_ref[4]

        def bin_body(b, _):
            base = b * 8
            dx = dirs_ref[pl.ds(base, 8), :]
            dy = dirs_ref[pl.ds(nr8 + base, 8), :]
            dz = dirs_ref[pl.ds(2 * nr8 + base, 8), :]
            zero = jnp.zeros(shape, jnp.float32)
            cur_t = zero + tx
            cur_id = jnp.zeros(shape, jnp.int32) - 1
            r0 = row0_ref[b]
            r1 = row1_ref[b]

            def mt_row(trow, hs):
                cur_t, cur_id, cur_u, cur_v = hs
                ln = lambda c: trow[0, c]
                cands = []
                for jj in range(TPB):
                    bl = TRI_LANES * jj
                    v0x, v0y, v0z = ln(bl + 0), ln(bl + 1), ln(bl + 2)
                    e1x, e1y, e1z = ln(bl + 3), ln(bl + 4), ln(bl + 5)
                    e2x, e2y, e2z = ln(bl + 6), ln(bl + 7), ln(bl + 8)
                    tid = ln(bl + 9).astype(jnp.int32)
                    # Identical MT arithmetic (op order, rounding) as
                    # trace/packet_pallas.py -- bit-equal t/u/v.
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
                    ok = ((det != 0) & (tid >= 0) & (u >= 0) & (v >= 0)
                          & (u + v <= 1) & (t > tn))
                    cands.append((
                        jnp.where(ok, t, INF),
                        jnp.where(ok, tid, jnp.int32(0x7FFFFFFF)),
                        u, v,
                    ))
                while len(cands) > 1:
                    nxt = []
                    for a, bnd in zip(cands[0::2], cands[1::2]):
                        take = (bnd[0] < a[0]) | ((bnd[0] == a[0])
                                                  & (bnd[1] < a[1]))
                        nxt.append(tuple(jnp.where(take, bnd[i], a[i])
                                         for i in range(4)))
                    if len(cands) % 2:
                        nxt.append(cands[-1])
                    cands = nxt
                bt, bid = cands[0][0], cands[0][1]
                acc = (bt < cur_t) | ((bt == cur_t) & (bid < cur_id))
                return (jnp.where(acc, bt, cur_t),
                        jnp.where(acc, bid, cur_id),
                        jnp.where(acc, cands[0][2], cur_u),
                        jnp.where(acc, cands[0][3], cur_v))

            def chunk_rows(r, hs, count):
                # `count` unrolled independent row loads (latencies
                # overlap; stray rows past r1 hold a neighbour bin's real
                # triangles or inert tid=-1 pad -- exact either way).
                tbs = [rows_ref[pl.ds(jnp.minimum(r + i, n_rows - 1), 1), :]
                       for i in range(count)]
                for tb in tbs:
                    hs = mt_row(tb, hs)
                return hs

            def walk(w0, w1, hs):
                if ez_chunk == 0:
                    n_it = (w1 - w0 + (unroll - 1)) // unroll

                    def fbody(k, hs):
                        return chunk_rows(w0 + k * unroll, hs, unroll)

                    return jax.lax.fori_loop(0, n_it, fbody, hs)
                # Early-z chunk loop: rows are zmin-ascending inside the
                # range; stop once the next row's conservative zmin
                # exceeds every ray's current hit t (misses hold t = tmax,
                # so a tile only cuts off after it is fully hit --
                # primaries indoors, the headline case).

                def wcond(c):
                    r, hs, live = c
                    return (r < w1) & live

                def wbody(c):
                    r, hs, _ = c
                    hs = chunk_rows(r, hs, ez_chunk)
                    rn = r + ez_chunk
                    zrow = rows_ref[pl.ds(jnp.minimum(rn, n_rows - 1), 1), :]
                    znext = zrow[0, ZLANE]
                    live = znext <= jnp.max(hs[0])
                    return rn, hs, live

                _, hs, _ = jax.lax.while_loop(
                    wcond, wbody, (w0, hs, jnp.bool_(True)))
                return hs

            hs = (cur_t, cur_id, zero, zero)
            if g_prefix:
                # Global tier: tris covering more bins than the fixed-slot
                # prep's k_slots cap (plus near-plane crossers) live in a
                # z-ascending row prefix every bin tests first -- exact
                # (extra exact MT tests never change a closest hit).
                hs = walk(jnp.int32(0), gref[0], hs)
            hs = walk(r0, r1, hs)

            out_t[pl.ds(base, 8), :] = hs[0]
            out_id[pl.ds(base, 8), :] = hs[1]
            out_u[pl.ds(base, 8), :] = hs[2]
            out_v[pl.ds(base, 8), :] = hs[3]
            return 0

        jax.lax.fori_loop(0, n_bins, bin_body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_bins", "unroll", "ez_chunk", "interpret"))
def trace_binraster_rows(rows, row0, row1, dirs, scalars, g_r1=None, *,
                         n_bins: int, unroll: int = 4, ez_chunk: int = 8,
                         interpret: bool = False):
    """Trace the prepped row tables. dirs: (3*n_bins*8, 128) f32 component-
    stacked ray dirs in Morton slot order; scalars: (8,) f32
    [ox, oy, oz, tmin, tmax, 0, 0, 0]. g_r1: optional (1,) i32 -- number
    of global-tier rows at the head of `rows` that every bin must test
    first (binraster_prep_fast's overflow tier); None = no global tier.
    Returns (tri, t, u, v) flat (n_bins*1024,) in slot order; tri == -1
    on miss."""
    nr8 = n_bins * 8
    nrows = rows.shape[0]
    g_prefix = g_r1 is not None
    params = {}
    if not interpret:
        table_bytes = (rows.shape[0] + dirs.shape[0] + 4 * nr8) * 128 * 4
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(table_bytes + (16 << 20), 127 << 20))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    args = [scalars, row0, row1]
    in_specs = [sspec, sspec, sspec]
    if g_prefix:
        args.append(g_r1)
        in_specs.append(sspec)
    args += [rows, dirs]
    in_specs += [vspec, vspec]
    out = pl.pallas_call(
        _make_kernel(n_bins, unroll, ez_chunk, nrows, g_prefix),
        in_specs=in_specs,
        out_specs=[vspec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((nr8, 128), jnp.float32),
            jax.ShapeDtypeStruct((nr8, 128), jnp.int32),
            jax.ShapeDtypeStruct((nr8, 128), jnp.float32),
            jax.ShapeDtypeStruct((nr8, 128), jnp.float32),
        ],
        interpret=interpret,
        **params,
    )(*args)
    t = out[0].reshape(-1)
    tri = out[1].reshape(-1)
    return tri, t, out[2].reshape(-1), out[3].reshape(-1)


# --------------------------------------------------------------------------
# Public entry: full primary-frame trace


def pick_gmax(n_over: int, floor: int = 1536) -> int:
    """Static overflow bucket (multiple of TPB rows-of-12)."""
    cap = floor
    while cap < n_over * 1.3 + 24:
        cap = cap * 3 // 2
        cap -= cap % 12
    return cap


def trace_binraster_primary(verts_dev, cam, dirn, *, width, height,
                            tile=32, unroll=4, ez_chunk=8,
                            interpret=False, p_max=None, prep="fast",
                            k_slots=8, g_max=None, payload=True,
                            k2_slots=64):
    """Primary-ray closest-hit over the full camera grid.

    verts_dev: (n,3,3) f32 device triangle vertices. cam: raygen
    camera_arrays dict. dirn: (W*H, 3) normalized dirs in Morton slot
    order (raygen.primary output). Returns (tri, t, u, v) in slot order.

    prep: "fast" (gather-free fixed-slot, the measured-fast path) or
    "v0" (stream-expansion reference formulation -- same image).

    Caller contract: W % tile == 0 and H % tile == 0 and tile a power of
    two (Morton blocks are only contiguous for power-of-two tiles).
    """
    if width % tile or height % tile or tile & (tile - 1):
        raise ValueError("W/H must be multiples of the power-of-two tile")
    txn, tyn = width // tile, height // tile
    nb = txn * tyn
    rays_per_bin = tile * tile
    assert rays_per_bin % 128 == 0 and rays_per_bin // 128 == 8, \
        "kernel tiles are (8,128): tile must be 32"
    dirs = jnp.transpose(dirn).reshape(3 * nb * 8, 128)
    scalars = jnp.concatenate([
        cam["pos"].astype(jnp.float32),
        jnp.stack([cam["znear"], cam["zfar"],
                   jnp.float32(0), jnp.float32(0), jnp.float32(0)]),
    ])
    if prep == "fast":
        total, n_mid, n_g = (int(x) for x in count_pairs_fast(
            verts_dev, cam, width=width, height=height, tile=tile,
            k_slots=k_slots, k2_slots=k2_slots))
        if p_max is None:
            p_max = pick_pmax(total)
        if g_max is None:
            g_max = pick_gmax(n_mid + n_g)
        g2_max = pick_gmax(n_g, floor=192)
        mcodes = jnp.asarray(_bin_mcodes(txn, tyn))
        rows, row0, row1, g_r1, ok = binraster_prep_fast(
            verts_dev, cam, mcodes, width=width, height=height,
            tile=tile, k_slots=k_slots, g_max=g_max, p_max=p_max,
            payload=payload, k2_slots=k2_slots, g2_max=g2_max)
        tri, t, u, v = trace_binraster_rows(
            rows, row0, row1, dirs, scalars, g_r1,
            n_bins=nb, unroll=unroll, ez_chunk=ez_chunk,
            interpret=interpret)
        # Static-bucket overflow poisons hits (-2) so any unchecked race
        # with a camera change fails golden gates loudly.
        return jnp.where(ok, tri, -2), t, u, v
    if p_max is None:
        total = int(count_pairs(verts_dev, cam,
                                width=width, height=height, tile=tile))
        p_max = pick_pmax(total)
    block_bin = jnp.asarray(bin_order(txn, tyn))
    rows, row0, row1, total_t = binraster_prep(
        verts_dev, cam, block_bin,
        width=width, height=height, tile=tile, p_max=p_max)
    if int(total_t) > p_max:
        # Bucket raced a camera change; rebuild at the bigger bucket.
        return trace_binraster_primary(
            verts_dev, cam, dirn, width=width, height=height, tile=tile,
            unroll=unroll, ez_chunk=ez_chunk, interpret=interpret,
            p_max=pick_pmax(int(total_t)), prep="v0")
    return trace_binraster_rows(
        rows, row0, row1, dirs, scalars,
        n_bins=nb, unroll=unroll, ez_chunk=ez_chunk, interpret=interpret)
