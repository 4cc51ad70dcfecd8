"""Dense-lane bin-raster primary engine (v2): extract-free MT tiles.

Reference parity: same benchmark surface as the upstream persistent
packet tracers on PRIMARY rays (SURVEY.md SS3.3), exact Moller-Trumbore,
closest hit, lowest-tri-id tie-break -- pixel-identical to the BVH
engines and to trace/binraster.py (v1).

Why a v2: the v1 kernel reads every triangle's 10 constants with scalar
lane extracts (`trow[0, c]`) -- ~10 extracts x ~300k visited pairs
~ 3M scalar-pipe ops at 2.7-8 ns each, which PERF_NOTES.md round-2/3
probes identify as exactly the serial scalar-issue work that caps the
packet family at ~43 Mrays/s. v2 removes the scalar pipe from the pair
loop entirely:

  * Triangles live SUBLANE-major in (8, 128) tiles: 11 groups of 8 tris,
    each group owning 11 lanes [v0.xyz e1.xyz e2.xyz tid zmin]. A
    triangle constant is a `(8, 1)` static lane slice that broadcasts
    against `(8, 128)` ray tiles inside the arithmetic -- the
    vector-pipe operand-broadcast pattern the slabbc knob proved both
    Mosaic-legal and fastest (PERF_NOTES round-3 session 6).
  * Ray-direction rows are replicated sublane-wise once per bin
    (packet_common.rep_rows concat -- the Mosaic-safe replication).
  * Each (8-tri group) x (128-ray row) pair tile is ~45 straight-line
    VPU ops; accumulators keep one lexicographic (t, id) slot per
    sublane and reduce 8 -> 1 once per bin with axis-0 rolls.

Work scaling: VPU pair-tests = pairs x rays/bin. Quartering the bin tile
(32 -> 16 px) quarters rays/bin while pair counts grow only with tri
bbox perimeter (scripts/binraster_tilesize_study.py prices it per
scene), so `tile` is a tuning knob here rather than v1's fixed 32.

Exactness: bins only cull; every tested pair runs MT with the identical
op order/rounding as trace/packet_pallas.py (bit-equal t/u/v); extra
exact tests from group-of-88 range straddle cannot change a closest hit
(same superset argument as v1 / bvh/packed.py). Lex (t, tri) min is
visit-order invariant. Early-z terminates a bin only when the next
row's conservative zmin exceeds every ray's current hit t (misses hold
t = tmax), identical to v1's rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntrace_tpu.trace.binraster import _counts, Z_MARGIN, INF
from ntrace_tpu.trace.packet_common import rep_rows
from ntrace_tpu.ops.morton import _part1by1

GPT = 8          # tris per group (sublanes)
GROUPS = 11      # groups per (8, 128) tile
TPT = GPT * GROUPS   # 88 tris per tile
CPL = 11         # lanes per group: v0(3) e1(3) e2(3) tid zmin


def bin_mcodes(txn: int, tyn: int, max_bits: int) -> np.ndarray:
    """Sorted 2D Morton codes of all bins (bin slot = Morton block rank)."""
    from ntrace_tpu.ops.morton import morton2d

    bx, by = np.meshgrid(np.arange(txn), np.arange(tyn))
    mc = np.sort(morton2d(np, bx.ravel(), by.ravel()))
    if mc[-1] >= 1 << max_bits:
        raise ValueError("bin grid exceeds the fused sort key's bin bits")
    return mc.astype(np.int32)


def pick_quant(total: int, quantum: int, floor: int, slack: float = 1.15,
               pad: int = 96) -> int:
    """Static geometric capacity bucket rounded to `quantum`."""
    cap = max(floor, quantum)
    while cap < total * slack + pad:
        cap = cap * 3 // 2
    cap += (-cap) % quantum
    return cap


def pick_cap(total: int, quantum: int, slack: float = 1.05,
             pad: int = 1024) -> int:
    """Near-exact static capacity: ceil(total * slack + pad) to quantum.

    Every prep op (sort / gather / scatter / pack) and the kernel table
    scale with the cap, so the dense path sizes tightly (the geometric
    pick_quant bucket averaged ~27% padding = ~27% prep tax) and re-arms
    -- one recount + recompile -- when a camera swing pushes the pair
    count past the slack. Coarse `quantum` keeps the jit cache from
    fragmenting across small drifts."""
    cap = int(total * slack) + pad
    cap += (-cap) % quantum
    return max(cap, quantum)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile", "k_slots", "k2_slots"))
def count_pairs_dense(verts, cam, *, width, height, tile, k_slots,
                      k2_slots=64):
    """(sorted-tier pairs incl. mid tier, mid-tier tris, global tris)."""
    *_, cnt, _ = _counts(verts, cam, width=width, height=height, tile=tile)
    over = cnt > k_slots
    over2 = cnt > k2_slots
    return (jnp.sum(jnp.where(over2, 0, cnt)),
            jnp.sum((over & ~over2).astype(jnp.int32)),
            jnp.sum(over2.astype(jnp.int32)))


@functools.partial(
    jax.jit, static_argnames=("width", "height", "tile", "k_cap"))
def count_hist_dense(verts, cam, *, width, height, tile, k_cap=64):
    """Arm pass for prep v5: (total pairs, N_k histogram, global-tier
    count) where N_k = #{included tris with cnt > k} for k < k_cap."""
    *_, cnt, _ = _counts(verts, cam, width=width, height=height,
                         tile=tile)
    over2 = cnt > k_cap
    cntc = jnp.where(over2 | (cnt <= 0), 0, cnt)
    ks = jnp.arange(k_cap, dtype=jnp.int32)
    hist = jnp.sum((cntc[:, None] > ks[None, :]).astype(jnp.int32),
                   axis=0)
    return (jnp.sum(cntc), hist,
            jnp.sum(over2.astype(jnp.int32)))


def _pack_dense(skey, lanes, zdec, p_cap):
    """(p_cap,) sorted pairs -> (p_cap//88 * 8, 128) dense tiles.

    Pair p sits at tile p//88, sublane (p%88)//11, group p%11 (lanes
    11g..11g+10 hold [v0 e1 e2 tid zmin]) -- the INTERLEAVED group
    assignment makes this a pure reshape of the sorted (p, 11) column
    array (a transpose here costs seconds: lane-dim-11 intermediates pad
    to 128 physically, the LBVH bounds-table lesson). Visit order within
    a tile is irrelevant under the kernel's lexicographic min, and pair
    T*88 (the tile's z-minimum) still lands at sublane 0 / group 0 /
    lane 10, which is all early-z reads.
    """
    nt = p_cap // TPT
    cols = jnp.concatenate([lanes, zdec[:, None]], axis=1)   # (p, 11)
    flat = cols.reshape(nt * GPT, GROUPS * CPL)
    out = jnp.zeros((nt * GPT, 128), jnp.float32)
    return out.at[:, : GROUPS * CPL].set(flat)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile", "k_slots", "g_max",
                     "p_max", "k2_slots", "g2_max", "z_bits"))
def binraster_prep_dense(verts, cam, mcodes, *, width, height, tile,
                         k_slots, g_max, p_max, k2_slots=64, g2_max=TPT,
                         z_bits=19):
    """Gather-free fixed-slot prep emitting the dense-lane tile layout.

    Same two-tier + walked-global structure and exactness argument as
    trace/binraster.py binraster_prep_fast (fixed k_slots static slots
    per tri, z-sorted mid tier, tiny global tier for huge tris); the sort
    key is (bin_morton << z_bits) | truncated-z with z_bits sized so the
    bin grid fits 31 bits at any supported tile size.

    Returns (rows (g2_max//88*8 + p_max//88*8, 128) f32, row0, row1 (nb,)
    i32 tile indices, g_r1 (1,) i32 global-tier tiles, ok bool).
    """
    n = verts.shape[0]
    zshift = 32 - z_bits
    zmask = (1 << z_bits) - 1
    tx0, tx1, ty0, ty1, cnt, zmin = _counts(
        verts, cam, width=width, height=height, tile=tile)
    wbin = tx1 - tx0 + 1
    over = cnt > k_slots
    over2 = cnt > k2_slots
    n_over = jnp.sum(over.astype(jnp.int32))
    n_over2 = jnp.sum(over2.astype(jnp.int32))
    zsafe = jnp.maximum(zmin * (1.0 - Z_MARGIN), 0.0)
    zbits = ((jax.lax.bitcast_convert_type(zsafe, jnp.int32) >> zshift)
             & zmask)
    SENT = jnp.int32(0x7FFFFFFF)

    def slot_key(k, t0x, t0y, w, zb, valid):
        kk = jnp.int32(k)
        bx = t0x + kk % w
        by = t0y + kk // w
        mc = ((_part1by1(jnp, by) << jnp.uint32(1))
              | _part1by1(jnp, bx)).astype(jnp.int32)
        return jnp.where(valid, (mc << z_bits) | zb, SENT)

    cols = [slot_key(k, tx0, ty0, wbin, zbits,
                     (~over) & (jnp.int32(k) < cnt))
            for k in range(k_slots)]
    keys = jnp.stack(cols).reshape(-1)

    okey = jnp.where(over, zbits, SENT)
    oidx = jnp.arange(n, dtype=jnp.int32)
    if n < g_max:
        okey = jnp.concatenate([okey, jnp.full((g_max - n,), SENT)])
        oidx = jnp.concatenate([oidx, jnp.zeros((g_max - n,), jnp.int32)])
    sok, sidx = jax.lax.sort((okey, oidx), num_keys=1)
    gk, gi = sok[:g_max], sidx[:g_max]
    gvalid = gk != SENT
    t0xg, t0yg = tx0[gi], ty0[gi]
    wbing, cntg = wbin[gi], cnt[gi]
    zbg = gk & zmask
    midv = gvalid & (cntg <= k2_slots)
    gv = verts[gi]
    gv0 = gv[:, 0]

    cols2 = [slot_key(k, t0xg, t0yg, wbing, zbg,
                      midv & (jnp.int32(k) < cntg))
             for k in range(k2_slots)]
    keys = jnp.concatenate([keys, jnp.stack(cols2).reshape(-1)])

    def padto(a, fill):
        if a.shape[0] >= p_max:
            return a
        return jnp.concatenate(
            [a, jnp.full((p_max - a.shape[0],), fill, a.dtype)])

    keys = padto(keys, SENT)
    v0 = verts[:, 0]

    def tiers(col_all, col_g):
        return jnp.concatenate(
            [jnp.tile(col_all, k_slots), jnp.tile(col_g, k2_slots)])

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
    lanes = jnp.stack(spay, axis=1)                  # (p_max, 10)
    zdec = jax.lax.bitcast_convert_type(
        (skey & zmask) << zshift, jnp.float32)
    zdec = jnp.where(svalid, zdec, INF)
    rows_b = _pack_dense(skey, lanes, zdec, p_max)

    sgroup = skey >> z_bits
    # Tile-granularity bin ranges: straddle rows test a neighbour's real
    # triangles or inert tid=-1 pad -- exact either way.
    pair0 = jnp.searchsorted(sgroup, mcodes, side="left").astype(jnp.int32)
    pair1 = jnp.searchsorted(sgroup, mcodes, side="right").astype(jnp.int32)
    row0 = pair0 // TPT
    row1 = jnp.minimum((pair1 + TPT - 1) // TPT, p_max // TPT)

    # Walked-global tier (tris covering > k2_slots bins), z-ascending.
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
    gzdec = jax.lax.bitcast_convert_type(
        (g2k & zmask) << zshift, jnp.float32)
    gzdec = jnp.where(g2valid, gzdec, INF)
    grows = _pack_dense(g2k, glanes, gzdec, g2_max)
    g_r1 = (jnp.minimum(n_over2, g2_max) + TPT - 1) // TPT

    rows = jnp.concatenate([grows, rows_b], axis=0)
    gnt = g2_max // TPT
    sorted_total = jnp.sum(jnp.where(over2, 0, cnt))
    ok = ((sorted_total <= p_max) & (n_over <= g_max)
          & (n_over2 <= g2_max))
    return (rows, row0 + gnt, row1 + gnt,
            g_r1.reshape(1).astype(jnp.int32), ok)


# --------------------------------------------------------------------------
# prep v3: one-scatter expand + one row-gather + compact sort
#
# The r4 device probes priced the v2 prep's bottleneck as ONE op: the
# 11-operand lax.sort over the fixed-slot tier stack (280k tris x 8
# static slots + mid tier = 2.33M elements -> 21.3 ms), while the same
# sort at the COMPACT pair count (462k) costs ~2 ms in-graph
# (results_r4_dense2.json / results_prep3_bisect.json sort11-key).
# The primitive pricing that matters (full-consumption, in-graph):
#
#   * cumulative ops are ~free (jnp.cumsum @462k: 0.02 ms,
#     results_cumsum_variants.json),
#   * ROW-gathers cost ~5 ns/row regardless of row width (2.3 ms per
#     462k-row (16,) gather, results_prep_primitives.json),
#   * VALUE-scatters cost the same ~2.3-2.6 ms PER OPERAND
#     (scatter13 = 30 ms, results_cumsum_variants.json) -- a
#     13-channel delta-scatter fill-forward is 34 ms and dead on
#     arrival (results_prep3_bisect.json ff13),
#   * searchsorted @462k is 58 ms: never.
#
# So the expand pays for exactly ONE scatter and ONE row-gather:
#
#   tri_of_p: scatter-MAX each tri's index at its exclusive-cumsum
#     offset, then lax.cummax. Zero-length segments (culled / global-
#     tier tris) share their offset with the next emitting tri; the
#     emitting owner has the LARGEST index among sharers (all sharers
#     below it emit nothing), so the max is the owner, and cummax
#     propagates it across the segment. Slots past `total` are masked.
#   attributes: one (n, 16)-row gather T[tri_of_p] carries all per-tri
#     channels to pair slots (9 vert-coord bit patterns, packed bin
#     rect, truncated z, offset).
#
# Then ONE 11-operand sort at the compact count orders pairs by
# (bin Morton << z_bits) | truncated-z, and the pack reshape is
# unchanged. z_bits drops 19 -> 12: z order only drives early-z tile
# termination (a superset walk either way; exactness is unaffected), and
# 12 bits leaves 19 for bin Morton (grids to 724x724 bins vs v2's 64x64
# ADVICE limit).


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile", "p_max", "k_cap",
                     "g2_max", "z_bits", "sort_mode"))
def binraster_prep_dense3(verts, cam, mcodes, *, width, height, tile,
                          p_max, k_cap=64, g2_max=0, z_bits=12,
                          sort_mode="s11"):
    """Gather-free compact-sort prep (v3). Same output contract and
    exactness argument as binraster_prep_dense: (rows, row0, row1, g_r1,
    ok) dense-lane tiles; bins only cull, pad rows carry tid=-1, lex
    (t, tri) min is visit-order invariant. Tris covering more than k_cap
    bins go to the walked global tier (g2_max rows; pass 0 when the
    count pass saw none and the tier vanishes)."""
    n = verts.shape[0]
    zshift = 32 - z_bits
    zmask = (1 << z_bits) - 1
    SENT = jnp.int32(0x7FFFFFFF)
    tx0, tx1, ty0, ty1, cnt, zmin = _counts(
        verts, cam, width=width, height=height, tile=tile)
    wbin = tx1 - tx0 + 1
    zsafe = jnp.maximum(zmin * (1.0 - Z_MARGIN), 0.0)
    zb = ((jax.lax.bitcast_convert_type(zsafe, jnp.int32) >> zshift)
          & zmask)
    over2 = cnt > k_cap
    incl = ~over2 & (cnt > 0)
    cntc = jnp.where(incl, cnt, 0)
    offs = jnp.cumsum(cntc) - cntc                     # exclusive
    total = jnp.sum(cntc)

    # tri_of_p: ONE scatter-max + cummax (see module note's owner proof).
    tri_of_p = jax.lax.cummax(
        jnp.zeros((p_max,), jnp.int32).at[offs].max(
            jnp.arange(n, dtype=jnp.int32), mode="drop"))
    # All per-tri channels ride ONE (n, 16)-row gather: 9 vert-coord bit
    # patterns + packed bin rect (tx0:10|ty0:10|wbin:11) + truncated z +
    # exclusive offset + padding to the 16-lane row.
    v0 = verts[:, 0]
    cols = [v0[:, c] for c in range(3)]
    cols += [verts[:, 1, c] - v0[:, c] for c in range(3)]
    cols += [verts[:, 2, c] - v0[:, c] for c in range(3)]
    tbl = jnp.stack(
        [jax.lax.bitcast_convert_type(c, jnp.int32) for c in cols]
        + [tx0 | (ty0 << 10) | (wbin << 20), zb, offs], axis=1)
    tbl = jnp.concatenate(
        [tbl, jnp.zeros((n, 16 - tbl.shape[1]), jnp.int32)], axis=1)
    G = tbl[tri_of_p]                                  # (p_max, 16)

    p = jnp.arange(p_max, dtype=jnp.int32)
    valid = p < total
    k = p - G[:, 11]
    ch1 = G[:, 9]
    tx0p, ty0p = ch1 & 1023, (ch1 >> 10) & 1023
    wp = jnp.maximum((ch1 >> 20) & 2047, 1)
    zbp = G[:, 10]
    bx = tx0p + k % wp
    by = ty0p + k // wp
    mc = ((_part1by1(jnp, by) << jnp.uint32(1))
          | _part1by1(jnp, bx)).astype(jnp.int32)
    key = jnp.where(valid, (mc << z_bits) | zbp, SENT)

    # Payload movement A/B (r4 device pricing): "s11" carries the 9
    # vert-bit channels + tid through the sort; "sg" sorts (key, iota)
    # and moves payload with one post-sort (p, 10)-row gather.
    if sort_mode == "sg":
        skey, perm = jax.lax.sort((key, p), num_keys=1)
        G2 = jnp.concatenate([G[:, :9], tri_of_p[:, None]], axis=1)[perm]
        paych = [G2[:, c] for c in range(9)] + [G2[:, 9]]
    else:
        srt = jax.lax.sort(
            (key,) + tuple(G[:, c] for c in range(9)) + (tri_of_p,),
            num_keys=1)
        skey = srt[0]
        paych = list(srt[1:])
    svalid = skey != SENT
    lanes = jnp.stack(
        [jax.lax.bitcast_convert_type(b, jnp.float32) for b in paych[:9]]
        + [jnp.where(svalid, paych[9], -1).astype(jnp.float32)], axis=1)
    zdec = jax.lax.bitcast_convert_type(
        (skey & zmask) << zshift, jnp.float32)
    zdec = jnp.where(svalid, zdec, INF)
    rows_b = _pack_dense(skey, lanes, zdec, p_max)

    # Tile-granularity walk ranges via tile-min/max keys: searchsorted
    # over the 88x-smaller per-tile extrema gives bit-identical rows to
    # pair-level searchsorted + //TPT rounding (first tile whose max
    # reaches the bin / first tile whose min exceeds it).
    sgroup = skey >> z_bits
    gt = sgroup.reshape(p_max // TPT, TPT)
    row0 = jnp.searchsorted(gt[:, TPT - 1], mcodes,
                            side="left").astype(jnp.int32)
    row1 = jnp.searchsorted(gt[:, 0], mcodes,
                            side="right").astype(jnp.int32)
    ok = (total <= p_max) & (jnp.sum(over2.astype(jnp.int32)) <= g2_max)
    if g2_max == 0:
        return rows_b, row0, row1, None, ok

    # Walked global tier (z-ascending), as v2.
    okey2 = jnp.where(over2, zb, SENT)
    sok2, g2i = jax.lax.sort(
        (okey2, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    g2k, g2i = sok2[:g2_max], g2i[:g2_max]
    g2valid = g2k != SENT
    g2v = verts[g2i]
    g2v0 = g2v[:, 0]
    glanes = jnp.concatenate([
        g2v0, g2v[:, 1] - g2v0, g2v[:, 2] - g2v0,
        jnp.where(g2valid, g2i, -1).astype(jnp.float32)[:, None],
    ], axis=1)
    gzdec = jax.lax.bitcast_convert_type(g2k << zshift, jnp.float32)
    gzdec = jnp.where(g2valid, gzdec, INF)
    grows = _pack_dense(g2k, glanes, gzdec, g2_max)
    g_r1 = ((jnp.minimum(jnp.sum(over2.astype(jnp.int32)), g2_max)
             + TPT - 1) // TPT)
    gnt = g2_max // TPT
    rows = jnp.concatenate([grows, rows_b], axis=0)
    return (rows, row0 + gnt, row1 + gnt,
            g_r1.reshape(1).astype(jnp.int32), ok)


# --------------------------------------------------------------------------
# prep v4: scatter-ADD expand + single post-sort gather
#
# v3-sg's pair-granularity budget (r4 device bisect, ~463k pairs):
# scatter-MAX ~2.8 ms + (n,16)-row pre-sort gather ~3.4 ms + 2-op sort
# ~1.5 ms + (p,10)-row post-sort gather ~2.3 ms. v4 restructures to the
# op-count floor of the sort-based family:
#
#   * tri_of_p via ONE scatter-ADD + cumsum instead of scatter-max +
#     cummax: emitters scatter (i - prev_emitter_index) at their
#     exclusive offset; the cumsum telescopes to owner+1 across every
#     pair slot (zero-cnt tris scatter nothing via an out-of-range
#     dropped index, and emitters have distinct offsets, so no adds
#     collide). XLA lowers the sorted-unique-index add measurably
#     cheaper than the max variant.
#   * the pre-sort gather shrinks to the KEY meta only -- one (n, 4)
#     row gather (packed rect | zb | offs); row gathers price per ROW,
#     not per lane, so 4 lanes cost what 16 did.
#   * the sort carries (key, tri) -- two i32 operands.
#   * ONE post-sort (n, 16)-row gather by sorted tri index carries all
#     nine vert-coord channels; tid IS the sorted index.
#
# Output contract, exactness argument and tie behavior are identical to
# binraster_prep_dense3 (bins only cull; pad rows carry tid=-1; lex
# (t, tri) min is visit-order invariant).


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile", "p_max", "k_cap",
                     "g2_max", "z_bits"))
def binraster_prep_dense4(verts, cam, mcodes, *, width, height, tile,
                          p_max, k_cap=64, g2_max=0, z_bits=12):
    """Compact-sort prep v4. Same (rows, row0, row1, g_r1, ok) contract
    as binraster_prep_dense3."""
    n = verts.shape[0]
    zshift = 32 - z_bits
    zmask = (1 << z_bits) - 1
    SENT = jnp.int32(0x7FFFFFFF)
    tx0, tx1, ty0, ty1, cnt, zmin = _counts(
        verts, cam, width=width, height=height, tile=tile)
    wbin = tx1 - tx0 + 1
    zsafe = jnp.maximum(zmin * (1.0 - Z_MARGIN), 0.0)
    zb = ((jax.lax.bitcast_convert_type(zsafe, jnp.int32) >> zshift)
          & zmask)
    over2 = cnt > k_cap
    incl = ~over2 & (cnt > 0)
    cntc = jnp.where(incl, cnt, 0)
    offs = jnp.cumsum(cntc) - cntc                     # exclusive
    total = jnp.sum(cntc)
    iota_n = jnp.arange(n, dtype=jnp.int32)

    # tri_of_p: ONE scatter-add of index deltas + cumsum (module note).
    pe = jax.lax.cummax(jnp.where(incl, iota_n, -1))
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), pe[:-1]])
    delta = jnp.where(incl, iota_n - prev, 0)
    offs_d = jnp.where(incl, offs, p_max)              # drop non-emitters
    d = jnp.zeros((p_max,), jnp.int32).at[offs_d].add(delta, mode="drop")
    tri_of_p = jnp.maximum(jnp.cumsum(d) - 1, 0)

    # Key meta rides ONE (n, 4)-row gather.
    meta = jnp.stack(
        [tx0 | (ty0 << 10) | (wbin << 20), zb, offs,
         jnp.zeros_like(offs)], axis=1)
    Gm = meta[tri_of_p]                                # (p_max, 4)
    p = jnp.arange(p_max, dtype=jnp.int32)
    valid = p < total
    k = p - Gm[:, 2]
    ch1 = Gm[:, 0]
    tx0p, ty0p = ch1 & 1023, (ch1 >> 10) & 1023
    wp = jnp.maximum((ch1 >> 20) & 2047, 1)
    bx = tx0p + k % wp
    by = ty0p + k // wp
    mc = ((_part1by1(jnp, by) << jnp.uint32(1))
          | _part1by1(jnp, bx)).astype(jnp.int32)
    key = jnp.where(valid, (mc << z_bits) | Gm[:, 1], SENT)

    skey, stri = jax.lax.sort((key, tri_of_p), num_keys=1)
    svalid = skey != SENT

    # All nine vert channels ride ONE post-sort (n, 16)-row gather.
    v0 = verts[:, 0]
    cols = [v0[:, c] for c in range(3)]
    cols += [verts[:, 1, c] - v0[:, c] for c in range(3)]
    cols += [verts[:, 2, c] - v0[:, c] for c in range(3)]
    tbl = jnp.stack(
        [jax.lax.bitcast_convert_type(c, jnp.int32) for c in cols], axis=1)
    tbl = jnp.concatenate(
        [tbl, jnp.zeros((n, 16 - tbl.shape[1]), jnp.int32)], axis=1)
    Gv = tbl[stri]                                     # (p_max, 16)
    lanes = jnp.stack(
        [jax.lax.bitcast_convert_type(Gv[:, c], jnp.float32)
         for c in range(9)]
        + [jnp.where(svalid, stri, -1).astype(jnp.float32)], axis=1)
    zdec = jax.lax.bitcast_convert_type(
        (skey & zmask) << zshift, jnp.float32)
    zdec = jnp.where(svalid, zdec, INF)
    rows_b = _pack_dense(skey, lanes, zdec, p_max)

    sgroup = skey >> z_bits
    gt = sgroup.reshape(p_max // TPT, TPT)
    row0 = jnp.searchsorted(gt[:, TPT - 1], mcodes,
                            side="left").astype(jnp.int32)
    row1 = jnp.searchsorted(gt[:, 0], mcodes,
                            side="right").astype(jnp.int32)
    ok = (total <= p_max) & (jnp.sum(over2.astype(jnp.int32)) <= g2_max)
    if g2_max == 0:
        return rows_b, row0, row1, None, ok

    # Walked global tier (z-ascending), as v3.
    okey2 = jnp.where(over2, zb, SENT)
    sok2, g2i = jax.lax.sort(
        (okey2, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    g2k, g2i = sok2[:g2_max], g2i[:g2_max]
    g2valid = g2k != SENT
    g2v = verts[g2i]
    g2v0 = g2v[:, 0]
    glanes = jnp.concatenate([
        g2v0, g2v[:, 1] - g2v0, g2v[:, 2] - g2v0,
        jnp.where(g2valid, g2i, -1).astype(jnp.float32)[:, None],
    ], axis=1)
    gzdec = jax.lax.bitcast_convert_type(g2k << zshift, jnp.float32)
    gzdec = jnp.where(g2valid, gzdec, INF)
    grows = _pack_dense(g2k, glanes, gzdec, g2_max)
    g_r1 = ((jnp.minimum(jnp.sum(over2.astype(jnp.int32)), g2_max)
             + TPT - 1) // TPT)
    gnt = g2_max // TPT
    rows = jnp.concatenate([grows, rows_b], axis=0)
    return (rows, row0 + gnt, row1 + gnt,
            g_r1.reshape(1).astype(jnp.int32), ok)


# --------------------------------------------------------------------------
# prep v5 "slices": zero-gather emission via prefix slices of a
# cnt-descending triangle sort
#
# The r5 gather-formulation sweep (PERF_NOTES round-5 session 2) proved
# the DYNAMIC-INDEX ROW GATHER is the prep's irreducible XLA cost class
# (~0.3 ms/lane + fixed, 14-19 ns/row) while SORT PAYLOAD OPERANDS cost
# ~+0.1 ms each and static slices/concats are plain copies. v5 therefore
# removes every gather from the pipeline:
#
#   1. ONE triangle-level sort by DESCENDING bin count (i32 key
#      -cnt; culled / global-tier tris keyed to the end) carrying all 13
#      per-tri channels (9 vert-coord bit patterns, tid, packed rect,
#      truncated z, cnt) -- n-sized, so its payload tax is paid at
#      ~n/p of the pair-level rate.
#   2. Pair emission by STATIC PREFIX SLICES: after the sort, the first
#      N_k = #{cnt > k} rows are EXACTLY the tris covering more than k
#      bins, so slice k of length >= N_k (arm-time quantized static,
#      validity-masked by the riding cnt channel) enumerates every
#      (tri, k-th bin) pair with zero waste and zero gather -- a pure
#      concat of row slices. The slice index IS k.
#   3. The usual pair-level key sort (11 operands -- measured ~2 ms at
#      the compact count) orders pairs by (bin Morton << z_bits) | z and
#      carries the payload to _pack_dense.
#
# Output contract, exactness and tie behavior identical to
# binraster_prep_dense3: the emitted pair MULTISET is the same (every
# included tri x its covered bins), bins only cull, pad rows carry
# tid=-1, and the kernel's lex (t, tri) min is visit-order invariant --
# so any within-key ordering difference vs v3 cannot change a pixel.
# n_ks: arm-time slice lengths, one per k, each >= the true N_k (the
# in-graph `ok` re-checks this; quantized lengths only add masked pad).
# Callers size p_max >= sum(n_ks) (pick_cap over the emitted slot count)
# -- a truncated emission would drop real pairs, so the trace statically
# forces ok=False if the caps ever disagree.


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile", "p_max", "k_cap",
                     "g2_max", "z_bits", "n_ks"))
def binraster_prep_dense5(verts, cam, mcodes, *, width, height, tile,
                          p_max, n_ks, k_cap=64, g2_max=0, z_bits=12):
    n = verts.shape[0]
    zshift = 32 - z_bits
    zmask = (1 << z_bits) - 1
    SENT = jnp.int32(0x7FFFFFFF)
    tx0, tx1, ty0, ty1, cnt, zmin = _counts(
        verts, cam, width=width, height=height, tile=tile)
    wbin = tx1 - tx0 + 1
    zsafe = jnp.maximum(zmin * (1.0 - Z_MARGIN), 0.0)
    zb = ((jax.lax.bitcast_convert_type(zsafe, jnp.int32) >> zshift)
          & zmask)
    over2 = cnt > k_cap
    incl = ~over2 & (cnt > 0)
    cntc = jnp.where(incl, cnt, 0)
    total = jnp.sum(cntc)

    # 1. cnt-descending tri sort, payload riding as operands.
    skey = jnp.where(incl, -cnt, SENT)
    v0 = verts[:, 0]
    chans = [jax.lax.bitcast_convert_type(v0[:, c], jnp.int32)
             for c in range(3)]
    chans += [jax.lax.bitcast_convert_type(
        verts[:, 1, c] - v0[:, c], jnp.int32) for c in range(3)]
    chans += [jax.lax.bitcast_convert_type(
        verts[:, 2, c] - v0[:, c], jnp.int32) for c in range(3)]
    chans += [jnp.arange(n, dtype=jnp.int32),          # tid
              tx0 | (ty0 << 10) | (wbin << 20),        # packed rect
              zb, cntc]
    srt = jax.lax.sort((skey,) + tuple(chans), num_keys=1)
    tri_tbl = jnp.stack(srt[1:], axis=1)               # (n, 13)

    # 2. Prefix-slice emission: slice k = first n_ks[k] rows, k-index
    #    static per slice. Pure row-slice concat; no gather.
    nk_max = max(n_ks) if n_ks else 0
    if nk_max > n:   # quantized slice longer than the table: pad rows
        pad = jnp.zeros((nk_max - n, 13), jnp.int32)   # cnt=0 -> masked
        tri_tbl = jnp.concatenate([tri_tbl, pad], axis=0)
    if n_ks:
        parts = [tri_tbl[:nk] for nk in n_ks]
        kcol = jnp.concatenate(
            [jnp.full((nk,), k, jnp.int32) for k, nk in enumerate(n_ks)])
        pairs = jnp.concatenate(parts, axis=0)
    else:   # nothing visible: every slot pads to SENT below
        pairs = jnp.zeros((0, 13), jnp.int32)
        kcol = jnp.zeros((0,), jnp.int32)
    e = pairs.shape[0]
    caps_ok = e <= p_max   # static; arm sizes p_max over sum(n_ks)
    if e < p_max:
        pairs = jnp.concatenate(
            [pairs, jnp.zeros((p_max - e, 13), jnp.int32)], axis=0)
        kcol = jnp.concatenate(
            [kcol, jnp.zeros((p_max - e,), jnp.int32)])
    elif not caps_ok:
        # Truncation would drop real pairs; force the fallback path.
        pairs, kcol = pairs[:p_max], kcol[:p_max]

    valid = kcol < pairs[:, 12]
    ch1 = pairs[:, 10]
    tx0p, ty0p = ch1 & 1023, (ch1 >> 10) & 1023
    wp = jnp.maximum((ch1 >> 20) & 2047, 1)
    bx = tx0p + kcol % wp
    by = ty0p + kcol // wp
    mc = ((_part1by1(jnp, by) << jnp.uint32(1))
          | _part1by1(jnp, bx)).astype(jnp.int32)
    key = jnp.where(valid, (mc << z_bits) | pairs[:, 11], SENT)

    # 3. Pair-level key sort carrying payload (the measured-cheap mover).
    psrt = jax.lax.sort(
        (key,) + tuple(pairs[:, c] for c in range(9)) + (pairs[:, 9],),
        num_keys=1)
    skey2 = psrt[0]
    svalid = skey2 != SENT
    lanes = jnp.stack(
        [jax.lax.bitcast_convert_type(b, jnp.float32) for b in psrt[1:10]]
        + [jnp.where(svalid, psrt[10], -1).astype(jnp.float32)], axis=1)
    zdec = jax.lax.bitcast_convert_type(
        (skey2 & zmask) << zshift, jnp.float32)
    zdec = jnp.where(svalid, zdec, INF)
    rows_b = _pack_dense(skey2, lanes, zdec, p_max)

    sgroup = skey2 >> z_bits
    gt = sgroup.reshape(p_max // TPT, TPT)
    row0 = jnp.searchsorted(gt[:, TPT - 1], mcodes,
                            side="left").astype(jnp.int32)
    row1 = jnp.searchsorted(gt[:, 0], mcodes,
                            side="right").astype(jnp.int32)
    # ok: every pair emitted (slice k covered all cnt > k tris) and the
    # caps hold. N_k true = #{cnt > k}; checked against the static n_ks.
    ks = jnp.arange(len(n_ks), dtype=jnp.int32)
    nk_true = jnp.sum((cntc[:, None] > ks[None, :]).astype(jnp.int32),
                      axis=0)
    nk_static = jnp.asarray(list(n_ks), jnp.int32)
    ok = ((total <= p_max) & jnp.all(nk_true <= nk_static)
          & (jnp.max(cntc) <= len(n_ks)) & caps_ok
          & (jnp.sum(over2.astype(jnp.int32)) <= g2_max))
    if g2_max == 0:
        return rows_b, row0, row1, None, ok

    # Walked global tier (z-ascending), as v3.
    okey2 = jnp.where(over2, zb, SENT)
    sok2, g2i = jax.lax.sort(
        (okey2, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    g2k, g2i = sok2[:g2_max], g2i[:g2_max]
    g2valid = g2k != SENT
    g2v = verts[g2i]
    g2v0 = g2v[:, 0]
    glanes = jnp.concatenate([
        g2v0, g2v[:, 1] - g2v0, g2v[:, 2] - g2v0,
        jnp.where(g2valid, g2i, -1).astype(jnp.float32)[:, None],
    ], axis=1)
    gzdec = jax.lax.bitcast_convert_type(g2k << zshift, jnp.float32)
    gzdec = jnp.where(g2valid, gzdec, INF)
    grows = _pack_dense(g2k, glanes, gzdec, g2_max)
    g_r1 = ((jnp.minimum(jnp.sum(over2.astype(jnp.int32)), g2_max)
             + TPT - 1) // TPT)
    gnt = g2_max // TPT
    rows = jnp.concatenate([grows, rows_b], axis=0)
    return (rows, row0 + gnt, row1 + gnt,
            g_r1.reshape(1).astype(jnp.int32), ok)


def pick_nks(cnt_hist, quantum: int = 2048, slack: float = 1.05,
             pad: int = 64):
    """Arm-time slice lengths for prep v5 from the count pass.

    cnt_hist: host int array where cnt_hist[k] = #{tris with cnt > k},
    k < k_cap (descending by construction). Each length is quantized up
    (jit-cache stability across small camera drifts) with slack + pad so
    re-arms are rare; trailing zero slices are dropped.
    """
    n_ks = []
    for nk in np.asarray(cnt_hist).tolist():
        if nk == 0:
            break
        q = int(nk * slack) + pad
        q += (-q) % quantum
        n_ks.append(q)
    return tuple(n_ks)


# --------------------------------------------------------------------------
# The dense kernel


def _make_dense_kernel(n_bins: int, ray_rows: int, ez_chunk: int,
                       n_tiles: int, g_prefix: bool, bpg: int, probe=None,
                       tpv: int = 1):
    """probe: measurement knockouts (scripts/dense_kernel_bisect.py), not
    for rendering -- 'nowalk' skips every tile visit (prices the per-bin
    fixed cost), 'groups1' runs 1 of the 11 tri groups per visited tile
    (splits per-visit load/control cost from per-group MT arithmetic).

    The kernel runs on a GRID over groups of `bpg` bins: outputs are
    blocked (bpg * ray_rows, 128) per step so every result store is a
    STATIC block-local write, and dir rows are blocked the same way so
    every ray load is static too. The r4 store0 A/B priced the old
    dynamic per-row output stores at ~52% of the whole kernel, and the
    grouped-but-still-dynamic aligned store recovered none of it
    (results_dense_kernel_bisect.json / results_r4_dense2.json): Mosaic
    only elides the store cost when the address is static."""
    shape = (GPT, 128)
    groups = 1 if probe == "groups1" else GROUPS

    def kernel(*refs):
        if g_prefix:
            (row0_ref, row1_ref, gref, scal_ref, rows_ref, dirs_ref,
             out_t, out_id, out_u, out_v) = refs
        else:
            (row0_ref, row1_ref, scal_ref, rows_ref, dirs_ref,
             out_t, out_id, out_u, out_v) = refs
        # Ray scalars ride a plain f32 SMEM operand (scalar i32->f32
        # bitcast is not a legal Mosaic op; tpu.bitcast wants vectors).
        ox, oy, oz = scal_ref[0], scal_ref[1], scal_ref[2]
        tn, tx = scal_ref[3], scal_ref[4]

        def run_bin(b, j):
            # Ray rows replicated to (8, 128) once per bin (Mosaic-safe
            # concat) -- reused by every triangle group. dirs_ref is the
            # (3, bpg * ray_rows, 128) block of this grid step: static.
            drep = []
            for r in range(ray_rows):
                dx = rep_rows(dirs_ref[0, pl.ds(j * ray_rows + r, 1), :],
                              GPT)
                dy = rep_rows(dirs_ref[1, pl.ds(j * ray_rows + r, 1), :],
                              GPT)
                dz = rep_rows(dirs_ref[2, pl.ds(j * ray_rows + r, 1), :],
                              GPT)
                drep.append((dx, dy, dz))
            accs = [(jnp.full(shape, 1.0, jnp.float32) * tx,
                     jnp.full(shape, -1, jnp.int32),
                     jnp.zeros(shape, jnp.float32),
                     jnp.zeros(shape, jnp.float32))
                    for _ in range(ray_rows)]

            def tile_tris_arr(tt, accs):
                for g in range(groups):
                    c = lambda k: tt[:, CPL * g + k: CPL * g + k + 1]
                    v0x, v0y, v0z = c(0), c(1), c(2)
                    e1x, e1y, e1z = c(3), c(4), c(5)
                    e2x, e2y, e2z = c(6), c(7), c(8)
                    # Materialize the (8, 1) tri-id column to (8, 128)
                    # with ONE legal binop broadcast; selects then see
                    # equal shapes (mixed-shape selects are in the
                    # Mosaic broadcast-crash family, PERF_NOTES r3s6).
                    tid = (c(9).astype(jnp.int32)
                           + jnp.zeros(shape, jnp.int32))
                    # Per-group constants ((8,1) columns): identical
                    # values/op-order as packet_pallas MT computes per
                    # pair -- f32 elementwise, so bit-equal.
                    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
                    qx = tvy * e1z - tvz * e1y
                    qy = tvz * e1x - tvx * e1z
                    qz = tvx * e1y - tvy * e1x
                    c0 = e2x * qx + e2y * qy + e2z * qz
                    okg = tid >= 0                       # (8, 128)
                    new = []
                    for (dx, dy, dz), hs in zip(drep, accs):
                        cur_t, cur_id, cur_u, cur_v = hs
                        px = dy * e2z - dz * e2y
                        py = dz * e2x - dx * e2z
                        pz = dx * e2y - dy * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        inv = np.float32(1.0) / jnp.where(
                            det == 0, np.float32(1.0), det)
                        u = (tvx * px + tvy * py + tvz * pz) * inv
                        v = (dx * qx + dy * qy + dz * qz) * inv
                        t = c0 * inv
                        ok = ((det != 0) & okg & (u >= 0) & (v >= 0)
                              & (u + v <= 1) & (t > tn))
                        bt = jnp.where(ok, t, INF)
                        bid = jnp.where(ok, tid, jnp.int32(0x7FFFFFFF))
                        acc = (bt < cur_t) | ((bt == cur_t)
                                              & (bid < cur_id))
                        new.append((jnp.where(acc, bt, cur_t),
                                    jnp.where(acc, bid, cur_id),
                                    jnp.where(acc, u, cur_u),
                                    jnp.where(acc, v, cur_v)))
                    accs = new
                return accs

            def tile_tris(w, accs):
                tt = rows_ref[pl.ds(jnp.minimum(w, n_tiles - 1) * GPT,
                                    GPT), :]
                return tile_tris_arr(tt, accs)

            def walk(w0, w1, accs):
                if ez_chunk == 0:
                    if tpv == 1:
                        def fbody(k, accs):
                            return tile_tris(w0 + k, accs)

                        return jax.lax.fori_loop(0, w1 - w0, fbody, accs)

                    # tpv tiles per loop trip behind ONE dynamic load
                    # (the r4 bisect priced the per-visit fixed cost --
                    # dominated by the dynamic tt load -- at ~460 ns vs
                    # ~12 ns per 8-tri MT group, so fewer/bigger loads
                    # win). The base clamp can re-test earlier tiles:
                    # idempotent under the lexicographic min.
                    def fbody(k, accs):
                        base = jnp.minimum((w0 + k * tpv) * GPT,
                                           (n_tiles - tpv) * GPT)
                        tt_big = rows_ref[pl.ds(base, tpv * GPT), :]
                        for i in range(tpv):
                            accs = tile_tris_arr(
                                tt_big[i * GPT:(i + 1) * GPT], accs)
                        return accs

                    trips = (w1 - w0 + tpv - 1) // tpv
                    return jax.lax.fori_loop(0, trips, fbody, accs)

                def wcond(c):
                    w, accs, live = c
                    return (w < w1) & live

                def wbody(c):
                    w, accs, _ = c
                    # Tiles past w1 clamp to w1-1: re-accumulating the
                    # same candidates is idempotent under lex-min.
                    for i in range(ez_chunk):
                        accs = tile_tris(jnp.minimum(w + i, w1 - 1), accs)
                    wn = w + ez_chunk
                    zrow = rows_ref[pl.ds(jnp.minimum(wn, n_tiles - 1)
                                          * GPT, 1), :]
                    znext = zrow[0, 10]
                    mt = accs[0][0]
                    for hs in accs[1:]:
                        mt = jnp.maximum(mt, hs[0])
                    live = znext <= jnp.max(mt)
                    return wn, accs, live

                _, accs, _ = jax.lax.while_loop(
                    wcond, wbody, (w0, accs, jnp.bool_(True)))
                return accs

            if g_prefix:
                accs = walk(jnp.int32(0), gref[0], accs)
            if probe == "nowalk":
                accs = walk(row0_ref[b], row0_ref[b], accs)
            else:
                accs = walk(row0_ref[b], row1_ref[b], accs)

            # Lexicographic 8 -> 1 sublane reduction per ray row
            # (axis-0 rolls are Mosaic-safe): one (1, 128) result row per
            # 128 rays, returned for the block-level static store.
            rows_out = []
            for r, hs in enumerate(accs):
                cur = hs
                sh = GPT // 2
                while sh >= 1:
                    rl = tuple(pltpu.roll(a, sh, axis=0) for a in cur)
                    take = (rl[0] < cur[0]) | ((rl[0] == cur[0])
                                               & (rl[1] < cur[1]))
                    cur = tuple(jnp.where(take, rl[i], cur[i])
                                for i in range(4))
                    sh //= 2
                rows_out.append(tuple(a[0:1] for a in cur))
            return rows_out

        g = pl.program_id(0)
        res = []
        for j in range(bpg):
            res += run_bin(g * bpg + j, j)
        tile = [jnp.concatenate([rr_[i] for rr_ in res], axis=0)
                for i in range(4)]
        out_t[:, :] = tile[0]
        out_id[:, :] = tile[1]
        out_u[:, :] = tile[2]
        out_v[:, :] = tile[3]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_bins", "ray_rows", "ez_chunk", "interpret",
                     "probe", "tpv"))
def trace_dense_rows(rows, row0, row1, dirs, scalars, g_r1=None, *,
                     n_bins: int, ray_rows: int, ez_chunk: int = 4,
                     interpret: bool = False, probe=None, tpv: int = 1):
    """Trace prepped dense tiles. dirs: (3 * n_bins * ray_rows, 128) f32
    component-stacked dirs in Morton slot order; scalars: (8,) f32
    [ox, oy, oz, tmin, tmax, 0, 0, 0]. Returns (tri, t, u, v) flat
    (n_bins * ray_rows * 128,) in slot order; tri == -1 on miss."""
    nrd = n_bins * ray_rows
    n_tiles = rows.shape[0] // GPT
    g_prefix = g_r1 is not None
    # Bins per grid step: each step's result block is >= 8 sublanes so
    # the static block store is tile-aligned.
    bpg = max(8 // ray_rows, 1)
    if n_bins % bpg:
        bpg = 1
    brows = bpg * ray_rows
    params = {}
    if not interpret:
        table_bytes = (rows.shape[0] + dirs.shape[0] + 4 * nrd) * 128 * 4
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(table_bytes + (16 << 20), 127 << 20))
    dirs3 = dirs.reshape(3, nrd, 128)
    # Bin walk ranges ride scalar prefetch (i32); the f32 ray scalars
    # ride a plain SMEM operand (scalar bitcast is not Mosaic-legal).
    pref = [row0, row1]
    if g_prefix:
        pref.append(g_r1)
    npf = len(pref)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    dirs_spec = pl.BlockSpec((3, brows, 128),
                             lambda g, *_: (0, g, 0),
                             memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((brows, 128), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_dense_kernel(n_bins, ray_rows, ez_chunk, n_tiles, g_prefix,
                           bpg, probe, tpv=max(min(tpv, n_tiles), 1)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=npf,
            grid=(n_bins // bpg,),
            in_specs=[sspec, table_spec, dirs_spec],
            out_specs=[ospec] * 4,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nrd, 128), jnp.float32),
            jax.ShapeDtypeStruct((nrd, 128), jnp.int32),
            jax.ShapeDtypeStruct((nrd, 128), jnp.float32),
            jax.ShapeDtypeStruct((nrd, 128), jnp.float32),
        ],
        interpret=interpret,
        **params,
    )(*pref, scalars, rows, dirs3)
    t = out[0].reshape(-1)
    tri = out[1].reshape(-1)
    return tri, t, out[2].reshape(-1), out[3].reshape(-1)


# --------------------------------------------------------------------------
# The DMA walk kernel
#
# Session-1/2b anatomy of the walk kernel's 3.7-4.25 ms: MT arithmetic
# ~0.8 ms (groups1 A/B), per-bin fixed ~0 (nowalk), the rest is the
# per-visit DYNAMIC load path (~350 ns/visit). This variant keeps the
# walk schedule but moves the tile table to HBM and DOUBLE-BUFFERS the
# visit loads with explicit async DMA: while tile k computes, tile k+1
# is in flight. Starts and waits are balanced per walk (prologue start
# guarded on a non-empty range; in-loop start only for k+1 < trips), so
# semaphores never leak across bins. Identical arithmetic and visit
# order to trace_dense_rows -- bit-identical results.


def _make_dense_kernel_dma(n_bins: int, ray_rows: int, n_tiles: int,
                           g_prefix: bool, bpg: int):
    shape = (GPT, 128)

    def kernel(*refs):
        if g_prefix:
            (row0_ref, row1_ref, gref, scal_ref, rows_hbm, dirs_ref,
             out_t, out_id, out_u, out_v, buf, sem) = refs
        else:
            (row0_ref, row1_ref, scal_ref, rows_hbm, dirs_ref,
             out_t, out_id, out_u, out_v, buf, sem) = refs
        ox, oy, oz = scal_ref[0], scal_ref[1], scal_ref[2]
        tn, tx = scal_ref[3], scal_ref[4]

        def dma(k, w0, slot):
            w = jnp.minimum(w0 + k, n_tiles - 1)
            return pltpu.make_async_copy(
                rows_hbm.at[pl.ds(w * GPT, GPT), :], buf.at[slot],
                sem.at[slot])

        def run_bin(b, j):
            drep = []
            for r in range(ray_rows):
                dx = rep_rows(dirs_ref[0, pl.ds(j * ray_rows + r, 1), :],
                              GPT)
                dy = rep_rows(dirs_ref[1, pl.ds(j * ray_rows + r, 1), :],
                              GPT)
                dz = rep_rows(dirs_ref[2, pl.ds(j * ray_rows + r, 1), :],
                              GPT)
                drep.append((dx, dy, dz))
            accs = [(jnp.full(shape, 1.0, jnp.float32) * tx,
                     jnp.full(shape, -1, jnp.int32),
                     jnp.zeros(shape, jnp.float32),
                     jnp.zeros(shape, jnp.float32))
                    for _ in range(ray_rows)]

            def tile_tris_arr(tt, accs):
                for g in range(GROUPS):
                    c = lambda k: tt[:, CPL * g + k: CPL * g + k + 1]
                    v0x, v0y, v0z = c(0), c(1), c(2)
                    e1x, e1y, e1z = c(3), c(4), c(5)
                    e2x, e2y, e2z = c(6), c(7), c(8)
                    tid = (c(9).astype(jnp.int32)
                           + jnp.zeros(shape, jnp.int32))
                    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
                    qx = tvy * e1z - tvz * e1y
                    qy = tvz * e1x - tvx * e1z
                    qz = tvx * e1y - tvy * e1x
                    c0 = e2x * qx + e2y * qy + e2z * qz
                    okg = tid >= 0
                    new = []
                    for (dx, dy, dz), hs in zip(drep, accs):
                        cur_t, cur_id, cur_u, cur_v = hs
                        px = dy * e2z - dz * e2y
                        py = dz * e2x - dx * e2z
                        pz = dx * e2y - dy * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        inv = np.float32(1.0) / jnp.where(
                            det == 0, np.float32(1.0), det)
                        u = (tvx * px + tvy * py + tvz * pz) * inv
                        v = (dx * qx + dy * qy + dz * qz) * inv
                        t = c0 * inv
                        ok = ((det != 0) & okg & (u >= 0) & (v >= 0)
                              & (u + v <= 1) & (t > tn))
                        bt = jnp.where(ok, t, INF)
                        bid = jnp.where(ok, tid, jnp.int32(0x7FFFFFFF))
                        acc = (bt < cur_t) | ((bt == cur_t)
                                              & (bid < cur_id))
                        new.append((jnp.where(acc, bt, cur_t),
                                    jnp.where(acc, bid, cur_id),
                                    jnp.where(acc, u, cur_u),
                                    jnp.where(acc, v, cur_v)))
                    accs = new
                return accs

            def walk(w0, w1, accs):
                trips = w1 - w0

                @pl.when(trips > 0)
                def _():
                    dma(0, w0, 0).start()

                def fbody(k, accs):
                    slot = jax.lax.rem(k, 2)

                    @pl.when(k + 1 < trips)
                    def _():
                        dma(k + 1, w0, 1 - slot).start()

                    dma(k, w0, slot).wait()
                    return tile_tris_arr(buf[slot], accs)

                return jax.lax.fori_loop(0, trips, fbody, accs)

            if g_prefix:
                accs = walk(jnp.int32(0), gref[0], accs)
            accs = walk(row0_ref[b], row1_ref[b], accs)

            rows_out = []
            for r, hs in enumerate(accs):
                cur = hs
                sh = GPT // 2
                while sh >= 1:
                    rl = tuple(pltpu.roll(a, sh, axis=0) for a in cur)
                    take = (rl[0] < cur[0]) | ((rl[0] == cur[0])
                                               & (rl[1] < cur[1]))
                    cur = tuple(jnp.where(take, rl[i], cur[i])
                                for i in range(4))
                    sh //= 2
                rows_out.append(tuple(a[0:1] for a in cur))
            return rows_out

        g = pl.program_id(0)
        res = []
        for j in range(bpg):
            res += run_bin(g * bpg + j, j)
        tile = [jnp.concatenate([rr_[i] for rr_ in res], axis=0)
                for i in range(4)]
        out_t[:, :] = tile[0]
        out_id[:, :] = tile[1]
        out_u[:, :] = tile[2]
        out_v[:, :] = tile[3]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_bins", "ray_rows", "interpret"))
def trace_dense_rows_dma(rows, row0, row1, dirs, scalars, g_r1=None, *,
                         n_bins: int, ray_rows: int,
                         interpret: bool = False):
    """trace_dense_rows with double-buffered manual tile DMA from HBM.
    Identical contract and bit-identical results."""
    nrd = n_bins * ray_rows
    n_tiles = rows.shape[0] // GPT
    g_prefix = g_r1 is not None
    bpg = max(8 // ray_rows, 1)
    if n_bins % bpg:
        bpg = 1
    brows = bpg * ray_rows
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(
                (dirs.shape[0] + 4 * nrd) * 128 * 4 + (16 << 20),
                127 << 20))
    dirs3 = dirs.reshape(3, nrd, 128)
    pref = [row0, row1]
    if g_prefix:
        pref.append(g_r1)
    npf = len(pref)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    dirs_spec = pl.BlockSpec((3, brows, 128),
                             lambda g, *_: (0, g, 0),
                             memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((brows, 128), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_dense_kernel_dma(n_bins, ray_rows, n_tiles, g_prefix, bpg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=npf,
            grid=(n_bins // bpg,),
            in_specs=[sspec, hbm_spec, dirs_spec],
            out_specs=[ospec] * 4,
            scratch_shapes=[
                pltpu.VMEM((2, GPT, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nrd, 128), jnp.float32),
            jax.ShapeDtypeStruct((nrd, 128), jnp.int32),
            jax.ShapeDtypeStruct((nrd, 128), jnp.float32),
            jax.ShapeDtypeStruct((nrd, 128), jnp.float32),
        ],
        interpret=interpret,
        **params,
    )(*pref, scalars, rows, dirs3)
    t = out[0].reshape(-1)
    tri = out[1].reshape(-1)
    return tri, t, out[2].reshape(-1), out[3].reshape(-1)


# --------------------------------------------------------------------------
# The visit-list kernel
#
# The r5 session-1 knockouts priced the walk kernel's anatomy: the
# 11-group MT arithmetic is ~0.8 ms of the 3.67 ms frame (groups1 A/B)
# and the per-bin fixed cost ~0 (nowalk) -- ~2.9 ms is the per-visit
# DYNAMIC VMEM load path (rows_ref[pl.ds(w*8, 8)] with a computed w:
# scalar address chain + unpipelined copy, ~390 ns x ~8k visits; tpv
# batching made it worse). The fix is structural: enumerate the
# (bin, tile) VISITS in prep (cheap -- one more tiny expand), make them
# the GRID, and let the Pallas pipeline deliver each visit's tile as a
# statically-shaped block whose index comes from a scalar-prefetch map
# (vis_tile). Same trick for the ray block (vis_bin). Accumulators live
# in VMEM scratch, which persists across sequential TPU grid steps:
# initialized on each bin's first visit, lex-reduced 8->1 and written to
# the output block on its last (visits are bin-contiguous by
# construction, so the output-block revisit window is exactly the bin's
# visit run).
#
# Exactness: identical tile data, identical MT op order, identical lex
# (t, id) accumulate as the walk kernel. Filler visits (empty-range bins
# and V_cap padding) point at an arbitrary real tile: every tested pair
# runs the exact MT predicate, and a triangle whose projection misses
# the bin cannot intersect the bin's rays, so extra tests are inert
# (the v1/v2 superset argument). Early-z is not supported here (tuned
# ez=0 everywhere); scenes needing the walked-global tier get their
# global tiles PREPENDED to every bin's visit run.


def visit_cap(p_max: int, nb: int, g2_max: int = 0) -> int:
    """Static upper bound on the visit count: every tile contributes at
    most (#distinct bins whose pairs it holds) visits <= nt + nb - 1
    boundary crossings (pairs are bin-sorted), plus <= 1 straddle and
    the >=1-visit floor per bin, plus the per-bin global prefix."""
    nt = p_max // TPT
    v = nt + 2 * nb + nb * (g2_max // TPT)
    return v + (-v) % 8


@functools.partial(jax.jit, static_argnames=("v_cap", "nb"))
def build_visit_list(row0, row1, g_r1, *, v_cap, nb):
    """Expand per-bin tile ranges into (vis_tile, vis_bin) i32 arrays of
    static length v_cap (bin-contiguous; padded visits repeat the last
    real visit's tile under bin nb-1 -- inert, see module note)."""
    g = jnp.int32(0) if g_r1 is None else g_r1[0]
    nv = jnp.maximum(row1 - row0, 1) + g
    voffs = jnp.cumsum(nv) - nv
    total = jnp.sum(nv)
    iota_b = jnp.arange(nb, dtype=jnp.int32)
    bin_of_v = jax.lax.cummax(
        jnp.zeros((v_cap,), jnp.int32).at[voffs].max(iota_b, mode="drop"))
    v = jnp.arange(v_cap, dtype=jnp.int32)
    slot = v - voffs[bin_of_v]
    r0b, r1b = row0[bin_of_v], row1[bin_of_v]
    # slot < g: global-prefix tiles 0..g-1; else range tile (clamped so
    # the >=1 floor and padding visits re-test a real tile, inert).
    tile = jnp.where(slot < g, slot,
                     jnp.minimum(r0b + slot - g, jnp.maximum(r1b - 1, r0b)))
    valid = v < total
    tile = jnp.where(valid, tile, tile[jnp.maximum(total - 1, 0)])
    binv = jnp.where(valid, bin_of_v, nb - 1)
    return tile, binv


def _make_visits_kernel(ray_rows: int, v_cap: int):
    shape = (GPT, 128)

    def kernel(vt_ref, bv_ref, scal_ref, tile_ref, dirs_ref,
               out_t, out_id, out_u, out_v, *scratch):
        acc_t, acc_id, acc_u, acc_v = scratch
        v = pl.program_id(0)
        ox, oy, oz = scal_ref[0], scal_ref[1], scal_ref[2]
        tn, tx = scal_ref[3], scal_ref[4]
        b = bv_ref[v]
        first = jnp.where(v == 0, True, bv_ref[jnp.maximum(v - 1, 0)] != b)
        last = jnp.where(v == v_cap - 1, True,
                         bv_ref[jnp.minimum(v + 1, v_cap - 1)] != b)

        @pl.when(first)
        def _():
            for r in range(ray_rows):
                acc_t[r * GPT:(r + 1) * GPT, :] = (
                    jnp.full(shape, 1.0, jnp.float32) * tx)
                acc_id[r * GPT:(r + 1) * GPT, :] = jnp.full(shape, -1,
                                                            jnp.int32)
                acc_u[r * GPT:(r + 1) * GPT, :] = jnp.zeros(shape,
                                                            jnp.float32)
                acc_v[r * GPT:(r + 1) * GPT, :] = jnp.zeros(shape,
                                                            jnp.float32)

        tt = tile_ref[0]
        drep = []
        for r in range(ray_rows):
            dx = rep_rows(dirs_ref[0, 0, r:r + 1, :], GPT)
            dy = rep_rows(dirs_ref[0, 1, r:r + 1, :], GPT)
            dz = rep_rows(dirs_ref[0, 2, r:r + 1, :], GPT)
            drep.append((dx, dy, dz))
        accs = [(acc_t[r * GPT:(r + 1) * GPT, :],
                 acc_id[r * GPT:(r + 1) * GPT, :],
                 acc_u[r * GPT:(r + 1) * GPT, :],
                 acc_v[r * GPT:(r + 1) * GPT, :]) for r in range(ray_rows)]

        for g in range(GROUPS):
            c = lambda k: tt[:, CPL * g + k: CPL * g + k + 1]
            v0x, v0y, v0z = c(0), c(1), c(2)
            e1x, e1y, e1z = c(3), c(4), c(5)
            e2x, e2y, e2z = c(6), c(7), c(8)
            tid = c(9).astype(jnp.int32) + jnp.zeros(shape, jnp.int32)
            tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            c0 = e2x * qx + e2y * qy + e2z * qz
            okg = tid >= 0
            new = []
            for (dx, dy, dz), hs in zip(drep, accs):
                cur_t, cur_id, cur_u, cur_v = hs
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv = np.float32(1.0) / jnp.where(
                    det == 0, np.float32(1.0), det)
                u = (tvx * px + tvy * py + tvz * pz) * inv
                vv = (dx * qx + dy * qy + dz * qz) * inv
                t = c0 * inv
                ok = ((det != 0) & okg & (u >= 0) & (vv >= 0)
                      & (u + vv <= 1) & (t > tn))
                bt = jnp.where(ok, t, INF)
                bid = jnp.where(ok, tid, jnp.int32(0x7FFFFFFF))
                acc = (bt < cur_t) | ((bt == cur_t) & (bid < cur_id))
                new.append((jnp.where(acc, bt, cur_t),
                            jnp.where(acc, bid, cur_id),
                            jnp.where(acc, u, cur_u),
                            jnp.where(acc, vv, cur_v)))
            accs = new
        for r in range(ray_rows):
            acc_t[r * GPT:(r + 1) * GPT, :] = accs[r][0]
            acc_id[r * GPT:(r + 1) * GPT, :] = accs[r][1]
            acc_u[r * GPT:(r + 1) * GPT, :] = accs[r][2]
            acc_v[r * GPT:(r + 1) * GPT, :] = accs[r][3]

        @pl.when(last)
        def _():
            for r in range(ray_rows):
                cur = accs[r]
                sh = GPT // 2
                while sh >= 1:
                    rl = tuple(pltpu.roll(a, sh, axis=0) for a in cur)
                    take = (rl[0] < cur[0]) | ((rl[0] == cur[0])
                                               & (rl[1] < cur[1]))
                    cur = tuple(jnp.where(take, rl[i], cur[i])
                                for i in range(4))
                    sh //= 2
                out_t[0, r:r + 1, :] = cur[0][0:1]
                out_id[0, r:r + 1, :] = cur[1][0:1]
                out_u[0, r:r + 1, :] = cur[2][0:1]
                out_v[0, r:r + 1, :] = cur[3][0:1]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_bins", "ray_rows", "interpret"))
def trace_dense_visits(rows, vis_tile, vis_bin, dirs, scalars, *,
                       n_bins: int, ray_rows: int, interpret: bool = False):
    """Trace prepped dense tiles via the visit-list kernel. dirs:
    (3 * n_bins * ray_rows, 128) f32 component-stacked dirs in Morton
    slot order (same contract as trace_dense_rows); scalars (8,) f32.
    Returns (tri, t, u, v) flat in slot order; tri == -1 on miss."""
    v_cap = vis_tile.shape[0]
    nrd = n_bins * ray_rows
    # bin-major dirs for per-visit block fetch: (nb, 3, ray_rows, 128)
    dirs_b = jnp.transpose(dirs.reshape(3, n_bins, ray_rows, 128),
                           (1, 0, 2, 3))
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20)
    out = pl.pallas_call(
        _make_visits_kernel(ray_rows, v_cap),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(v_cap,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),    # scalars
                pl.BlockSpec((1, GPT, 128),
                             lambda v, vt, bv: (vt[v], 0, 0)),
                pl.BlockSpec((1, 3, ray_rows, 128),
                             lambda v, vt, bv: (bv[v], 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, ray_rows, 128),
                             lambda v, vt, bv: (bv[v], 0, 0))
                for _ in range(4)
            ],
            scratch_shapes=[
                pltpu.VMEM((ray_rows * GPT, 128), jnp.float32),
                pltpu.VMEM((ray_rows * GPT, 128), jnp.int32),
                pltpu.VMEM((ray_rows * GPT, 128), jnp.float32),
                pltpu.VMEM((ray_rows * GPT, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_bins, ray_rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_bins, ray_rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_bins, ray_rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_bins, ray_rows, 128), jnp.float32),
        ],
        interpret=interpret,
        **params,
    )(vis_tile, vis_bin, scalars,
      rows.reshape(rows.shape[0] // GPT, GPT, 128), dirs_b)
    t = out[0].reshape(-1)
    tri = out[1].reshape(-1)
    return tri, t, out[2].reshape(-1), out[3].reshape(-1)


# --------------------------------------------------------------------------
# Public entry


def trace_dense_primary(verts_dev, cam, dirn, *, width, height, tile=16,
                        ez_chunk=4, interpret=False, p_max=None,
                        k_cap=64, tpv=1, sort_mode="s11", kernel="walk"):
    """Primary-ray closest-hit over the full camera grid (dense engine,
    v3 prep).

    verts_dev: (n, 3, 3) f32 device triangle vertices. cam: raygen
    camera_arrays dict. dirn: (W*H, 3) normalized dirs in Morton slot
    order. Returns (tri, t, u, v) in slot order. Caller contract as v1:
    canonical primary rays (orig == cam pos, uniform tmin == znear,
    uniform tmax), W/H multiples of the power-of-two tile.
    """
    if width % tile or height % tile or tile & (tile - 1):
        raise ValueError("W/H must be multiples of the power-of-two tile")
    rays_per_bin = tile * tile
    if rays_per_bin % 128:
        raise ValueError("tile*tile must be a multiple of 128")
    ray_rows = rays_per_bin // 128
    txn, tyn = width // tile, height // tile
    nb = txn * tyn
    z_bits = 12
    mcodes_np = bin_mcodes(txn, tyn, 31 - z_bits)
    dirs = jnp.transpose(dirn).reshape(3 * nb * ray_rows, 128)
    scalars = jnp.concatenate([
        cam["pos"].astype(jnp.float32),
        jnp.stack([cam["znear"], cam["zfar"],
                   jnp.float32(0), jnp.float32(0), jnp.float32(0)]),
    ])
    total, n_mid, n_g = (int(x) for x in count_pairs_dense(
        verts_dev, cam, width=width, height=height, tile=tile,
        k_slots=k_cap, k2_slots=k_cap))
    if sort_mode == "v5":
        _, hist, _ = count_hist_dense(verts_dev, cam, width=width,
                                      height=height, tile=tile,
                                      k_cap=k_cap)
        n_ks = pick_nks(np.asarray(hist))
        if p_max is None:
            p_max = pick_cap(sum(n_ks), 16 * TPT)
    elif p_max is None:
        p_max = pick_cap(total + n_mid, 16 * TPT)
    g2_max = pick_cap(n_g, TPT, pad=TPT) if n_g else 0
    kw = dict(width=width, height=height, tile=tile, k_cap=k_cap,
              p_max=p_max, g2_max=g2_max, z_bits=z_bits)
    if sort_mode == "v5":
        rows, row0, row1, g_r1, ok = binraster_prep_dense5(
            verts_dev, cam, jnp.asarray(mcodes_np), n_ks=n_ks, **kw)
    elif sort_mode == "v4":
        rows, row0, row1, g_r1, ok = binraster_prep_dense4(
            verts_dev, cam, jnp.asarray(mcodes_np), **kw)
    else:
        rows, row0, row1, g_r1, ok = binraster_prep_dense3(
            verts_dev, cam, jnp.asarray(mcodes_np), sort_mode=sort_mode,
            **kw)
    if kernel == "visits":
        vt, bv = build_visit_list(
            row0, row1, g_r1, v_cap=visit_cap(p_max, nb, g2_max), nb=nb)
        tri, t, u, v = trace_dense_visits(
            rows, vt, bv, dirs, scalars, n_bins=nb, ray_rows=ray_rows,
            interpret=interpret)
    elif kernel == "dma":
        tri, t, u, v = trace_dense_rows_dma(
            rows, row0, row1, dirs, scalars, g_r1, n_bins=nb,
            ray_rows=ray_rows, interpret=interpret)
    else:
        tri, t, u, v = trace_dense_rows(
            rows, row0, row1, dirs, scalars, g_r1,
            n_bins=nb, ray_rows=ray_rows, ez_chunk=ez_chunk,
            interpret=interpret, tpv=tpv)
    # Static-bucket overflow poisons hits (-2): loud, never silent.
    return jnp.where(ok, tri, -2), t, u, v
