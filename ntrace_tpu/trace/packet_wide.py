"""8-wide interval packet traversal -- the scalar-economy Pallas kernel.

Reference contract: the persistent packet kernels with SIMD frustum/interval
culling (expected src/rt/kernels/tesla_persistent_packet*.cu; SURVEY.md
SS3.3) -- a packet shares one traversal, node tests are amortized over the
whole packet, leaves are tested exactly per ray.

Design (from the measured scalar-core bottleneck, PERF_NOTES.md "round-2
kernel-structure findings"):
  - nodes are 8-ary, ONE (1,128) row each (bvh/wide_packed.py): a single
    aligned row load per visited node, no roll, ~2.6x fewer steps than
    binary;
  - the node test is CONSERVATIVE packet-INTERVAL slab culling computed as
    a handful of (1,128) VECTOR ops against per-packet corner pattern
    tiles (built once per packet from 14 reduces over the ray tiles), so
    the per-lane VPU slab work and its per-child reduces disappear; the 8
    child verdicts come back as ONE weighted sum-reduce -> ONE scalar
    extract (an 8-bit mask);
  - conservativeness: a child is visited if ANY ray interval corner
    combination could hit it (min over rays of slab entry <= max over rays
    of slab exit, axis-wise interval arithmetic); missed-by-all children
    are provably rejected, extra visits are superset-safe because leaf
    tests stay per-lane exact;
  - child visit order is slot XOR packet-octant (bvh/wide_packed.py's
    octant-addressed slots): pure scalar bit math, no distance reduces;
  - leaf row runs go to an SMEM queue; a branch-free leaf loop drains it
    with exact per-lane Moller-Trumbore (packet_common.mt_row_best); the
    packet's shared tmax clamp refreshes from the hit state once per
    node/leaf phase alternation;
  - `interleave` packets run phase-locked in one program; this step shape
    measured ~79-133 ns/chain at interleave=4 (scripts/wide_probe.py).

Constraint (same as trace/wide_jax.py): ray tmax must sit below 1e36 --
the packet tmax clamp is what rejects empty child slots (+3e38 bounds).
trace_packet_wide clamps tmax at entry, so callers may pass +inf; rays
whose true closest hit lies beyond 1e36 scene units report miss.

Results are exact per ray (leaf tests are; node culling is conservative)
and identical to the other packet engines' (same MT tie-break).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntrace_tpu.ops.aabb import safe_inv_dir
from ntrace_tpu.trace.packet_common import (INF, mt_row_best, packet_signs,
                                            ray_views, slab_child, stage_rays)

STACK_DEPTH = 128
QCAP = 48                        # leaf-queue entries per packet
DONE = np.int32(0x40000000)
TMAX_CAP = np.float32(1.0e36)
MAX_OUTER = 1 << 20


def _or_tree_mask(v, rows: int):
    """OR-reduce a per-lane bit-packed (rows,128) int32 tile to one scalar.

    Explicit slice/roll OR tree instead of a builtin reduce: the builtin
    cross-lane reduce was the node step's non-overlapping serial cost
    (PERF_NOTES.md round-2 findings)."""
    r = rows
    while r > 1:
        v = jnp.bitwise_or(v[: r // 2], v[r // 2: 2 * (r // 2)])
        r //= 2
    sh = 64
    while sh >= 1:
        v = jnp.bitwise_or(v, pltpu.roll(v, sh, axis=1))
        sh //= 2
    return v[0, 0]


def _make_kernel(rows: int, any_hit: bool, light: bool, ilv: int,
                 tpr: int, stats: bool, exact: bool = False):
    shape = (rows, 128)

    def kernel(nodes_ref, tris_ref, rays_ref, out_f, out_id, *rest):
        if stats:
            stats_ref, stack_ref, queue_ref = rest
        else:
            stack_ref, queue_ref = rest
        r = rows
        n_tri_rows = tris_ref.shape[0]
        max_node = nodes_ref.shape[0] - 1
        views = ray_views(rays_ref, rows, ilv)
        signs = packet_signs(views)
        deads = [v[10] <= v[9] for v in views]

        # ---- per-packet frustum pattern tiles (once) ----------------------
        # A packet's rays are bounded by a 4-plane corner frustum around the
        # dominant direction axis plus a t-interval along that axis -- tight
        # for coherent packets and free of 1/d blow-ups (pure axis-interval
        # slabs measured 4-8x node/leaf overshoot on conference primaries).
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        lanemod = jnp.bitwise_and(lane, 15)
        wtile = jnp.where(
            lanemod == 0,
            jnp.exp2(jax.lax.shift_right_logical(lane, 4).astype(jnp.float32)),
            0.0)

        def axis_sel(a, x, y, z):
            return jnp.where(a == 0, x, jnp.where(a == 1, y, z))

        def plane_pattern(n):
            """Weight tile for max-corner dot: n_a lands on the hi lane
            (2a+1) when n_a > 0, else on the lo lane (2a)."""
            p = jnp.zeros((1, 128), jnp.float32)
            for a in range(3):
                idx = 2 * a + (n[a] > 0).astype(jnp.int32)
                p = p + jnp.where(lanemod == idx, n[a], 0.0)
            return p

        pats = []
        tn_los = []
        for s in range(ilv):
            ox, oy, oz, ix, iy, iz, dx, dy, dz, tn, _ = views[s]
            olo = (jnp.min(ox), jnp.min(oy), jnp.min(oz))
            ohi = (jnp.max(ox), jnp.max(oy), jnp.max(oz))
            dlo = (jnp.min(dx), jnp.min(dy), jnp.min(dz))
            dhi = (jnp.max(dx), jnp.max(dy), jnp.max(dz))
            # dominant axis: sign-consistent with the largest min |d|
            scores = [jnp.where(dlo[a] * dhi[a] > 0,
                                jnp.minimum(jnp.abs(dlo[a]), jnp.abs(dhi[a])),
                                np.float32(-1.0)) for a in range(3)]
            A = jnp.where(scores[0] >= jnp.maximum(scores[1], scores[2]), 0,
                          jnp.where(scores[1] >= scores[2], 1, 2)).astype(jnp.int32)
            degen = jnp.maximum(scores[0],
                                jnp.maximum(scores[1], scores[2])) < 0
            dAl = axis_sel(A, dlo[0], dlo[1], dlo[2])
            dAh = axis_sel(A, dhi[0], dhi[1], dhi[2])
            sg = jnp.where(dAl > 0, np.float32(1.0), np.float32(-1.0))
            live = jnp.where(degen, np.float32(0.0), np.float32(1.0))
            # slope intervals u = d.b / d.A for the two non-dominant axes,
            # then the 4 bounding planes n = sg*(e_b - u*e_A)
            planes = []
            for bi in range(2):  # b = the bi-th non-dominant axis
                # A==0 -> b in (1,2); A==1 -> b in (0,2); A==2 -> b in (0,1)
                b = jnp.where(A == 0, bi + 1,
                              jnp.where(A == 1, bi * 2, bi)).astype(jnp.int32)
                dbl = axis_sel(b, dlo[0], dlo[1], dlo[2])
                dbh = axis_sel(b, dhi[0], dhi[1], dhi[2])
                c = (dbl / dAl, dbl / dAh, dbh / dAl, dbh / dAh)
                u_lo = jnp.minimum(jnp.minimum(c[0], c[1]),
                                   jnp.minimum(c[2], c[3]))
                u_hi = jnp.maximum(jnp.maximum(c[0], c[1]),
                                   jnp.maximum(c[2], c[3]))
                eb = [(b == a).astype(jnp.float32) for a in range(3)]
                eA = [(A == a).astype(jnp.float32) for a in range(3)]
                planes.append(tuple(
                    live * sg * (eb[a] - u_lo * eA[a]) for a in range(3)))
                planes.append(tuple(
                    live * sg * (u_hi * eA[a] - eb[a]) for a in range(3)))
            ptiles = []
            for n in planes:
                # conservative bias: the o-box's minimal projection, to be
                # SUBTRACTED from the box's max-corner projection
                beta = sum(jnp.where(n[a] > 0, n[a] * olo[a], n[a] * ohi[a])
                           for a in range(3))
                ptiles.append((plane_pattern(n), beta))
            # t-interval along A (4-corner products with the o interval)
            iAl = np.float32(1.0) / jnp.where(degen, np.float32(1.0), dAh)
            iAh = np.float32(1.0) / jnp.where(degen, np.float32(1.0), dAl)
            oAl = axis_sel(A, olo[0], olo[1], olo[2])
            oAh = axis_sel(A, ohi[0], ohi[1], ohi[2])
            amask = (lanemod == 2 * A) & jnp.logical_not(degen)
            amask1 = (lanemod == 2 * A + 1) & jnp.logical_not(degen)
            pats.append((ptiles, iAl, iAh, oAl, oAh, amask, amask1))
            tn_los.append(jnp.min(tn))

        # ---- node phase step ---------------------------------------------
        def node_step(s, item, sp, qn, ptmax, htile):
            act = (item != DONE) & (qn < QCAP - 8)
            sbase = s * (STACK_DEPTH + 1)
            qbase = s * (QCAP + 1)
            row = nodes_ref[pl.ds(jnp.clip(item, 0, max_node), 1), :]
            if exact:
                # per-lane slab culling of all 8 children; per-child "any
                # lane hits" comes back through one bit-packed OR tree.
                ox, oy, oz, ix, iy, iz = views[s][:6]
                tn = views[s][9]
                live_t = (jnp.where(deads[s], -INF, htile)
                          if any_hit else htile)
                hv = jnp.zeros(shape, jnp.int32)
                for k in range(8):
                    h_k, _ = slab_child(row, 16 * k, ox, oy, oz, ix, iy, iz,
                                        tn, live_t)
                    hv = hv | (h_k.astype(jnp.int32) << k)
                mask = _or_tree_mask(hv, rows)
                mask = jnp.where(act, mask, 0)
                return _node_finish(s, item, sp, qn, act, row, mask,
                                    sbase, qbase)
            ptiles, iAl, iAh, oAl, oAh, amask, amask1 = pats[s]
            # frustum: child culled if any plane has its max corner outside
            inside = None
            for P, beta in ptiles:
                T = row * P
                T = T + pltpu.roll(T, 127, axis=1)
                T = T + pltpu.roll(T, 126, axis=1)
                d2 = T + pltpu.roll(T, 124, axis=1)
                ok = d2 - beta >= 0
                inside = ok if inside is None else (inside & ok)
            # t-interval along the dominant axis (lo lane 2A, hi lane 2A+1)
            dl = row - oAl
            dh = row - oAh
            tmin_c = jnp.fmin(jnp.fmin(dl * iAl, dl * iAh),
                              jnp.fmin(dh * iAl, dh * iAh))
            tmax_c = jnp.fmax(jnp.fmax(dl * iAl, dl * iAh),
                              jnp.fmax(dh * iAl, dh * iAh))
            ents = jnp.where(amask, jnp.fmin(tmin_c,
                             pltpu.roll(tmin_c, 127, axis=1)), -INF)
            exts = jnp.where(amask, jnp.fmax(tmax_c,
                             pltpu.roll(tmax_c, 127, axis=1)), INF)
            # fold the A lanes to each child's lane 16k (A in {0,1,2} ->
            # source lane 2A; rolls by 2 and 4 cover all three cases)
            ent = jnp.fmax(ents, jnp.fmax(pltpu.roll(ents, 126, axis=1),
                                          pltpu.roll(ents, 124, axis=1)))
            ext = jnp.fmin(exts, jnp.fmin(pltpu.roll(exts, 126, axis=1),
                                          pltpu.roll(exts, 124, axis=1)))
            # empty slots (+3e38 bounds) die on the ptmax clamp as long as
            # the packet is non-degenerate; degenerate packets pass all and
            # re-test row 0's real triangles (superset-safe).
            hit = (inside & (jnp.fmax(ent, tn_los[s])
                             <= jnp.fmin(ext, ptmax)))
            mask = jnp.sum(jnp.where(hit, wtile, 0.0)).astype(jnp.int32)
            mask = jnp.where(act, mask, 0)
            return _node_finish(s, item, sp, qn, act, row, mask,
                                sbase, qbase)

        def _node_finish(s, item, sp, qn, act, row, mask, sbase, qbase):
            # ordered unroll: extract the 8 slot items once, pick the first
            # hit INTERNAL child (in slot^octant order) as descent, push the
            # other internal hits far-to-near, queue the leaf hits.
            hits, items, kinds = [], [], []
            for kk in range(8):
                slot = jnp.bitwise_xor(jnp.int32(kk), signs[s])
                hits.append(jnp.bitwise_and(
                    jax.lax.shift_right_logical(mask, slot), 1) > 0)
                itm = pltpu.roll(
                    row, jnp.bitwise_and(128 - slot * 16 - 6, 127), axis=1
                )[0, 0].astype(jnp.int32)
                items.append(itm)
                kinds.append(itm >= 0)
            desc = jnp.int32(DONE)
            taken = []
            for kk in range(8):
                take = hits[kk] & kinds[kk] & (desc == DONE)
                desc = jnp.where(take, items[kk], desc)
                taken.append(take)
            np_ = jnp.int32(0)
            nq = jnp.int32(0)
            for kk in range(7, -1, -1):   # farthest-first stack pushes
                push = hits[kk] & kinds[kk] & jnp.logical_not(taken[kk])
                widx = jnp.where(
                    push, jnp.minimum(sp + np_, STACK_DEPTH - 1), STACK_DEPTH)
                stack_ref[sbase + widx] = items[kk]
                np_ = np_ + push.astype(jnp.int32)
                enq = hits[kk] & jnp.logical_not(kinds[kk])
                qidx = jnp.where(enq, jnp.minimum(qn + nq, QCAP - 1), QCAP)
                queue_ref[qbase + qidx] = -items[kk] - 1
                nq = nq + enq.astype(jnp.int32)
            sp1 = jnp.minimum(sp + np_, STACK_DEPTH)
            qn1 = qn + nq
            need_pop = desc == DONE
            can_pop = sp1 > 0
            popped = stack_ref[sbase + jnp.maximum(sp1 - 1, 0)]
            item2 = jnp.where(
                need_pop, jnp.where(can_pop, popped, DONE), desc)
            sp2 = jnp.where(need_pop & can_pop, sp1 - 1, sp1)
            item2 = jnp.where(act, item2, item)
            sp2 = jnp.where(act, sp2, sp)
            return item2, sp2, qn1

        # ---- leaf phase step ----------------------------------------------
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
            queue_ref[qbase + widx] = entry + 31    # row+1, rem-1
            qn2 = jnp.where(act & (rem == 0), qn - 1, qn)
            if any_hit:
                finished = jnp.all((cur_id >= 0) | deads[s])
                qn2 = jnp.where(finished, 0, qn2)
                item = jnp.where(finished, DONE, item)
            return item, qn2, (cur_t, cur_id, cur_u, cur_v)

        # ---- phase loops ---------------------------------------------------
        def node_loop(items, sps, qns, ptmaxs, hts, nsteps):
            def cond(c):
                items, _, qns = c[0], c[1], c[2]
                go = (items[0] != DONE) & (qns[0] < QCAP - 8)
                for s in range(1, ilv):
                    go = go | ((items[s] != DONE) & (qns[s] < QCAP - 8))
                return go

            def body(c):
                items, sps, qns, n = c
                outs = [node_step(s, items[s], sps[s], qns[s], ptmaxs[s],
                                  hts[s])
                        for s in range(ilv)]
                return (tuple(o[0] for o in outs),
                        tuple(o[1] for o in outs),
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
            items, k = c[0], c[5]
            go = items[0] != DONE
            for s in range(1, ilv):
                go = go | (items[s] != DONE)
            return go & (k < MAX_OUTER)

        def outer_body(c):
            items, sps, qns, hss, counts, k = c
            ptmaxs = tuple(jnp.max(hss[s][0]) for s in range(ilv))
            hts = tuple(hss[s][0] for s in range(ilv))
            items, sps, qns, n = node_loop(items, sps, qns, ptmaxs, hts,
                                           counts[0])
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
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (ilv * rows, 128), 1)
            n, m = final[4]
            stats_ref[:] = jnp.where(lane2 == 0, n,
                                     jnp.where(lane2 == 1, m, 0))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "rows", "interpret", "vmem_limit",
                     "light", "interleave", "tris_per_row", "stats",
                     "exact"),
)
def trace_packet_wide(nodes_w, tris12, orig, dirn, tmin, tmax, *,
                      any_hit: bool = False, rows: int = 8,
                      interpret: bool = False, vmem_limit: int = 0,
                      light: bool = False, interleave: int = 1,
                      tris_per_row: int = 4, stats: bool = False,
                      exact: bool = False):
    """Trace rays with the 8-wide interval packet kernel.

    nodes_w/tris12: bvh/wide_packed.py tables. Same contract as
    trace_packet; tmax is clamped below 1e36 at entry (see module doc).
    """
    R = orig.shape[0]
    ilv = interleave
    tmax = jnp.minimum(tmax, TMAX_CAP)
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
        table_bytes = (nodes_w.shape[0] + tris12.shape[0]) * 128 * 4
        limit = vmem_limit or min(table_bytes + (24 << 20), 127 << 20)
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=limit,
        )
    outs = pl.pallas_call(
        _make_kernel(rows, any_hit, light, ilv, tris_per_row, stats, exact),
        grid=(grid,),
        in_specs=[table_spec, table_spec, in_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **params,
    )(nodes_w, tris12, rays_in)
    tuv = outs[0].reshape(grid * ilv, 3, rows, 128)
    flat = lambda a: a.reshape(-1)[:R]
    result = (flat(outs[1]), flat(tuv[:, 0]), flat(tuv[:, 1]),
              flat(tuv[:, 2]))
    if stats:
        s = outs[2].reshape(grid * ilv, rows, 128)
        return result + (s[::ilv, 0, :2],)
    return result
