#!/usr/bin/env python
"""Measure the leaf-lockstep waste: packet-union vs row-union leaf visits.

The packet kernel (trace/packet_pallas.py) tests every visited leaf row
against ALL rows*128 lanes of the packet; PERF_NOTES.md's round-3 frame
decomposition shows that leaf work is ~58% of the conference frame at
~690 MT tests/ray. A deferred-leaf design would emit (ray_row, leaf_row)
pairs during the node phase and intersect each leaf row only against the
128-ray rows that actually entered it.

This probe traverses sampled packets with an INDEPENDENT per-ray stack
walk (numpy lockstep, per-lane hit_t, near-first order) and reports, per
grouping granularity g in {128, 1024, 2048}:

    cost_g = sum over g-ray groups of |union of visited leaf rows| * g

cost_2048 ~ what rows16 pays today; cost_128 ~ the deferred design's leaf
work (plus exchange overhead, priced separately on device). The ratio is
the ceiling of the deferred-leaf win.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def lockstep_trace(nodes16, tris12, o, d, tmin, tmax, tpr=12):
    """Independent per-ray stack traversal; returns visit pairs + stats.

    nodes16: (N, 16) node records (bvh/packed.py lane layout, npr folded
    out); tris12: (TR, 128). Near-first by per-ray entry t. Records every
    (ray, leaf_row) MT-tested pair.
    """
    R = o.shape[0]
    DEPTH = 64
    stack_it = np.zeros((R, DEPTH), np.int64)   # encoded items
    stack_ct = np.zeros((R, DEPTH), np.int64)   # leaf row counts
    sp = np.zeros(R, np.int64)
    cur = np.zeros(R, np.int64)                 # current item (root = node 0)
    cur_ct = np.zeros(R, np.int64)
    lrow = np.zeros(R, np.int64)
    lleft = np.zeros(R, np.int64)
    hit_t = tmax.astype(np.float64).copy()
    hit_id = np.full(R, np.int64(2**31 - 1))
    done = tmax <= tmin
    cur[done] = -(2**40)  # sentinel: finished
    inv = 1.0 / np.where(d == 0, 1e-30, d).astype(np.float64)
    ox, oy, oz = (o[:, i].astype(np.float64) for i in range(3))
    ix, iy, iz = inv[:, 0], inv[:, 1], inv[:, 2]
    dx, dy, dz = (d[:, i].astype(np.float64) for i in range(3))
    tn = tmin.astype(np.float64)
    DONE = -(2**40)
    visits_r, visits_w = [], []
    node_steps = np.zeros(R, np.int64)

    def slab(rec, base, idx):
        t0 = (rec[:, base + 0] - ox[idx]) * ix[idx]
        t1 = (rec[:, base + 1] - ox[idx]) * ix[idx]
        lo = np.minimum(t0, t1)
        hi = np.maximum(t0, t1)
        t0 = (rec[:, base + 2] - oy[idx]) * iy[idx]
        t1 = (rec[:, base + 3] - oy[idx]) * iy[idx]
        lo = np.maximum(lo, np.minimum(t0, t1))
        hi = np.minimum(hi, np.maximum(t0, t1))
        t0 = (rec[:, base + 4] - oz[idx]) * iz[idx]
        t1 = (rec[:, base + 5] - oz[idx]) * iz[idx]
        lo = np.maximum(lo, np.minimum(t0, t1))
        hi = np.minimum(hi, np.maximum(t0, t1))
        lo = np.maximum(lo, tn[idx])
        hi = np.minimum(hi, hit_t[idx])
        return lo <= hi, lo

    it = 0
    while True:
        in_leaf = lleft > 0
        active_node = (~in_leaf) & (cur != DONE)
        if not in_leaf.any() and not active_node.any():
            break
        it += 1

        # --- leaf phase: one tri row per iteration per ray ---
        li = np.nonzero(in_leaf)[0]
        if li.size:
            rows = lrow[li]
            visits_r.append(li.copy())
            visits_w.append(rows.copy())
            trow = tris12[rows].astype(np.float64)    # (L, 128)
            tr = trow[:, : tpr * 10].reshape(-1, tpr, 10)
            v0 = tr[..., 0:3]
            e1 = tr[..., 3:6]
            e2 = tr[..., 6:9]
            tid = tr[..., 9].astype(np.int64)
            dd = np.stack([dx[li], dy[li], dz[li]], -1)[:, None, :]
            oo = np.stack([ox[li], oy[li], oz[li]], -1)[:, None, :]
            p = np.cross(dd, e2)
            det = (e1 * p).sum(-1)
            invd = 1.0 / np.where(det == 0, 1.0, det)
            tv = oo - v0
            u = (tv * p).sum(-1) * invd
            q = np.cross(tv, e1)
            v = (dd * q).sum(-1) * invd
            t = (e2 * q).sum(-1) * invd
            ok = ((det != 0) & (tid >= 0) & (u >= 0) & (v >= 0)
                  & (u + v <= 1) & (t > tn[li, None]))
            t = np.where(ok, t, np.inf)
            tidv = np.where(ok, tid, 2**31 - 1)
            bt = t.min(axis=1)
            bid = np.where(t == bt[:, None], tidv, 2**31 - 1).min(axis=1)
            acc = (bt < hit_t[li]) | ((bt == hit_t[li]) & (bid < hit_id[li]))
            hit_t[li] = np.where(acc, bt, hit_t[li])
            hit_id[li] = np.where(acc, bid, hit_id[li])
            lrow[li] += 1
            lleft[li] -= 1

        # --- node phase ---
        ni = np.nonzero(active_node)[0]
        if ni.size:
            item = cur[ni]
            is_leaf = item < 0
            # enter leaf state
            lf = ni[is_leaf]
            if lf.size:
                lrow[lf] = -cur[lf] - 1
                lleft[lf] = cur_ct[lf]
                cur[lf] = DONE  # will pop after leaf drains
            nd = ni[~is_leaf]
            if nd.size:
                node_steps[nd] += 1
                rec = nodes16[item[~is_leaf]].astype(np.float64)
                h0, t0 = slab(rec, 0, nd)
                h1, t1 = slab(rec, 6, nd)
                enc0 = rec[:, 12].astype(np.int64)
                enc1 = rec[:, 13].astype(np.int64)
                cnt0 = rec[:, 14].astype(np.int64)
                cnt1 = rec[:, 15].astype(np.int64)
                first0 = np.where(h0 & h1,
                                  np.where(t0 == t1, enc0 <= enc1, t0 <= t1),
                                  h0)
                near = np.where(first0, enc0, enc1)
                near_ct = np.where(first0, cnt0, cnt1)
                far = np.where(first0, enc1, enc0)
                far_ct = np.where(first0, cnt1, cnt0)
                both = h0 & h1
                # push far
                pf = nd[both]
                if pf.size:
                    stack_it[pf, np.minimum(sp[pf], DEPTH - 1)] = far[both]
                    stack_ct[pf, np.minimum(sp[pf], DEPTH - 1)] = far_ct[both]
                    sp[pf] = np.minimum(sp[pf] + 1, DEPTH)
                any_h = h0 | h1
                cur[nd] = np.where(any_h, near, DONE)
                cur_ct[nd] = np.where(any_h, near_ct, 0)

        # --- pop for rays that just finished (leaf drained or miss) ---
        need = (cur == DONE) & (lleft == 0) & ~done
        pi = np.nonzero(need)[0]
        if pi.size:
            can = sp[pi] > 0
            pp = pi[can]
            sp[pp] -= 1
            cur[pp] = stack_it[pp, sp[pp]]
            cur_ct[pp] = stack_ct[pp, sp[pp]]
            fin = pi[~can]
            done[fin] = True
            cur[fin] = DONE

    rr = np.concatenate(visits_r) if visits_r else np.zeros(0, np.int64)
    ww = np.concatenate(visits_w) if visits_w else np.zeros(0, np.int64)
    return rr, ww, hit_id, node_steps


def main():
    import jax.numpy as jnp

    from ntrace_tpu.bvh.packed import pack_bvh, pick_layout
    from ntrace_tpu.core import BuildConfig
    from ntrace_tpu.ray import pixel_table, raygen
    from ntrace_tpu.render.renderer import build_accel
    from ntrace_tpu.scenes import default_camera, get_scene

    scene_name = os.environ.get("SCENE", "conference")
    n_tris = int(os.environ.get("NTRIS", "280000"))
    scene = get_scene(scene_name, n_tris=n_tris)
    bcfg = BuildConfig(builder="binned_sah", sah_tri_cost=0.02,
                       max_leaf_size=48)
    t0 = time.time()
    flat = build_accel(scene, bcfg, use_cache=True)
    n_refs = int((flat.tri_index >= 0).sum())
    enc = np.ascontiguousarray(flat.nodes[:, 12:14]).view(np.int32)
    avg_leaf = n_refs / max(int((enc < 0).sum()), 1)
    tpr, npr = pick_layout(flat.nodes.shape[0], n_refs, avg_leaf=avg_leaf)
    pk = pack_bvh(flat, scene.tri_verts(), tris_per_row=tpr, nodes_per_row=npr)
    if npr == 1:
        nodes16 = np.asarray(pk.nodes8)[:, :16]
    else:
        nodes16 = np.asarray(pk.nodes8).reshape(-1, 16)
    print(f"accel ready in {time.time()-t0:.0f}s; tpr={tpr} npr={npr} "
          f"avg_leaf={avg_leaf:.1f}", flush=True)

    W, H = 1024, 768
    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(raygen.camera_arrays(default_camera(scene_name),
                                                W, H), W, H,
                           jnp.asarray(order_px))
    o = np.asarray(batch.orig)
    d = np.asarray(batch.dirn)
    tn = np.asarray(batch.tmin)
    tx = np.asarray(batch.tmax)
    R = o.shape[0]

    # Sample packets of 2048 Morton-consecutive rays, evenly spread.
    n_pk = int(os.environ.get("PACKETS", "12"))
    starts = np.linspace(0, R - 2048, n_pk).astype(np.int64) & ~np.int64(2047)
    idx = np.concatenate([np.arange(s, s + 2048) for s in starts])
    t0 = time.time()
    rr, ww, hid, nsteps = lockstep_trace(
        nodes16, np.asarray(pk.tris12), o[idx], d[idx], tn[idx], tx[idx],
        tpr=tpr)
    print(f"trace done in {time.time()-t0:.0f}s; visits={rr.size} "
          f"({rr.size/idx.size:.1f} rows/ray independent), "
          f"node_steps/ray={nsteps.mean():.1f}", flush=True)

    out = {"scene": scene_name, "n_tris": n_tris, "tpr": tpr,
           "packets": n_pk,
           "visits_per_ray_independent": round(rr.size / idx.size, 2),
           "node_steps_per_ray": round(float(nsteps.mean()), 2)}
    for g in (128, 1024, 2048):
        groups = rr // g
        keys = groups * (2**32) + ww
        uniq = np.unique(keys).size
        lane_tests = uniq * g                 # lane-row MT tests
        per_ray = lane_tests * tpr / idx.size  # MT tests per ray
        out[f"union_rows_g{g}"] = int(uniq)
        out[f"mt_tests_per_ray_g{g}"] = round(per_ray, 1)
        print(f"g={g:5d}: union leaf-rows={uniq}  -> {per_ray:.0f} "
              f"MT tests/ray", flush=True)
    out["defer_ceiling_vs_g2048"] = round(
        out["mt_tests_per_ray_g2048"] / out["mt_tests_per_ray_g128"], 2)
    # Exchange volume the deferred design must move: one (ray_row, leaf_row)
    # item per g=128 union entry.
    out["defer_items_per_packet"] = round(out["union_rows_g128"] / n_pk, 1)
    print(f"defer ceiling vs rows16: {out['defer_ceiling_vs_g2048']}x "
          f"leaf-work reduction; items/packet={out['defer_items_per_packet']}",
          flush=True)

    import json
    with open("results_leaf_union.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
