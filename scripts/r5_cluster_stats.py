"""Round-5 feasibility stats for the cluster-grained dense prep (v5).

The r4 verdict's binding gap is the dense engine's camera-dependent
prep (~11.3 ms in-frame vs a 3.9 ms kernel). The v5 idea: freeze a
camera-INDEPENDENT table of S-tri clusters (one (1, 128) lane-major row
per cluster, built once per geometry like the reference's CudaBVH) and
run the per-frame binning/sort/assembly at CLUSTER-pair granularity
(~n/S * coverage pairs instead of ~462k tri-pairs). The cost is kernel
inflation: every member tri rides its cluster's UNION screen rect.

This script prices that inflation on the headline scene, host-side
(CPU jax; no device): per-tri rect pair count (current kernel work)
vs cluster-union pair counts for S in {4, 8, 11} under input order and
3D-Morton order. Appends JSONL to results_r5_cluster_stats.json.
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ntrace_tpu.ray import raygen
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace.binraster import _counts

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_r5_cluster_stats.json")
W, H, TILE = 1024, 768, 16


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def cluster_counts(tx0, tx1, ty0, ty1, cnt, order, S):
    """Pairs when tris (reordered by `order`) form S-sized clusters whose
    bin rect is the union of member rects. Tris with cnt==0 (offscreen)
    are dropped before clustering (the prebuild can't know the camera,
    but offscreen members only ever GROW a union that some member makes
    non-empty; dropping them here prices the visible-geometry union,
    the quantity that actually drives kernel work)."""
    o = order
    x0, x1 = tx0[o], tx1[o]
    y0, y1 = ty0[o], ty1[o]
    c = cnt[o]
    n = len(o)
    pad = (-n) % S
    if pad:
        x0 = np.concatenate([x0, np.full(pad, 1 << 20)])
        x1 = np.concatenate([x1, np.full(pad, -1)])
        y0 = np.concatenate([y0, np.full(pad, 1 << 20)])
        y1 = np.concatenate([y1, np.full(pad, -1)])
        c = np.concatenate([c, np.zeros(pad, c.dtype)])
    vis = (c > 0).reshape(-1, S)
    ux0 = np.where(vis, x0.reshape(-1, S), 1 << 20).min(1)
    ux1 = np.where(vis, x1.reshape(-1, S), -1).max(1)
    uy0 = np.where(vis, y0.reshape(-1, S), 1 << 20).min(1)
    uy1 = np.where(vis, y1.reshape(-1, S), -1).max(1)
    any_vis = vis.any(1)
    cov = np.where(any_vis, (ux1 - ux0 + 1) * (uy1 - uy0 + 1), 0)
    # kernel tri-tests ride S tris per cluster-pair (pad slots are inert
    # but still occupy VPU lanes only within the slot loop -- the lane
    # cost is per SLOT, so price tests at S per pair)
    return int(cov.sum()), int((cov * S).sum()), int(any_vis.sum())


def main():
    scene = get_scene("conference", n_tris=280_000)
    verts = scene.tri_verts()  # (n,3,3)
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    tx0, tx1, ty0, ty1, cnt, zmin = (np.asarray(a) for a in _counts(
        verts, ca, width=W, height=H, tile=TILE))
    n = verts.shape[0]
    base_pairs = int(cnt.sum())
    vis = int((cnt > 0).sum())
    emit({"stage": "per_tri", "n": n, "visible": vis,
          "pairs_rect": base_pairs,
          "tri_tests": base_pairs,
          "mean_cov_visible": round(base_pairs / max(vis, 1), 3)})

    # Orders: scene input order; 3D Morton over tri centroids.
    cen = verts.mean(axis=1)
    lo, hi = cen.min(0), cen.max(0)
    q = np.clip(((cen - lo) / np.maximum(hi - lo, 1e-30) * 1023), 0,
                1023).astype(np.uint32)
    from ntrace_tpu.ops.morton import morton3d
    mc = morton3d(np, q[:, 0], q[:, 1], q[:, 2])
    orders = {
        "input": np.arange(n),
        "morton3d": np.argsort(mc, kind="stable"),
    }
    for oname, order in orders.items():
        for S in (4, 8, 11, 16):
            pairs, tests, nvis = cluster_counts(
                tx0, tx1, ty0, ty1, cnt, order, S)
            emit({"stage": "cluster", "order": oname, "S": S,
                  "clusters_visible": nvis, "pairs": pairs,
                  "tri_tests": tests,
                  "test_inflation": round(tests / base_pairs, 3),
                  "pair_shrink": round(base_pairs / max(pairs, 1), 2)})


if __name__ == "__main__":
    main()
