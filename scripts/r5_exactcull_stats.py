"""Round-5: how many rect pairs an EXACT tri-vs-bin-square test culls.

The dense prep bins each tri by its projected bbox rect; a thin diagonal
triangle's rect covers corner bins its area never touches. An exact
conservative edge-function test (square-vs-half-plane per triangle edge,
standard conservative rasterization) can only REMOVE pairs no primary
ray in the bin can hit, so exactness is preserved. This script prices
the cut on the headline scene, host-side numpy (no device).

Only tris with all three verts in front of the near plane are tested
(crossers keep their clipped rect -- the clip path's conservative bbox
logic doesn't give exact screen-space edges). Appends JSONL to
results_r5_cluster_stats.json.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ntrace_tpu.ray import raygen
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace.binraster import _counts, _project

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_r5_cluster_stats.json")
W, H, TILE = 1024, 768, 16


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    scene = get_scene("conference", n_tris=280_000)
    verts = scene.tri_verts()
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    tx0, tx1, ty0, ty1, cnt, zmin = (np.asarray(a) for a in _counts(
        verts, ca, width=W, height=H, tile=TILE))
    xc, yc, zc = (np.asarray(a) for a in _project(verts, ca))
    tanx = float(ca["tan_x"])
    tany = float(ca["tan_y"])
    zclip = float(ca["znear"]) / np.sqrt(1 + tanx**2 + tany**2) * 0.99
    infront = (zc >= zclip).all(axis=1)
    # projected pixel coords (same math as _counts)
    px = (xc / zc / tanx + 1.0) * (0.5 * W)
    py = (1.0 - yc / zc / tany) * (0.5 * H)

    n = verts.shape[0]
    total_rect = int(cnt.sum())
    # Enumerate pairs (tri-major) in numpy
    keep = 0
    cut = 0
    crosser_pairs = int(cnt[~infront].sum())
    idx = np.nonzero(infront & (cnt > 0))[0]
    # chunk to bound memory
    CH = 20000
    eps = 1e-3  # conservative slack in pixels
    for s in range(0, len(idx), CH):
        tri = idx[s:s + CH]
        w = (tx1[tri] - tx0[tri] + 1)
        h = (ty1[tri] - ty0[tri] + 1)
        kmax = int((w * h).max())
        k = np.arange(kmax)
        valid = k[None, :] < (w * h)[:, None]
        bx = tx0[tri][:, None] + k[None, :] % w[:, None]
        by = ty0[tri][:, None] + k[None, :] // w[:, None]
        # bin square in pixels
        sx0 = bx * TILE - eps
        sx1 = (bx + 1) * TILE + eps
        sy0 = by * TILE - eps
        sy1 = (by + 1) * TILE + eps
        ax, ay = px[tri][:, :, None], py[tri][:, :, None]  # (m,3,1)
        bxv = np.roll(px[tri], -1, axis=1)[:, :, None]
        byv = np.roll(py[tri], -1, axis=1)[:, :, None]
        ex, ey = bxv - ax, byv - ay
        # third vertex decides the inner side per edge
        cxv = np.roll(px[tri], -2, axis=1)[:, :, None]
        cyv = np.roll(py[tri], -2, axis=1)[:, :, None]
        side = ex * (cyv - ay) - ey * (cxv - ax)   # (m,3,1)
        nx = -ey * np.sign(side)
        ny = ex * np.sign(side)
        # most-inside square corner per edge
        qx = np.where(nx >= 0, sx1[:, None, :], sx0[:, None, :])
        qy = np.where(ny >= 0, sy1[:, None, :], sy0[:, None, :])
        inner = (nx * (qx - ax) + ny * (qy - ay)) >= -eps
        ok = inner.all(axis=1) & valid
        keep += int(ok.sum())
        cut += int((valid & ~ok).sum())
    emit({"stage": "exact_cull", "pairs_rect": total_rect,
          "crosser_pairs_kept": crosser_pairs,
          "pairs_exact": keep + crosser_pairs, "pairs_cut": cut,
          "cut_frac": round(cut / max(total_rect, 1), 4)})


if __name__ == "__main__":
    main()
