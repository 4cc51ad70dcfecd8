"""Occlusion-aware SAH builder (~ rt/bvh/OcclusionBVHBuilder, expected).

NTrace's occlusion builder biases SAH splits by visibility from a camera
so that likely-visible geometry gets the better subtrees (Vinkler et al.;
exact upstream algorithm unverifiable -- SURVEY.md SS0/SS3.2 [MED]).

This rebuild implements the idea as per-reference SAH WEIGHTS: each
triangle's weight approximates its expected ray density from the given
camera -- solid-angle-ish (area over squared distance) times a
front-facing factor -- and the binned SAH minimizes weighted counts
instead of raw counts. Structure, layout, and traversal are unchanged;
only split choices shift toward visible-region quality. Weighted SAH
reduces to the standard builder when all weights are equal (tested).
"""

from __future__ import annotations

import numpy as np

from ntrace_tpu.bvh.host_bvh import HostBVH
from ntrace_tpu.bvh.sbvh import _Builder
from ntrace_tpu.core import BuildConfig, Camera, Scene


def occlusion_weights(scene: Scene, camera: Camera,
                      aspect: float | None = None) -> np.ndarray:
    """(M,) float32 expected-visibility weight per triangle.

    With `aspect` given, triangles whose AABB misses the camera's view
    frustum (ops/polyhedron.py ConvexPolyhedron -- the reference's
    frustum-clip component) are down-weighted 10x: outside-view geometry
    still matters for shadow rays but should not win quality subtrees.
    """
    tv = scene.tri_verts()
    cent = tv.mean(axis=1)
    n = scene.geometric_normals()
    area2 = np.linalg.norm(n, axis=1)  # 2x triangle area
    to_cam = camera.position[None, :] - cent
    d2 = np.maximum(np.einsum("ij,ij->i", to_cam, to_cam), 1e-6)
    # Front-facing factor in [0.1, 1]: backfaces still matter (shadows).
    nn = n / np.maximum(area2, 1e-30)[:, None]
    facing = np.abs(np.einsum("ij,ij->i", nn, to_cam)) / np.sqrt(d2)
    w = (area2 / d2) * (0.1 + 0.9 * facing)
    if aspect is not None:
        from ntrace_tpu.ops.polyhedron import ConvexPolyhedron

        fr = ConvexPolyhedron.camera_frustum(camera, aspect)
        # Plane-vs-box part of the SAT test, vectorized over all tris.
        c = cent.astype(np.float64)
        e = (tv.max(axis=1) - tv.min(axis=1)).astype(np.float64) * 0.5
        dist = c @ fr.normals.T - fr.offsets[None, :]
        radius = np.abs(e @ np.abs(fr.normals).T)
        outside = (dist > radius).any(axis=1)
        w = np.where(outside, w * 0.1, w)
    # Normalize so SAH leaf/split comparisons keep their usual scale.
    return (w * (len(w) / max(w.sum(), 1e-30))).astype(np.float32)


class _OcclusionBuilder(_Builder):
    def __init__(self, scene: Scene, cfg: BuildConfig, weights: np.ndarray):
        super().__init__(scene, cfg)
        self.ref_w = weights.astype(np.float32)

    def _object_split(self, lo, hi, cent, cfg):
        """Weighted binned SAH (weights replace counts)."""
        nb = cfg.num_object_bins
        best = (np.inf, -1, None)
        clo = cent.min(axis=0)
        chi = cent.max(axis=0)
        w = self._idx_w
        for axis in range(3):
            if chi[axis] <= clo[axis]:
                continue
            scale = nb / (chi[axis] - clo[axis])
            b = np.minimum(((cent[:, axis] - clo[axis]) * scale).astype(np.int32), nb - 1)
            wcnt = np.bincount(b, weights=w, minlength=nb)
            blo = np.full((nb, 3), np.inf, np.float32)
            bhi = np.full((nb, 3), -np.inf, np.float32)
            np.minimum.at(blo, b, lo)
            np.maximum.at(bhi, b, hi)
            llo = np.minimum.accumulate(blo, axis=0)
            lhi = np.maximum.accumulate(bhi, axis=0)
            rlo = np.minimum.accumulate(blo[::-1], axis=0)[::-1]
            rhi = np.maximum.accumulate(bhi[::-1], axis=0)[::-1]
            lw = np.cumsum(wcnt)
            rw = np.cumsum(wcnt[::-1])[::-1]
            from ntrace_tpu.bvh.sbvh import _area

            sah = (lw[:-1] * _area(llo[:-1], lhi[:-1])
                   + rw[1:] * _area(rlo[1:], rhi[1:]))
            sah = np.where((lw[:-1] <= 0) | (rw[1:] <= 0), np.inf, sah)
            k = int(np.argmin(sah))
            if sah[k] < best[0]:
                best = (float(sah[k]), axis, b <= k)
        return best

    def build(self, idx, depth):
        # Per-node weight view for the split search (weights never change,
        # so ref duplication is irrelevant -- occlusion builds are
        # object-split only, spatial disabled in build_occlusion_bvh).
        self._idx_w = self.ref_w[self.ref_tri[idx]]
        return super().build(idx, depth)


def build_occlusion_bvh(scene: Scene, camera: Camera,
                        cfg: BuildConfig = BuildConfig()) -> HostBVH:
    import dataclasses
    import sys

    sys.setrecursionlimit(100000)
    ocfg = dataclasses.replace(cfg, builder="binned_sah")  # spatial off
    w = occlusion_weights(scene, camera)
    b = _OcclusionBuilder(scene, ocfg, w)
    root = b.build(np.arange(scene.num_tris, dtype=np.int64), 0)
    if root < 0:
        from ntrace_tpu.bvh.median import build_median_bvh

        return build_median_bvh(scene, cfg)
    return HostBVH(
        child=np.asarray(b.child_rows, dtype=np.int32),
        child_lo=np.stack(b.child_lo).astype(np.float32),
        child_hi=np.stack(b.child_hi).astype(np.float32),
        leaf_first=np.asarray(b.leaf_first, dtype=np.int32),
        leaf_count=np.asarray(b.leaf_count, dtype=np.int32),
        tri_order=np.concatenate(b.order_parts).astype(np.int32),
    )
