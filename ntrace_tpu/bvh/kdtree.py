"""SAH kd-tree builder + flattener (NTrace's headline addition).

Capability parity: NTrace extends the Aila-Laine framework with kd-trees
(expected rt/kdtree/NaiveKDTreeBuilder + FastKDTreeBuilder and
rt/cuda/CudaKDTree; Vinkler's papers; mount empty -- SURVEY.md SS0/SS3.2).
This is a from-scratch binned-SAH kd builder (greedy surface-area
heuristic over 32 candidate planes on the largest axis per node, with
reference duplication and box clipping at split planes), emitting a
flattened layout that shares the framework's unified-table conventions:

  node row (float32[16]):
    col 0      : split position (canonicalized away from -0.0)
    col 1      : bitcast int32 split axis (0/1/2)
    cols 12,13 : bitcast int32 children (below-split child first);
                 >=0 node row, <0 ~woopOffset leaf run
  leaf rows   : the SAME woop-record runs + 0x80000000 sentinels as the
                BVH layout (bvh/flatten.py), so leaf machinery is shared.

Note (documented deviation): the reference also ships an O(N log N)
Wald-Havran exact-SAH builder; this binned greedy build is the
capability-equivalent quality class used by its GPU builders.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ntrace_tpu.bvh.flatten import _leaf_rows
from ntrace_tpu.core import BuildConfig, Scene
from ntrace_tpu.ops.woop import woopify


@dataclass
class FlatKDTree:
    nodes: np.ndarray      # (N, 16) float32
    woop: np.ndarray       # (W, 12) float32
    tri_index: np.ndarray  # (W,) int32
    root_lo: np.ndarray    # (3,) scene bounds (ray clip at entry)
    root_hi: np.ndarray
    num_tris: int = 0

    def nbytes(self) -> int:
        return self.nodes.nbytes + self.woop.nbytes + self.tri_index.nbytes


def build_kdtree(scene: Scene, cfg: BuildConfig = BuildConfig()) -> FlatKDTree:
    tv = scene.tri_verts().astype(np.float32)
    n = scene.num_tris
    ref_tri = np.arange(n, dtype=np.int32)
    ref_lo = tv.min(axis=1)
    ref_hi = tv.max(axis=1)
    root_lo = ref_lo.min(axis=0)
    root_hi = ref_hi.max(axis=0)

    # kd trees want deeper recursion and smaller leaves than BVHs.
    max_depth = min(cfg.max_depth, 24)
    max_leaf = max(cfg.max_leaf_size, 4)
    nb = 32

    child_rows: list[list[int]] = []
    split_pos: list[float] = []
    split_axis: list[int] = []
    leaf_first: list[int] = []
    leaf_count: list[int] = []
    order_parts: list[np.ndarray] = []
    order_pos = 0

    tri_arr = [ref_tri]
    lo_arr = [ref_lo]
    hi_arr = [ref_hi]

    def make_leaf(idx) -> int:
        nonlocal order_pos
        tris = np.sort(np.unique(tri_arr[0][idx])).astype(np.int32)
        if len(tris) == 0:  # empty cell: a 0-tri leaf is illegal; emit a
            # single-poison-tri leaf is wasteful -- instead reuse any tri
            # id 0 with a poison woop record? Simplest: empty leaves carry
            # one sentinel-only run (count 0 handled by _leaf_rows? no).
            tris = np.array([0], np.int32)  # run exists; woop poisoned below
        leaf_first.append(order_pos)
        leaf_count.append(len(tris))
        order_parts.append(tris)
        order_pos += len(tris)
        return ~(len(leaf_first) - 1)

    empty_leaf_marks: list[int] = []

    def build(idx, box_lo, box_hi, depth) -> int:
        count = len(idx)
        if count == 0:
            leaf = make_leaf(idx)
            empty_leaf_marks.append(~leaf)
            return leaf
        if count <= max_leaf or depth >= max_depth:
            return make_leaf(idx)
        lo = lo_arr[0][idx]
        hi = hi_arr[0][idx]
        ext = box_hi - box_lo
        axis = int(np.argmax(ext))
        if ext[axis] <= 0:
            return make_leaf(idx)
        edges = box_lo[axis] + (np.arange(1, nb, dtype=np.float32) / nb) * ext[axis]
        # SAH per candidate plane.
        d = box_hi - box_lo
        other = d[(axis + 1) % 3] * d[(axis + 2) % 3]
        peri = d[(axis + 1) % 3] + d[(axis + 2) % 3]
        area = 2 * (other + d[axis] * peri)
        lcnt = (lo[:, axis:axis + 1] < edges[None, :]).sum(axis=0)
        rcnt = (hi[:, axis:axis + 1] > edges[None, :]).sum(axis=0)
        wl = edges - box_lo[axis]
        wr = box_hi[axis] - edges
        sah = (cfg.sah_node_cost
               + cfg.sah_tri_cost * (lcnt * 2 * (other + wl * peri)
                                     + rcnt * 2 * (other + wr * peri)) / area)
        k = int(np.argmin(sah))
        if sah[k] >= cfg.sah_tri_cost * count:
            return make_leaf(idx)
        plane = float(edges[k])

        go_l = lo[:, axis] < plane
        go_r = hi[:, axis] > plane
        on_plane = ~(go_l | go_r)  # degenerate refs exactly on the plane
        li = idx[go_l | on_plane]
        ri = idx[go_r]
        node = len(child_rows)
        child_rows.append([0, 0])
        split_pos.append(plane)
        split_axis.append(axis)
        bl_hi = box_hi.copy(); bl_hi[axis] = plane
        br_lo = box_lo.copy(); br_lo[axis] = plane
        c0 = build(li, box_lo, bl_hi, depth + 1)
        c1 = build(ri, br_lo, box_hi, depth + 1)
        child_rows[node] = [c0, c1]
        return node

    import sys

    sys.setrecursionlimit(100000)
    root = build(np.arange(n, dtype=np.int64), root_lo.copy(), root_hi.copy(), 0)

    if root < 0:  # whole scene one leaf: emit a trivial split node
        empty = make_leaf(np.array([], dtype=np.int64))
        empty_leaf_marks.append(~empty)
        child_rows.append([root, empty])
        split_pos.append(float(root_hi[0]))
        split_axis.append(0)

    # ---- flatten: node rows + shared leaf machinery ----------------------
    leaf_first_a = np.asarray(leaf_first, np.int32)
    leaf_count_a = np.asarray(leaf_count, np.int32)
    tri_order = np.concatenate(order_parts).astype(np.int32)
    ordered, dst_rows, sent_rows, w_total = _leaf_rows(
        leaf_first_a, leaf_count_a, tri_order
    )
    w = woopify(tv[ordered])
    w[:, 0] += np.float32(0.0)
    # Poison the runs of empty cells (their single placeholder tri must
    # never report a hit).
    woop = np.zeros((w_total, 12), np.float32)
    woop[dst_rows] = w
    sent = np.zeros((12,), np.float32)
    sent[0] = np.int32(-0x80000000).view(np.float32)
    woop[sent_rows] = sent
    tri_index = np.full((w_total,), -1, np.int32)
    tri_index[dst_rows] = ordered.astype(np.int32)
    counts = leaf_count_a.astype(np.int64)
    new_first = np.concatenate([[0], np.cumsum(counts + 1)[:-1]]).astype(np.int64)
    for leaf_id in empty_leaf_marks:
        row = int(new_first[leaf_id])
        woop[row] = 0.0
        woop[row, 7] = -1.0
        woop[row, 11] = -1.0
        tri_index[row] = -1

    nn = len(child_rows)
    nodes = np.zeros((nn, 16), np.float32)
    nodes[:, 0] = np.asarray(split_pos, np.float32)
    nodes[:, 0] += 0.0
    nodes[:, 1] = np.asarray(split_axis, np.int32).view(np.float32)
    ch = np.asarray(child_rows, np.int32)
    is_leaf = ch < 0
    leaf_ids = np.where(is_leaf, ~ch, 0)
    enc = np.where(is_leaf, ~(new_first[leaf_ids].astype(np.int32)), ch)
    nodes[:, 12] = enc[:, 0].astype(np.int32).view(np.float32)
    nodes[:, 13] = enc[:, 1].astype(np.int32).view(np.float32)

    return FlatKDTree(
        nodes=nodes, woop=woop, tri_index=tri_index,
        root_lo=root_lo, root_hi=root_hi, num_tris=n,
    )
