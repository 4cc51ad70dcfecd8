"""Per-frame orchestration: build -> raygen -> trace -> secondary -> shade.

Reference parity (~ rt/cuda/Renderer.{cpp,hpp} + RendererKernels.cu,
SURVEY.md SS3.2): Renderer owns the accel build, primary raygen, the
per-ray-type secondary passes (shadow any-hit / AO any-hit / diffuse
closest-hit batches, optionally Morton-sorted), a shading kernel, and the
framebuffer. Batching caps in-flight rays (max_batch_rays ~ the reference's
1-4M cap) by looping the tracer over chunks.

Shading model (the reference's debug/benchmark shading, not a PBR renderer):
  primary: |unit geometric normal|, black background
  shadow : normal shading * (0.25 + 0.75 * unoccluded)
  ao     : normal shading * mean(unoccluded samples)
  diffuse: normal shading * 0.5 + 0.5 * bounce-hit normal shading
  path   : diffuse-material path with `bounces` bounces, emissive lights
"""

from __future__ import annotations

from dataclasses import dataclass, field

import os

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.bvh.flatten import FlatBVH, flatten_bvh
from ntrace_tpu.bvh.median import build_median_bvh
from ntrace_tpu.core import BuildConfig, Camera, RenderConfig, Scene
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.ray.raybatch import RayBatch, morton_sort_rays
from ntrace_tpu.bvh.wide import build_wide_table
from ntrace_tpu.trace.persistent import trace_persistent
from ntrace_tpu.trace.wide_jax import trace_wide
from ntrace_tpu.trace.stack_jax import trace_stack
from ntrace_tpu.trace.stack2_jax import trace_stack2
from ntrace_tpu.trace.unified import unify_tables
from ntrace_tpu.utils.timing import StageTimer


@dataclass
class RenderResult:
    image: np.ndarray                     # (H, W, 3) float32 linear
    hit_tri: np.ndarray                   # (H*W,) int32 primary hits (pixel order)
    hit_t: np.ndarray                     # (H*W,) float32
    stats: dict = field(default_factory=dict)


# Packed-table VMEM budget for the single-chunk packet engine; tests
# shrink this to force the forest path on tiny scenes.
VMEM_BUDGET = 96 << 20


def _load_tuned() -> dict:
    """Device-measured engine choice for auto dispatch.

    scripts/pick_tuned.py distills the A/B sweep (results_r3b_sweep.json)
    into tuned.json at the repo root: {"engine": ..., "packet_rows": ...}.
    NTRACE_TUNED overrides the path; NTRACE_TUNED=0 disables. Absent or
    unreadable files mean "no tuning" -- auto keeps its static default.
    """
    import json

    path = os.environ.get("NTRACE_TUNED")
    if path == "0":
        return {}
    if not path:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "tuned.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _cam_fingerprint(cam: dict):
    """Hashable snapshot of every camera array, or None when any entry is
    a tracer (inside someone else's jit, where values can't be read)."""
    if any(isinstance(v, jax.core.Tracer) for v in cam.values()):
        return None
    try:
        return tuple((k, np.asarray(v, np.float32).tobytes())
                     for k, v in sorted(cam.items()))
    except (TypeError, ValueError, jax.errors.ConcretizationTypeError):
        return None


def _packet_family_tracer(engine: str, nodes, tris, *, tpr: int, npr: int,
                          lu: int, rows: int, interpret: bool,
                          tuned_kw: dict, dmin: int):
    """Tracer constructor for the packet-kernel family, shared by the
    single-chunk path and every forest chunk pass so the two cannot
    drift in clamps or knobs. Returns f(o, d, tn, tx, any_hit[,
    nodes_o, tris_o]) -- the optional trailing pair overrides the
    bound tables with tracer-stage arrays, so a caller's jit can take
    the tables as ARGUMENTS instead of closure constants (closure
    capture embeds them in the lowered stablehlo: San Miguel's 791 MB
    forest blew the axon remote-compile request cap, HTTP 413)."""
    if engine == "packet_bdl":
        from ntrace_tpu.trace.packet_bdl import trace_packet_bdl

        rc = min(max(rows, 8), 64)
        ms = bool(tuned_kw.get("merge_sibs"))
        qg = int(tuned_kw.get("qgroup", 1))
        if rc % qg != 0:
            qg = 1

        def tr(o, d, tn, tx, any_hit, nodes_o=None, tris_o=None):
            return trace_packet_bdl(
                nodes if nodes_o is None else nodes_o,
                tris if tris_o is None else tris_o,
                o, d, tn, tx, any_hit=any_hit, rows=rc,
                interpret=interpret, tris_per_row=tpr, drain_min=dmin,
                merge_sibs=ms, qgroup=qg)
    elif engine == "packet_dleaf":
        from ntrace_tpu.trace.packet_dleaf import trace_packet_dleaf

        rc = min(max(rows, 8), 32)

        def tr(o, d, tn, tx, any_hit, nodes_o=None, tris_o=None):
            return trace_packet_dleaf(
                nodes if nodes_o is None else nodes_o,
                tris if tris_o is None else tris_o,
                o, d, tn, tx, any_hit=any_hit, rows=rc,
                interpret=interpret, tris_per_row=tpr, nodes_per_row=npr,
                drain_min=dmin)
    elif engine == "packet_bfs":
        from ntrace_tpu.trace.packet_bfs import trace_packet_bfs

        rc = max(rows, 8)

        def tr(o, d, tn, tx, any_hit, nodes_o=None, tris_o=None):
            return trace_packet_bfs(
                nodes if nodes_o is None else nodes_o,
                tris if tris_o is None else tris_o,
                o, d, tn, tx, any_hit=any_hit, rows=rc,
                interpret=interpret, tris_per_row=tpr, leaf_unroll=lu)
    elif engine == "packet":
        from ntrace_tpu.trace.packet_pallas import trace_packet

        # Mosaic ray blocks need sublane counts divisible by 8; sub-8-row
        # packets (incoherent-mode tuning) interleave enough independent
        # packets to fill the block.
        ilv = 1 if rows >= 8 else 8 // rows
        # tuned_kw may carry bdl-only knobs (merge_sibs); keep only the
        # base kernel's.
        pk_kw = {k: v for k, v in tuned_kw.items()
                 if k in ("leafbc", "slabbc")}

        def tr(o, d, tn, tx, any_hit, nodes_o=None, tris_o=None):
            return trace_packet(
                nodes if nodes_o is None else nodes_o,
                tris if tris_o is None else tris_o,
                o, d, tn, tx, any_hit=any_hit, rows=rows,
                interpret=interpret, order="code", tris_per_row=tpr,
                nodes_per_row=npr, leaf_unroll=lu, interleave=ilv,
                **pk_kw)
    else:
        raise ValueError(f"not a batch-family packet engine: {engine!r}")
    return tr


def build_accel(scene: Scene, cfg: BuildConfig = BuildConfig(),
                use_cache: bool = False) -> FlatBVH:
    """Builder dispatch (median now; lbvh/hlbvh/sbvh land in later commits)."""
    if use_cache:
        from ntrace_tpu.utils import cache as accel_cache

        hit = accel_cache.load_accel(scene, cfg)
        if hit is not None:
            return hit
        flat = build_accel(scene, cfg, use_cache=False)
        accel_cache.save_accel(scene, cfg, flat)
        return flat
    if cfg.builder in ("median", "golden"):
        bvh = build_median_bvh(scene, cfg)
        return flatten_bvh(bvh, scene)
    if cfg.builder == "lbvh":
        from ntrace_tpu.bvh.lbvh import build_lbvh_flat

        return build_lbvh_flat(scene, cfg)
    if cfg.builder == "hlbvh":
        from ntrace_tpu.bvh.hlbvh import build_hlbvh_flat

        return build_hlbvh_flat(scene, cfg)
    if cfg.builder == "kdtree":
        from ntrace_tpu.bvh.kdtree import build_kdtree

        return build_kdtree(scene, cfg)
    if cfg.builder in ("sbvh", "binned_sah"):
        from ntrace_tpu.bvh.sbvh import build_sbvh

        bvh = build_sbvh(scene, cfg)
        return flatten_bvh(bvh, scene)
    raise ValueError(f"unknown builder {cfg.builder!r}")


def normal_color(geom_normals, hit_tri):
    """|unit geometric normal| debug shading; black on miss.

    Module-level so the multi-chip step (parallel/mesh.py) shades with the
    SAME code as the single-chip renderer (no silent drift).
    """
    tri = jnp.maximum(hit_tri, 0)
    gn = geom_normals[tri]
    gn = gn / (jnp.linalg.norm(gn, axis=-1, keepdims=True) + 1e-30)
    col = jnp.abs(gn)
    return jnp.where(hit_tri[:, None] >= 0, col, 0.0)


def shadow_mix(base_col, lit):
    """The reference's shadow-mode mix: 25% ambient + 75% direct."""
    return base_col * (0.25 + 0.75 * lit)[:, None]


def seeded_closest_trace(tracer, orig, dirn, tmin, tmax, *, stride=16,
                         window=2, slack=np.float32(1.05)):
    """Closest-hit trace with a depth-prepass tmax seed + EXACT fixup.

    Pixel-Morton ray order makes every `stride` consecutive slots a screen
    tile; tracing one ray per tile (pass 0) and seeding each tile's tmax
    with a windowed max of neighbouring prepass depths lets the main pass
    traverse with a tight per-ray [tmin, seed] segment -- the hitT culling
    that normally only develops late in traversal is available from step
    one. Rays that report a miss under a BINDING seed are retraced with
    their original tmax (pass 2, everyone else dead-marked), so results
    are exactly those of a plain trace: a hit under a smaller tmax is the
    true closest hit, and any true hit beyond the seed is recovered by the
    fixup. The seed heuristic affects only speed, never the image.
    """
    R = orig.shape[0]
    pre = tracer(orig[::stride], dirn[::stride], tmin[::stride],
                 tmax[::stride], False)
    pt = jnp.where(pre[0] >= 0, pre[1], jnp.float32(np.inf))
    wmax = pt
    for s in range(1, window + 1):
        wmax = jnp.maximum(wmax, jnp.roll(pt, s))
        wmax = jnp.maximum(wmax, jnp.roll(pt, -s))
    seed = jnp.repeat(wmax * slack, stride, total_repeat_length=pt.shape[0] * stride)[:R]
    tx1 = jnp.minimum(jnp.where(jnp.isfinite(seed), seed, tmax), tmax)
    tri1, t1, u1, v1 = tracer(orig, dirn, tmin, tx1, False)
    need = (tri1 < 0) & (tx1 < tmax)
    tx2 = jnp.where(need, tmax, tmin)   # non-fixup rays are dead lanes
    tri2, t2, u2, v2 = tracer(orig, dirn, tmin, tx2, False)
    return tuple(
        jnp.where(need, b, a)
        for a, b in zip((tri1, t1, u1, v1), (tri2, t2, u2, v2)))


def subset_seeded_trace(tracer, sub_tracer, orig, dirn, tmin, tmax):
    """Closest-hit trace with a sparse-SUBSET geometry tmax seed. EXACT.

    seeded_closest_trace's depth-prepass seed needs neighbour coherence
    (screen tiles), which bounce rays don't have. But an upper bound on
    each ray's OWN closest t comes from tracing a 1/K subset of the
    triangles: a subset hit is a real scene hit, so t_sub >= t_closest,
    and the main pass can traverse with tmax' ~ t_sub -- hitT pruning
    from step one instead of developing late, the win on long
    incoherent rays whose packets otherwise walk deep unions.

    Exactness needs care at the boundary: the slab test's box-entry
    arithmetic ((lo - o) * inv_d) rounds a few ulps ABOVE the true hit
    t, so tmax' = nextafter(t_sub) can prune the very node holding the
    hit (measured: 4/6144 fairy-class rays). Two guards make the result
    bit-identical to a plain trace: a small multiplicative slack on the
    seed, and seeded_closest_trace's exact FIXUP -- any ray that misses
    under a BINDING seed retraces with its original tmax (everyone else
    dead-marked, so the fixup packet train terminates in one step per
    packet). A hit under a smaller tmax is the true closest hit with
    the true (t, lowest-id) tie-break, since every candidate with
    t <= t_sub < tmax' is in range and the subset triangle itself is in
    the full tables.
    """
    stri, st, _, _ = sub_tracer(orig, dirn, tmin, tmax, False)
    seed = jnp.where(
        stri >= 0,
        jnp.minimum(st * np.float32(1.0 + 1e-4), tmax), tmax)
    tri1, t1, u1, v1 = tracer(orig, dirn, tmin, seed, False)
    need = (tri1 < 0) & (seed < tmax)
    tx2 = jnp.where(need, tmax, tmin)   # non-fixup rays are dead lanes
    tri2, t2, u2, v2 = tracer(orig, dirn, tmin, tx2, False)
    return tuple(
        jnp.where(need, b, a)
        for a, b in zip((tri1, t1, u1, v1), (tri2, t2, u2, v2)))


def staged_closest_trace(tracer, orig, dirn, tmin, tmax, radii):
    """EXACT multi-interval closest-hit trace for long incoherent rays.

    The reference's per-ray kernels win on incoherent rays because each
    ray's traversal is bounded by its own running hitT; a packet kernel
    walks the UNION of its rays' segments, and full-length bounce rays
    make that union the whole scene (fairy diffuse 6.5 vs AO 117 on the
    same kernel). Decomposing the interval restores the bound at packet
    granularity:

      pass k: trace [tn, tn + radii[k]) -- AO-class traversal economics.
        A hit here IS the global closest: traversal with tmax clamped to
        the cut is exhaustive within the interval, and every candidate
        beyond it has strictly larger t.
      resolved lanes are DEAD-MARKED in place (tmax = tmin) for later
        passes -- no sort, no compaction; a mostly-dead packet's union
        shrinks to its few live lanes (the seeded_closest_trace fixup
        mechanism).
      final pass: unresolved lanes re-cover the FULL [tn, tx), so
        rounding at the stage cuts is never consulted; a lane with its
        closest hit exactly AT a cut (excluded by the stage's strict
        t < tmax) is recovered here with the true (t, lowest-id)
        tie-break.

    radii: ascending absolute near-interval lengths (world units).
    Returns (tri, t, u, v) bit-identical to tracer(o, d, tn, tx, False)
    on hits and hit ids (miss t follows the plain trace's convention via
    the final pass).
    """
    res = None
    acc = None
    for rc in radii:
        t1 = jnp.minimum(tmax, tmin + jnp.float32(rc))
        txk = t1 if res is None else jnp.where(res, tmin, t1)
        cur = tracer(orig, dirn, tmin, txk, False)
        got = cur[0] >= 0
        now = got | (t1 >= tmax)
        if acc is None:
            acc, res = list(cur), now
        else:
            new = ~res & now
            acc = [jnp.where(new, c, a) for c, a in zip(cur, acc)]
            res = res | now
    txf = jnp.where(res, tmin, tmax)
    fin = tracer(orig, dirn, tmin, txf, False)
    return tuple(jnp.where(res, a, f) for a, f in zip(acc, fin))


def _trace_batched(tracer, batch: RayBatch, cap: int, any_hit: bool):
    """Loop the tracer over <=cap-ray chunks (the in-flight ray cap).

    Device OOM retries with a halved cap (SURVEY.md SS6.3: the benchmark
    harness's failure-handling policy) down to a 4k floor.
    """
    import sys

    n = batch.num_rays
    while True:
        try:
            if n <= cap:
                return tracer(batch.orig, batch.dirn, batch.tmin, batch.tmax,
                              any_hit)
            outs = []
            for s in range(0, n, cap):
                e = min(s + cap, n)
                outs.append(tracer(
                    batch.orig[s:e], batch.dirn[s:e],
                    batch.tmin[s:e], batch.tmax[s:e], any_hit,
                ))
            return tuple(jnp.concatenate([o[i] for o in outs]) for i in range(4))
        except Exception as err:  # jaxlib.XlaRuntimeError has no stable path
            if "RESOURCE_EXHAUSTED" not in str(err) or cap <= 4096:
                raise
            cap //= 2
            print(f"[renderer] device OOM; retrying with ray cap {cap}",
                  file=sys.stderr)


def _compact_trace(tracer, batch: RayBatch, cap: int, any_hit: bool,
                   compact: str = "auto"):
    """Trace only the live prefix of a dead-at-end-sorted batch.

    The reference's kepler_dynamic_fetch keeps lanes full by fetching
    fresh rays as lanes terminate (SURVEY.md SS3.3). The TPU analogue is
    shape-level: morton_sort_rays already sorts dead rays (tmax <= tmin)
    to the END, so between-pass compaction is just truncating to the live
    prefix -- whole packets of dead rays are never dispatched. The prefix
    is padded to a power of two (>=8192) so at most ~log2(R) distinct
    kernel shapes ever compile; results are padded back to full length
    with miss sentinels.

    Callers must pass a batch whose dead rays are at the end (i.e. after
    morton_sort_rays); `compact` in {"on", "off", "auto"} -- auto engages
    when the live fraction is below 3/4 (one host sync of a scalar sum,
    piggybacking on the per-stage block_until_ready the renderer already
    does).
    """
    n = batch.num_rays
    if compact != "off" and n > 8192:
        live = int(jnp.sum(batch.tmax > batch.tmin))
        padded = max(8192, 1 << max(live - 1, 1).bit_length())
        if padded < n and (compact == "on" or live <= (3 * n) // 4):
            sub = RayBatch(batch.orig[:padded], batch.dirn[:padded],
                           batch.tmin[:padded], batch.tmax[:padded],
                           None)
            tri, t, u, v = _trace_batched(tracer, sub, cap, any_hit)
            pad = n - padded
            tri = jnp.concatenate([tri, jnp.full((pad,), -1, tri.dtype)])
            t = jnp.concatenate([t, jnp.zeros((pad,), t.dtype)])
            u = jnp.concatenate([u, jnp.zeros((pad,), u.dtype)])
            v = jnp.concatenate([v, jnp.zeros((pad,), v.dtype)])
            return tri, t, u, v
    return _trace_batched(tracer, batch, cap, any_hit)


class Renderer:
    def __init__(self, scene: Scene, build_cfg: BuildConfig = BuildConfig(),
                 cfg: RenderConfig = RenderConfig(), flat: FlatBVH | None = None):
        self.scene = scene
        self.cfg = cfg
        self.build_cfg = build_cfg
        self.timer = StageTimer()
        # Packed-direct fast path: builder=lbvh on TPU emits the packet
        # kernel's lane-packed tables entirely on device
        # (bvh/lbvh.py build_lbvh_packed) -- no FlatBVH device->host
        # round trip, no host pack_bvh. Per-frame rebuild cost IS this
        # build (BASELINE config #4).
        self._direct = False
        import os as _os
        if (flat is None and cfg.engine in ("auto", "packet")
                and build_cfg.builder == "lbvh"
                and (jax.default_backend() in ("tpu", "axon")
                     # test hook: exercise the direct path off-TPU (the
                     # kernel then runs interpreted as usual)
                     or _os.environ.get("NTRACE_DIRECT") == "1")):
            tri_rows = -(-scene.num_tris // 12)
            node_rows = (int(scene.num_tris * 3.2
                             / (build_cfg.max_leaf_size + 4)) + 256)
            if (tri_rows + node_rows) * 512 <= VMEM_BUDGET:
                from ntrace_tpu.bvh.lbvh import build_lbvh_packed

                with self.timer.stage("build"):
                    self.packed = build_lbvh_packed(
                        scene, build_cfg, tris_per_row=12, nodes_per_row=1)
                self._direct = True
        if self._direct:
            self.flat = None
        else:
            with self.timer.stage("build"):
                self.flat = (flat if flat is not None
                             else build_accel(scene, build_cfg))
        engine = cfg.engine
        # Screen-space bin-raster primary engine (trace/binraster.py):
        # traversal-free, exact, and past the packet family's scalar-chain
        # plateau on coherent camera rays. Orthogonal to the main engine
        # (which still serves every secondary/any-hit pass): explicit via
        # engine="binraster", or device-measured via tuned.json's
        # primary_engine on TPU auto. prepare_primary() arms it per
        # camera/resolution; trace_primary() falls back to the BVH path
        # whenever it is not armed.
        self.primary_engine = None
        if engine in ("binraster", "binraster_dense"):
            self.primary_engine = engine
            engine = "auto"
        from ntrace_tpu.bvh.kdtree import FlatKDTree, kd_to_flatbvh

        if engine == "kdtree" and not isinstance(self.flat, FlatKDTree):
            # The interval-stack kd engine needs a kd accel; rebuild
            # regardless of the given flat.
            from ntrace_tpu.bvh.kdtree import build_kdtree

            self.flat = build_kdtree(scene, build_cfg)
        if isinstance(self.flat, FlatKDTree) and engine != "kdtree":
            # kd fast path: re-express the kd tree as a FlatBVH of its CELL
            # boxes (bvh/kdtree.py kd_to_flatbvh) and run the requested BVH
            # engine over it -- under auto on TPU that is the Pallas packet
            # kernel. The interval-stack semantics-reference engine stays
            # under the explicit name "kdtree".
            self.flat_kd = self.flat
            self.flat = kd_to_flatbvh(self.flat)
        self.tuned_rows = 0
        self.tuned_dmin = 0
        self.tuned_kw = {}
        if cfg.merge_sibs:  # explicit-engine knob; tuned.json may also set
            self.tuned_kw["merge_sibs"] = True
        if cfg.qgroup != 1:
            self.tuned_kw["qgroup"] = int(cfg.qgroup)
        if engine in ("auto", "wavefront"):
            # The Pallas packet engine is the fast path everywhere on TPU:
            # single-chunk when the packed tables fit VMEM, Morton-chunked
            # forest (bvh/forest.py) when they don't. Off-TPU the packet
            # kernel only runs interpreted (test-speed), so auto avoids it.
            engine = "stack2"
            if self._direct or (jax.default_backend() in ("tpu", "axon")
                                and isinstance(self.flat, FlatBVH)):
                engine = "packet"
                # Device-measured kernel choice (scripts/pick_tuned.py
                # writes tuned.json from the A/B sweep results): auto
                # picks the measured-fastest packet-family schedule. The
                # lbvh packed-direct tables are nodes_per_row=1, so every
                # batch-family schedule runs on them too; the non-batch
                # variant schedules need the host repack and stay off the
                # direct path.
                allowed = ("packet", "packet_bfs", "packet_dleaf",
                           "packet_bdl")
                if not self._direct:
                    allowed += ("packet_ifif", "packet_ww", "packet_pipe")
                tuned = _load_tuned()
                if tuned.get("engine") in allowed:
                    engine = tuned["engine"]
                    self.tuned_rows = int(tuned.get("packet_rows", 0))
                    self.tuned_dmin = min(int(tuned.get("drain_min", 0)),
                                          64)
                    self.tuned_kw.update({
                        k: tuned[k]
                        for k in ("leafbc", "slabbc", "merge_sibs",
                                  "qgroup")
                        if tuned.get(k)})
        known_engines = ("stack", "stack2", "bvh8", "kdtree", "packet",
                         "packet_ifif", "packet_ww", "packet_pipe",
                         "packet_bfs", "packet_dleaf", "packet_bdl",
                         "packet_wide", "cpu_golden")
        if engine not in known_engines:
            raise ValueError(
                f"unknown engine {engine!r}; known: {known_engines}"
            )
        self.engine = engine
        if (self.primary_engine is None
                and cfg.engine in ("auto", "wavefront")
                and jax.default_backend() in ("tpu", "axon")
                and _load_tuned().get("primary_engine")
                in ("binraster", "binraster_dense")):
            self.primary_engine = _load_tuned()["primary_engine"]
        if self.primary_engine is not None:
            cap = int(os.environ.get("NTRACE_BINRASTER_MAX_TRIS",
                                     3_000_000))
            if scene.num_tris > cap:
                self.primary_engine = None   # sort/table sizes blow up
            else:
                self._br_verts = jax.device_put(
                    jnp.asarray(scene.tri_verts(), dtype=jnp.float32))
                self._br = None              # armed by prepare_primary()
        if engine == "stack":
            self.flat_dev = (
                jax.device_put(jnp.asarray(self.flat.nodes)),
                jax.device_put(jnp.asarray(self.flat.woop)),
                jax.device_put(jnp.asarray(self.flat.tri_index)),
            )

            def _tracer(o, d, tn, tx, any_hit, tables=None):
                fd = tables[0] if tables else self.flat_dev
                return trace_stack(*fd, o, d, tn, tx, any_hit=any_hit)
        elif engine == "kdtree":
            from ntrace_tpu.trace.kdtree_jax import trace_kd

            ut, n_nodes = unify_tables(self.flat)
            self.ut_dev = jax.device_put(jnp.asarray(ut))
            self.ut_nodes = n_nodes
            kd_lo = jnp.asarray(self.flat.root_lo)
            kd_hi = jnp.asarray(self.flat.root_hi)
            chunk = min(cfg.max_batch_rays, 1 << 13)

            def _tracer(o, d, tn, tx, any_hit, tables=None):
                r = o.shape[0]
                pad = (-r) % chunk
                if pad:
                    o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
                    d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
                    tn = jnp.concatenate([tn, jnp.zeros((pad,), tn.dtype)])
                    tx = jnp.concatenate([tx, jnp.zeros((pad,), tx.dtype)])
                out = trace_kd(self.ut_dev, self.ut_nodes, kd_lo, kd_hi,
                               o, d, tn, tx, any_hit=any_hit, chunk=chunk)
                return tuple(x[:r] for x in out)
        elif engine == "bvh8":  # 8-wide one-dispatch engine
            wt = build_wide_table(self.flat)
            self.wt_dev = jax.device_put(jnp.asarray(wt.table))
            self.wt_nodes = wt.n_node_rows
            chunk = min(cfg.max_batch_rays, 1 << 13)

            def _tracer(o, d, tn, tx, any_hit, tables=None):
                r = o.shape[0]
                pad = (-r) % chunk
                if pad:
                    o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
                    d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
                    tn = jnp.concatenate([tn, jnp.zeros((pad,), tn.dtype)])
                    tx = jnp.concatenate([tx, jnp.zeros((pad,), tx.dtype)])
                wt = tables[0][0] if tables else self.wt_dev
                out = trace_wide(wt, self.wt_nodes, o, d, tn, tx,
                                 any_hit=any_hit, chunk=chunk)
                return tuple(x[:r] for x in out)
        elif engine == "packet_wide":  # 8-wide frustum-interval Pallas kernel
            from ntrace_tpu.bvh.wide_packed import pack_wide_bvh
            from ntrace_tpu.trace.packet_wide import trace_packet_wide

            wp = pack_wide_bvh(self.flat, scene.tri_verts(), tris_per_row=4)
            self.packed = wp
            self.packed_nodes = jax.device_put(jnp.asarray(wp.nodes_w))
            self.packed_tris = jax.device_put(jnp.asarray(wp.tris12))
            rows = cfg.packet_rows
            interpret = jax.default_backend() not in ("tpu", "axon")

            def _tracer(o, d, tn, tx, any_hit, tables=None):
                return trace_packet_wide(
                    self.packed_nodes, self.packed_tris, o, d, tn, tx,
                    any_hit=any_hit, rows=rows, interpret=interpret,
                    interleave=2, tris_per_row=wp.tris_per_row,
                )
        elif engine in ("packet", "packet_ifif", "packet_ww", "packet_pipe",
                        "packet_bfs", "packet_dleaf", "packet_bdl"):
            # Pallas shared-stack packet kernels (three schedules of the
            # same traversal; see trace/packet_*.py)
            from ntrace_tpu.bvh.packed import pack_bvh, pick_layout

            def _layout_of(flat):
                n_refs = int((flat.tri_index >= 0).sum())
                enc = np.ascontiguousarray(
                    flat.nodes[:, 12:14]).view(np.int32)
                n_leaves = max(int((enc < 0).sum()), 1)
                avg_leaf = n_refs / n_leaves
                tpr, npr = pick_layout(
                    flat.nodes.shape[0], n_refs, avg_leaf=avg_leaf)
                return n_refs, avg_leaf, tpr, npr

            if self._direct:
                forest = False
                packed = self.packed   # device-built (build_lbvh_packed)
                self.leaf_unroll = (4 if build_cfg.max_leaf_size >= 6
                                    else 1)
                self.packed_nodes = packed.nodes8
                self.packed_tris = packed.tris12
            else:
                n_refs, avg_leaf, tpr, npr = _layout_of(self.flat)
                if engine in ("packet_bfs", "packet_bdl"):
                    npr = 1   # batch loads want direct row addressing --
                    #           size the VMEM estimate with THAT layout,
                    #           or oversized tables slip past the forest
                    #           fallback and fail to load on device
                est_bytes = (-(-self.flat.nodes.shape[0] // npr)
                             + -(-n_refs // tpr)) * 512
                forest = engine == "packet" and est_bytes > VMEM_BUDGET
                if engine != "packet" and est_bytes > VMEM_BUDGET:
                    # tables exceed VMEM: route through the Morton-chunked
                    # forest (per-chunk tables fit VMEM individually). The
                    # forest dispatches the batch-kernel family per chunk;
                    # other schedules fall back to the packet kernel
                    # rather than building an unloadable table.
                    if engine not in ("packet_bfs", "packet_dleaf",
                                      "packet_bdl"):
                        engine = self.engine = "packet"
                    forest = True
            if not forest and not self._direct:
                self.leaf_unroll = 4 if avg_leaf >= 6.0 else 1
                packed = pack_bvh(self.flat, scene.tri_verts(),
                                  tris_per_row=tpr, nodes_per_row=npr)
                self.packed = packed
                self.packed_nodes = jax.device_put(jnp.asarray(packed.nodes8))
                self.packed_tris = jax.device_put(jnp.asarray(packed.tris12))
            rows = self.tuned_rows or cfg.packet_rows
            # No Mosaic backend off-TPU: tests run the interpreter.
            interpret = jax.default_backend() not in ("tpu", "axon")

            if forest:
                _tracer = self._make_forest_tracer(
                    scene, _layout_of, rows, interpret, engine)
            elif engine in ("packet", "packet_bfs", "packet_bdl",
                            "packet_dleaf"):
                _fam = _packet_family_tracer(
                    engine, self.packed_nodes, self.packed_tris,
                    tpr=packed.tris_per_row, npr=packed.nodes_per_row,
                    lu=self.leaf_unroll, rows=rows, interpret=interpret,
                    tuned_kw=self.tuned_kw, dmin=self.tuned_dmin)

                def _tracer(o, d, tn, tx, any_hit, tables=None):
                    nt = tables[0] if tables else (None, None)
                    return _fam(o, d, tn, tx, any_hit, nt[0], nt[1])
            elif engine == "packet_ifif":
                from ntrace_tpu.trace.packet_ifif import trace_packet_ifif

                def _tracer(o, d, tn, tx, any_hit, tables=None):
                    return trace_packet_ifif(
                        self.packed_nodes, self.packed_tris, o, d, tn, tx,
                        any_hit=any_hit, rows=rows, interpret=interpret,
                        tris_per_row=packed.tris_per_row,
                        nodes_per_row=packed.nodes_per_row,
                    )
            else:
                from ntrace_tpu.trace.packet_pipe import trace_packet_pipe
                from ntrace_tpu.trace.packet_ww import trace_packet_ww

                fn = (trace_packet_ww if engine == "packet_ww"
                      else trace_packet_pipe)

                def _tracer(o, d, tn, tx, any_hit, tables=None):
                    return fn(
                        self.packed_nodes, self.packed_tris, o, d, tn, tx,
                        any_hit=any_hit, rows=rows, interpret=interpret,
                        tris_per_row=packed.tris_per_row,
                        nodes_per_row=packed.nodes_per_row,
                    )
        elif engine == "cpu_golden":  # host reference tracer (slow, exact)
            def _tracer(o, d, tn, tx, any_hit, tables=None):
                from ntrace_tpu.trace.cpu import trace_cpu_golden

                rec = trace_cpu_golden(
                    self.flat, np.asarray(o), np.asarray(d),
                    np.asarray(tn), np.asarray(tx), any_hit=any_hit,
                )
                return (jnp.asarray(rec.tri), jnp.asarray(rec.t),
                        jnp.asarray(rec.u), jnp.asarray(rec.v))
        else:  # stack2: unified-table engine, one dispatch per batch
            ut, n_nodes = unify_tables(self.flat)
            self.ut_dev = jax.device_put(jnp.asarray(ut))
            self.ut_nodes = n_nodes
            chunk = min(cfg.max_batch_rays, 1 << 13)  # measured optimum

            def _tracer(o, d, tn, tx, any_hit, tables=None):
                # tables: optional ((ut,),) from device_tables() so a
                # caller's jit takes the unified table as an ARGUMENT --
                # closure capture embeds it in the module (hairball's
                # 300 MB ut made chained-jit remote compiles crawl).
                ut = tables[0][0] if tables else self.ut_dev
                r = o.shape[0]
                if r <= chunk:
                    return trace_stack2(ut, self.ut_nodes, o, d,
                                        tn, tx, any_hit=any_hit)
                pad = (-r) % chunk
                if pad:
                    o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
                    d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
                    tn = jnp.concatenate([tn, jnp.zeros((pad,), tn.dtype)])
                    tx = jnp.concatenate([tx, jnp.zeros((pad,), tx.dtype)])
                out = trace_persistent(ut, self.ut_nodes, o, d, tn, tx,
                                       any_hit=any_hit, chunk=chunk)
                return tuple(x[:r] for x in out)
        self._tracer = _tracer
        gn = scene.geometric_normals()
        self.geom_normals = jax.device_put(jnp.asarray(gn))
        mats = np.stack([np.asarray(m.diffuse, np.float32) for m in scene.materials])
        emis = np.stack([np.asarray(m.emissive, np.float32) for m in scene.materials])
        self.mat_diffuse = jax.device_put(jnp.asarray(mats))
        self.mat_emissive = jax.device_put(jnp.asarray(emis))
        self.mat_ids = jax.device_put(jnp.asarray(scene.mat_ids))
        lo, hi = scene.bbox()
        self.scene_lo = jnp.asarray(lo)
        self.scene_hi = jnp.asarray(hi)
        self.scene_scale = float(np.linalg.norm(hi - lo))
        self.eps = jnp.float32(self.scene_scale * 1e-4)

    def _make_forest_tracer(self, scene, layout_of, rows, interpret,
                            engine: str = "packet"):
        """Large-scene packet path: Morton-chunked BVH forest.

        The packed tables exceed the ~96 MB VMEM budget, so triangles are
        split into Morton-contiguous chunks, each with its own accel +
        packed tables (HBM-resident; VMEM holds one chunk per pallas
        dispatch). Chunks trace sequentially inside the caller's jit with
        per-ray hit state threaded between passes (bvh/forest.py).
        Per-chunk tables fit VMEM individually, so any batch-family
        kernel (packet / packet_bfs / packet_dleaf / packet_bdl) can run
        each chunk pass -- the measured-fastest schedule serves the big
        scenes too.
        """
        import sys

        from ntrace_tpu.bvh.forest import morton_partition, sub_scene
        from ntrace_tpu.bvh.packed import pack_bvh
        from ntrace_tpu.ops.aabb import safe_inv_dir

        # Batch kernels need nodes_per_row=1 (8x the node-table bytes):
        # size the chunks for THAT layout, or the per-chunk tables break
        # the VMEM budget this path exists to respect.
        batch_engine = engine in ("packet_bfs", "packet_bdl")
        per_ref = 160 if batch_engine else 64
        chunks = morton_partition(scene,
                                  max_refs=max(VMEM_BUDGET // per_ref, 1))
        self.forest = []
        for ci, ids in enumerate(chunks):
            sub = sub_scene(scene, ids, ci)
            with self.timer.stage("build"):
                fl = build_accel(sub, self.build_cfg, use_cache=True)
            _, avg_leaf, tpr, npr = layout_of(fl)
            if batch_engine:
                n_refs_c = int((fl.tri_index >= 0).sum())
                n1_bytes = (fl.nodes.shape[0] + -(-n_refs_c // tpr)) * 512
                if n1_bytes <= VMEM_BUDGET:
                    npr = 1   # batch loads want direct row addressing
                else:
                    # even the resized chunk can't afford npr=1 (very
                    # thin leaves): degrade the forest to the base packet
                    # kernel, which handles any npr -- chunks already
                    # packed at npr=1 stay valid for it.
                    batch_engine = False
                    engine = self.engine = "packet"
            pk = pack_bvh(fl, sub.tri_verts(), tris_per_row=tpr,
                          nodes_per_row=npr, tri_id_map=ids.astype(np.int64))
            lo_k, hi_k = sub.bbox()
            self.forest.append(dict(
                nodes=jax.device_put(jnp.asarray(pk.nodes8)),
                tris=jax.device_put(jnp.asarray(pk.tris12)),
                tpr=pk.tris_per_row, npr=pk.nodes_per_row,
                lu=4 if avg_leaf >= 6.0 else 1,
                lo=jnp.asarray(lo_k), hi=jnp.asarray(hi_k),
            ))
        print(f"[renderer] packet forest: {len(self.forest)} chunks, "
              f"{sum(c['nodes'].nbytes + c['tris'].nbytes for c in self.forest)/1e6:.0f}"
              f" MB total", file=sys.stderr)

        def _seg_hits(o, d, tn, tx, lo, hi):
            """Conservative [tn,tx] segment vs chunk AABB (NaN-suppressing
            fmin/fmax, matching ops/aabb.py slab semantics). False means NO
            triangle of the chunk can be hit by the ray's live segment."""
            inv = safe_inv_dir(jnp, d)
            t0 = (lo[None, :] - o) * inv
            t1 = (hi[None, :] - o) * inv
            begin = jnp.fmax(jnp.fmin(t0, t1).max(axis=1), tn)
            end = jnp.fmin(jnp.fmax(t0, t1).min(axis=1), tx)
            return begin <= end

        def _chunk_trace(c, nt, o, d, tn, tx_k, any_hit):
            """One chunk pass with the selected batch-family kernel --
            built by the SAME constructor as the single-chunk path
            (identical results across schedules; tests/test_packet.py).
            nt: optional (nodes, tris) tracer-stage override from the
            caller's `tables=` argument (see device_tables)."""
            if "tracer" not in c:
                c["tracer"] = _packet_family_tracer(
                    engine, c["nodes"], c["tris"], tpr=c["tpr"],
                    npr=c["npr"], lu=c["lu"], rows=rows,
                    interpret=interpret, tuned_kw=self.tuned_kw,
                    dmin=self.tuned_dmin)
            no, to = (nt if nt is not None else (None, None))
            return c["tracer"](o, d, tn, tx_k, any_hit, no, to)

        def _tracer(o, d, tn, tx, any_hit, tables=None):
            # Miss conventions match the single-chunk kernel: tri=-1, t=tmax,
            # u=v=0 (chunk passes run with masked tmax, so their miss values
            # must not leak into the result).
            R = o.shape[0]
            cf = self.cfg.compact_forest
            compact = ((cf == "on" or (cf == "auto" and len(self.forest) > 1))
                       and R >= 2048)
            if compact:
                # Chunk-membership compaction (reference dynamic-fetch
                # capability, SURVEY.md SS3.3): group rays by the SET of
                # chunk bboxes their segment can touch. Packets become
                # chunk-homogeneous: for a chunk outside a packet's
                # membership every lane is dead-marked below, so the whole
                # packet exits in one step instead of traversing for a few
                # straggler lanes. The secondary iota key preserves the
                # caller's coherence order within each membership class.
                # Per-ray results are exact and packet-grouping-invariant,
                # so this cannot change a pixel (tests/test_packet.py).
                memb = jnp.zeros((R,), jnp.int32)
                for k, c in enumerate(self.forest):
                    memb = memb | (
                        _seg_hits(o, d, tn, tx, c["lo"], c["hi"])
                        .astype(jnp.int32) << k)
                ops = jax.lax.sort(
                    (memb, jnp.arange(R, dtype=jnp.int32),
                     o[:, 0], o[:, 1], o[:, 2],
                     d[:, 0], d[:, 1], d[:, 2], tn, tx),
                    num_keys=2)
                perm = ops[1]
                o = jnp.stack(ops[2:5], axis=1)
                d = jnp.stack(ops[5:8], axis=1)
                tn, tx = ops[8], ops[9]
            zero = jnp.zeros_like(tn)
            best = [jnp.full(tn.shape, -1, jnp.int32), tx, zero, zero]
            cur_tx = tx
            for ci, c in enumerate(self.forest):
                # Between-pass compaction (the reference's dynamic-fetch
                # capability, SURVEY.md SS3.3): rays whose live segment
                # misses this chunk's bbox -- finished any-hit rays,
                # closest-hit rays whose shrunken [tn, bestT] no longer
                # reaches the chunk, and plain spatial misses -- are
                # dead-marked (tmax=tmin). The coherence sort packs such
                # rays together, so their packets exit in ~1 step and the
                # live packets traverse tighter unions.
                live = _seg_hits(o, d, tn, cur_tx, c["lo"], c["hi"])
                tx_k = jnp.where(live, cur_tx, tn)
                tri_k, t_k, u_k, v_k = _chunk_trace(
                    c, tables[ci] if tables else None,
                    o, d, tn, tx_k, any_hit)
                got = tri_k >= 0
                # Chunk k ran with tmax = best-so-far t, so any hit it
                # reports is strictly closer (or the ray was dead).
                for i, val in enumerate((tri_k, t_k, u_k, v_k)):
                    best[i] = jnp.where(got, val, best[i])
                found = best[0] >= 0
                if any_hit:
                    cur_tx = jnp.where(found, tn, tx)   # kill finished rays
                else:
                    cur_tx = jnp.where(found, best[1], tx)
            if compact:
                # Un-permute results back to caller ray order. perm is a
                # permutation, so a single-key sort is deterministic.
                back = jax.lax.sort((perm,) + tuple(best), num_keys=1)
                return back[1], back[2], back[3], back[4]
            return tuple(best)

        return _tracer

    def device_tables(self):
        """Forest chunk tables as a pytree for passing through an outer
        jit's ARGUMENTS (`trace_primary(..., tables=...)`) instead of
        closure capture. Closure-captured tables embed in the lowered
        stablehlo as literal constants; at San Miguel scale (791 MB of
        chunk tables, 7 chunks) the serialized module exceeded the axon
        remote-compile request cap (HTTP 413, r5 matrix). Empty tuple
        for non-forest engines, where capture is cheap (<~200 MB) --
        callers can pass the result unconditionally."""
        if getattr(self, "forest", None):
            return tuple((c["nodes"], c["tris"]) for c in self.forest)
        if getattr(self, "ut_dev", None) is not None:
            return ((self.ut_dev,),)
        if getattr(self, "flat_dev", None) is not None:
            return (self.flat_dev,)
        if getattr(self, "wt_dev", None) is not None:
            return ((self.wt_dev,),)
        if (getattr(self, "packed_nodes", None) is not None
                and self.engine in ("packet", "packet_bfs", "packet_bdl",
                                    "packet_dleaf")):
            return ((self.packed_nodes, self.packed_tris),)
        return ()

    def _tracer_with(self, tables):
        """self._tracer with `tables` bound when provided (forest engine
        only -- other engines have no tables kwarg and `tables` is ()
        for them)."""
        if not tables:
            return self._tracer
        return (lambda o, d, tn, tx, any_hit:
                self._tracer(o, d, tn, tx, any_hit, tables=tables))

    def prepare_primary(self, cam: dict, width: int, height: int) -> bool:
        """Arm the bin-raster primary engine for (cam, W, H): pick the
        static pair buckets with one eager device count. Must run OUTSIDE
        jit (bench.py / render() call it before tracing); returns True
        when armed. No-op unless primary_engine is a binraster variant."""
        if self.primary_engine == "binraster_dense":
            return self._prepare_primary_dense(cam, width, height)
        if self.primary_engine != "binraster":
            return False
        if width % 32 or height % 32:
            self._br = None      # kernel tiles are (8,128): 32x32 bins
            return False
        from ntrace_tpu.trace import binraster as _br

        txn, tyn = width // 32, height // 32
        try:
            # Raises when the bin grid's Morton codes exceed the kernel's
            # 10-bit budget (frames over ~1 Mpx); fall back to the BVH
            # path instead of crashing an ordinary render_frame.
            mcodes = _br._bin_mcodes(txn, tyn)
        except ValueError:
            self._br = None
            return False
        tuned = _load_tuned()
        k_slots = int(tuned.get("br_k", 8))
        k2_slots = int(tuned.get("br_k2", 64))
        total, n_mid, n_g = (int(x) for x in _br.count_pairs_fast(
            self._br_verts, cam, width=width, height=height, tile=32,
            k_slots=k_slots, k2_slots=k2_slots))
        self._br = {
            "width": width, "height": height, "nb": txn * tyn,
            "k_slots": k_slots, "k2_slots": k2_slots,
            "p_max": _br.pick_pmax(total),
            "g_max": _br.pick_gmax(n_mid + n_g),
            "g2_max": _br.pick_gmax(n_g, floor=192),
            "unroll": int(tuned.get("br_unroll", 4)),
            "ez_chunk": int(tuned.get("br_ez", 8)),
            "mcodes": jnp.asarray(mcodes),
            "cam_pos": np.asarray(cam["pos"], np.float32),
        }
        return True

    def _prepare_primary_dense(self, cam: dict, width: int, height: int):
        """Arm the dense-lane (v2) bin-raster engine: sublane-major tri
        groups, zero scalar-pipe work per pair (trace/binraster_dense.py).
        Tile size is a tuned knob (br2_tile; 16 px default -- quarter the
        VPU pair-tests of the 32 px v1 grid per the tile-size study)."""
        from ntrace_tpu.trace import binraster_dense as _bd

        tuned = _load_tuned()
        tile = int(tuned.get("br2_tile", 16))
        if (width % tile or height % tile or tile & (tile - 1)
                or (tile * tile) % 128):
            self._br = None
            return False
        txn, tyn = width // tile, height // tile
        z_bits = 12
        try:
            mcodes = _bd.bin_mcodes(txn, tyn, 31 - z_bits)
        except ValueError:
            self._br = None   # bin grid exceeds the fused key's bin bits
            return False
        k_cap = int(tuned.get("br2_kcap", 64))
        total, n_mid, n_g = (int(x) for x in _bd.count_pairs_dense(
            self._br_verts, cam, width=width, height=height, tile=tile,
            k_slots=k_cap, k2_slots=k_cap))
        # Scale policy (VERDICT r4 #6/weak-6): every prep op scales with
        # the pair count, so arming is gated on it, not on a triangle
        # cap alone -- a camera that blows the pair budget (hairball/
        # San Miguel class) routes to the BVH engines instead of arming
        # a measured loser. Default from the conference crossover
        # pricing; tuned.json can move it per fleet measurement.
        max_pairs = int(tuned.get("br2_max_pairs", 2_000_000))
        if total + n_mid > max_pairs:
            self._br = None
            return False
        sort_mode = str(tuned.get("br2_sort", "s11"))
        n_ks = ()
        if sort_mode == "v5":
            # v5's prefix-slice emission needs the N_k histogram; size
            # p_max over the quantized slice sum (>= the true total).
            _, hist, _ = _bd.count_hist_dense(
                self._br_verts, cam, width=width, height=height,
                tile=tile, k_cap=k_cap)
            n_ks = _bd.pick_nks(np.asarray(hist))
            p_max = _bd.pick_cap(sum(n_ks), 16 * _bd.TPT)
        else:
            p_max = _bd.pick_cap(total + n_mid, 16 * _bd.TPT)
        g2_max = _bd.pick_cap(n_g, _bd.TPT, pad=_bd.TPT) if n_g else 0
        nb = txn * tyn
        self._br = {
            "dense": True, "width": width, "height": height,
            "nb": nb, "tile": tile, "ray_rows": tile * tile // 128,
            "k_cap": k_cap, "z_bits": z_bits,
            "p_max": p_max, "g2_max": g2_max,
            "ez_chunk": int(tuned.get("br2_ez", 0)),
            "tpv": int(tuned.get("br2_tpv", 1)),
            "sort_mode": sort_mode, "n_ks": n_ks,
            "kernel": str(tuned.get("br2_kernel", "walk")),
            "v_cap": _bd.visit_cap(p_max, nb, g2_max),
            "mcodes": jnp.asarray(mcodes),
            "cam_pos": np.asarray(cam["pos"], np.float32),
        }
        return True

    def _dense_prep(self, verts, cam):
        """Run the armed dense prep (v3 sg/s11, v4, or v5 slices per the
        br2_sort knob) with the armed static caps."""
        from ntrace_tpu.trace import binraster_dense as _bd

        c = self._br
        kw = dict(width=c["width"], height=c["height"], tile=c["tile"],
                  k_cap=c["k_cap"], p_max=c["p_max"], g2_max=c["g2_max"],
                  z_bits=c["z_bits"])
        if c["sort_mode"] == "v5":
            return _bd.binraster_prep_dense5(verts, cam, c["mcodes"],
                                             n_ks=c["n_ks"], **kw)
        if c["sort_mode"] == "v4":
            return _bd.binraster_prep_dense4(verts, cam, c["mcodes"], **kw)
        return _bd.binraster_prep_dense3(verts, cam, c["mcodes"],
                                         sort_mode=c["sort_mode"], **kw)

    def freeze_primary_structure(self, cam: dict) -> float:
        """Build the dense engine's screen-space structure ONCE, eagerly,
        and pin it for subsequent trace_primary calls -- the analogue of
        the reference's prebuilt CudaBVH (its benchmark times traversal
        against a prebuilt tree; the dense prep is this engine's
        structure build). Geometry or camera changes require re-calling.
        Returns the build's wall seconds (callers report it alongside).
        Requires a prior successful prepare_primary."""
        import time as _time

        from ntrace_tpu.trace import binraster_dense as _bd

        c = self._br
        t0 = _time.time()
        out = jax.block_until_ready(self._dense_prep(self._br_verts, cam))
        c["frozen"] = out
        # Staleness guard (round-4 VERDICT weak-5): the frozen rows pin
        # THIS camera's binning; a rotated camera at the same position
        # would pass the origin/tmin contract but trace stale bins.
        # Fingerprint every camera array so trace_primary can verify.
        c["frozen_fp"] = _cam_fingerprint(cam)
        return _time.time() - t0

    def _trace_binraster_dense(self, dirn, tmin, tmax, cam):
        from ntrace_tpu.trace import binraster_dense as _bd

        c = self._br
        frozen = c.get("frozen")
        if frozen is not None:
            # Staleness guard: only trust the frozen structure when the
            # camera fingerprint still matches (concrete cams only --
            # a traced cam can't be verified, so it re-preps in-chain,
            # which is always correct, merely slower).
            fp = _cam_fingerprint(cam)
            if fp is None or fp != c.get("frozen_fp"):
                frozen = None
        if frozen is not None:
            rows, r0, r1, g1, ok = frozen
        else:
            # Same prep-in-the-frame-chain trick as v1 (1e-30 * tmin[0]).
            veff = self._br_verts + 1e-30 * tmin[0]
            rows, r0, r1, g1, ok = self._dense_prep(veff, cam)
        dirs = jnp.transpose(dirn).reshape(3 * c["nb"] * c["ray_rows"], 128)
        scalars = jnp.concatenate([
            cam["pos"].astype(jnp.float32),
            jnp.stack([tmin[0], tmax[0], jnp.float32(0),
                       jnp.float32(0), jnp.float32(0)])])
        interpret = jax.default_backend() == "cpu"
        if c["kernel"] == "visits":
            vt, bv = _bd.build_visit_list(r0, r1, g1, v_cap=c["v_cap"],
                                          nb=c["nb"])
            tri, t, u, v = _bd.trace_dense_visits(
                rows, vt, bv, dirs, scalars, n_bins=c["nb"],
                ray_rows=c["ray_rows"], interpret=interpret)
        elif c["kernel"] == "dma":
            tri, t, u, v = _bd.trace_dense_rows_dma(
                rows, r0, r1, dirs, scalars, g1, n_bins=c["nb"],
                ray_rows=c["ray_rows"], interpret=interpret)
        else:
            tri, t, u, v = _bd.trace_dense_rows(
                rows, r0, r1, dirs, scalars, g1, n_bins=c["nb"],
                ray_rows=c["ray_rows"], ez_chunk=c["ez_chunk"],
                tpv=c["tpv"], interpret=interpret)
        return jnp.where(ok, tri, -2), t, u, v

    def _trace_binraster(self, dirn, tmin, tmax, cam):
        from ntrace_tpu.trace import binraster as _br

        c = self._br
        # 1e-30 * tmin[0] is numerically identity on scene-scale verts but
        # ties the prep into the frame's data chain, so chained-frame
        # benchmarks cannot hoist the (camera-dependent) prep out of the
        # per-frame marginal.
        veff = self._br_verts + 1e-30 * tmin[0]
        rows, r0, r1, g1, ok = _br.binraster_prep_fast(
            veff, cam, c["mcodes"], width=c["width"], height=c["height"],
            tile=32, k_slots=c["k_slots"], g_max=c["g_max"],
            p_max=c["p_max"], k2_slots=c["k2_slots"],
            g2_max=c["g2_max"])
        dirs = jnp.transpose(dirn).reshape(3 * c["nb"] * 8, 128)
        scalars = jnp.concatenate([
            cam["pos"].astype(jnp.float32),
            jnp.stack([tmin[0], tmax[0], jnp.float32(0),
                       jnp.float32(0), jnp.float32(0)])])
        tri, t, u, v = _br.trace_binraster_rows(
            rows, r0, r1, dirs, scalars, g1, n_bins=c["nb"],
            unroll=c["unroll"], ez_chunk=c["ez_chunk"],
            interpret=jax.default_backend() == "cpu")
        return jnp.where(ok, tri, -2), t, u, v

    def trace_primary(self, orig, dirn, tmin, tmax, cam=None,
                      canonical=None, tables=None):
        """Primary-ray closest-hit trace with the configured seeding policy
        (shared by render() and bench.py so the headline measures the same
        path users get). cam: optional camera_arrays dict -- required for
        the bin-raster screen-space engine (prepare_primary arms it).

        Bin-raster contract: the screen-space engine only serves CANONICAL
        primary rays -- orig == cam['pos'] for every ray, uniform
        tmin == znear and uniform tmax (raygen.primary's output). Calls
        with per-ray tmin/tmax or non-camera origins are routed to the
        BVH path below, whose semantics are fully general.

        canonical: None = verify the contract with one device reduce
        (impossible on traced inputs, where the check declines binraster).
        Callers that BUILT the batch via raygen.primary(cam) may pass
        True to assert it -- the only way to reach the screen-space
        engine from inside an enclosing jit (render(), bench.py and the
        matrix all do). False forces the general BVH path."""
        if (canonical is True
                and cam is not None
                and getattr(self, "_br", None) is not None
                and not any(isinstance(a, jax.core.Tracer)
                            for a in (orig, tmin, tmax, *cam.values()))):
            # ADVICE r4: trust the canonical assertion only where the
            # check is impossible (traced inputs). On concrete inputs a
            # violated contract is a caller bug -- fail loudly instead
            # of silently tracing a stale screen-space structure.
            if not self._binraster_contract_ok(orig, tmin, tmax, cam):
                raise ValueError(
                    "trace_primary(canonical=True): rays violate the "
                    "bin-raster contract (orig == cam pos, uniform "
                    "tmin == znear, uniform tmax); rebuild the batch "
                    "with raygen.primary(cam) or pass canonical=False")
        if (cam is not None
                and canonical is not False
                and self.primary_engine in ("binraster", "binraster_dense")
                and getattr(self, "_br", None) is not None
                and dirn.shape[0] == self._br["width"] * self._br["height"]
                and (canonical is True
                     or self._binraster_contract_ok(orig, tmin, tmax, cam))):
            if self._br.get("dense"):
                return self._trace_binraster_dense(dirn, tmin, tmax, cam)
            return self._trace_binraster(dirn, tmin, tmax, cam)
        sp = self.cfg.seed_primary
        use_seed = sp == "on" or (sp == "auto"
                                  and self.engine.startswith("packet"))
        tracer = self._tracer_with(tables)
        if use_seed and orig.shape[0] <= self._cap() \
                and orig.shape[0] >= 16 * 4:
            return seeded_closest_trace(tracer, orig, dirn, tmin, tmax)
        batch = RayBatch(orig, dirn, tmin, tmax)
        return _trace_batched(tracer, batch, self._cap(), False)

    def _binraster_contract_ok(self, orig, tmin, tmax, cam):
        """One cheap device reduce verifying the bin-raster preconditions
        (uniform tmin == znear, uniform tmax, orig == camera position).
        Traced inputs (inside someone else's jit) can't be checked --
        decline binraster there and take the general BVH path."""
        try:
            ok = bool(jnp.all(
                (tmin == cam["znear"]) & (tmax == tmax[0])
                & (orig == jnp.asarray(self._br["cam_pos"])).all(axis=-1)))
        except jax.errors.TracerBoolConversionError:
            return False
        return ok

    def _cap(self):
        """Per-dispatch ray cap: the persistent stack2 tracer chunks
        internally, so it takes whole batches (up to a 4M safety cap)."""
        if self.engine == "stack":
            return self.cfg.max_batch_rays
        return max(self.cfg.max_batch_rays, 1 << 22)

    # -- shading helpers (all jitted via callers) -------------------------

    def _unit_normals(self, hit_tri, dirn):
        n, _ = raygen.surface_frame(hit_tri, dirn, self.geom_normals, 0.0)
        return n

    def _normal_color(self, hit_tri):
        return normal_color(self.geom_normals, hit_tri)

    # -- ray-type passes ---------------------------------------------------

    def gen_secondary(self, camera: Camera, mode: str, batch, tri, t,
                      key=None):
        """Secondary RayBatch for `mode` exactly as render() builds it
        (dead rays zero-length, optional Morton coherence sort).

        Returns (RayBatch, any_hit). Shared by render() and the matrix
        benchmark so chained-marginal trace timings measure the very
        batch the renderer traces (VERDICT r3: one measurement protocol).
        """
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed) if key is None else key
        hit_mask = tri >= 0
        normals = self._unit_normals(tri, batch.dirn)
        hit_pos = batch.orig + jnp.where(hit_mask, t, 0.0)[:, None] * batch.dirn
        if mode == "shadow":
            light = jnp.asarray(self._default_light(camera), jnp.float32)
            sbatch = raygen.shadow(hit_pos, normals, light, self.eps)
            sbatch = RayBatch(sbatch.orig, sbatch.dirn, sbatch.tmin,
                              jnp.where(hit_mask, sbatch.tmax, 0.0),
                              sbatch.slot_to_id)
            return sbatch, True
        if mode in ("ao", "diffuse"):
            S = cfg.samples
            gen = raygen.ao if mode == "ao" else raygen.diffuse
            arg = cfg.ao_radius if mode == "ao" else self.scene_scale * 10.0
            sec = gen(key, hit_pos, normals, S, jnp.float32(arg), self.eps)
            sec = RayBatch(sec.orig, sec.dirn, sec.tmin,
                           jnp.where(jnp.repeat(hit_mask, S), sec.tmax, 0.0),
                           sec.slot_to_id)
            if cfg.sort_secondary:
                sec = morton_sort_rays(sec, self.scene_lo, self.scene_hi,
                                       direction_major=(mode != "ao"))
            return sec, mode == "ao"
        raise ValueError(f"no secondary pass for mode {mode!r}")

    def render(self, camera: Camera, mode: str | None = None) -> RenderResult:
        cfg = self.cfg
        mode = mode or cfg.mode
        W, H = cfg.width, cfg.height
        timer = StageTimer()
        order, _ = pixel_table(W, H)
        cam = raygen.camera_arrays(camera, W, H)

        with timer.stage("raygen"):
            batch = raygen.primary(cam, W, H, jnp.asarray(order))
            jax.block_until_ready(batch.dirn)
        self.prepare_primary(cam, W, H)
        with timer.stage("trace_primary"):
            # The batch was just built by raygen.primary(cam): canonical
            # by construction, so assert the bin-raster contract.
            tri, t, u, v = self.trace_primary(
                batch.orig, batch.dirn, batch.tmin, batch.tmax, cam=cam,
                canonical=True)
            jax.block_until_ready(t)
        timer.count("rays_primary", batch.num_rays)

        hit_mask = tri >= 0
        normals = self._unit_normals(tri, batch.dirn)
        t_safe = jnp.where(hit_mask, t, 0.0)
        hit_pos = batch.orig + t_safe[:, None] * batch.dirn
        base_col = self._normal_color(tri)
        key = jax.random.PRNGKey(cfg.seed)

        if mode == "primary":
            color = base_col
        elif mode == "textured":
            from ntrace_tpu.render import texture as tex

            if not hasattr(self, "_atlas"):
                uvs = (self.scene.uvs if self.scene.uvs is not None
                       else np.zeros((self.scene.num_tris, 3, 2), np.float32))
                self._uvs = jax.device_put(jnp.asarray(uvs))
                if cfg.tex_filter == "nearest":
                    self._atlas = jax.device_put(
                        jnp.asarray(tex.build_atlas(self.scene.materials)))
                else:
                    flat_mips, offs, sides = tex.build_mip_atlas(
                        self.scene.materials)
                    self._atlas = jax.device_put(jnp.asarray(flat_mips))
                    self._mip_offs, self._mip_sides = offs, sides
                    self._tex_density = jax.device_put(jnp.asarray(
                        tex.tri_texel_density(uvs, self.scene.tri_verts(),
                                              sides[0])))
            uv = tex.interpolate_uv(self._uvs, tri, u, v)
            mat = self.mat_ids[jnp.maximum(tri, 0)]
            if cfg.tex_filter == "nearest":
                albedo = tex.sample_atlas(self._atlas, mat, uv)
            elif cfg.tex_filter == "bilinear":
                albedo = tex.sample_atlas_bilinear(
                    self._atlas, self._mip_offs, self._mip_sides, mat, uv)
            else:  # trilinear (mipmapped, ray-cone LOD)
                pixel_angle = jnp.float32(
                    np.radians(camera.fov_deg) / cfg.height)
                ndotd_s = jnp.sum(normals * batch.dirn, axis=-1)
                lod = tex.cone_lod(self._tex_density[jnp.maximum(tri, 0)],
                                   t_safe, ndotd_s, pixel_angle)
                albedo = tex.sample_atlas_trilinear(
                    self._atlas, self._mip_offs, self._mip_sides, mat, uv,
                    lod)
            ndotd = jnp.abs(jnp.sum(normals * batch.dirn, axis=-1))
            color = jnp.where(hit_mask[:, None],
                              albedo * (0.2 + 0.8 * ndotd)[:, None], 0.0)
        elif mode == "shadow":
            with timer.stage("raygen_shadow"):
                sbatch, _ = self.gen_secondary(camera, mode, batch, tri, t,
                                               key=key)
                jax.block_until_ready(sbatch.tmax)
            with timer.stage("trace_shadow"):
                stri, *_ = _trace_batched(
                    self._tracer, sbatch, self._cap(), True
                )
                jax.block_until_ready(stri)
            timer.count("rays_shadow", sbatch.num_rays)
            lit = (stri < 0).astype(jnp.float32)
            color = shadow_mix(base_col, lit)
        elif mode in ("ao", "diffuse"):
            S = cfg.samples
            with timer.stage(f"raygen_{mode}"):
                # ao_radius is world units; AO rays sort origin-major,
                # long bounce rays direction-major (see raybatch.py).
                sec, _ = self.gen_secondary(camera, mode, batch, tri, t,
                                            key=key)
                jax.block_until_ready(sec.tmax)
            with timer.stage(f"trace_{mode}"):
                tr = self._secondary_tracer(long_rays=(mode == "diffuse"))
                if cfg.sort_secondary:  # dead rays are at the end
                    stri, st, su, sv = _compact_trace(
                        tr, sec, self._cap(), mode == "ao",
                        compact=cfg.compact_rays)
                else:
                    stri, st, su, sv = _trace_batched(
                        tr, sec, self._cap(), mode == "ao")
                jax.block_until_ready(stri)
            timer.count(f"rays_{mode}", sec.num_rays)
            if cfg.sort_secondary:
                from ntrace_tpu.ray.raybatch import unsort

                stri = unsort(stri, sec.slot_to_id)
            if mode == "ao":
                vis = (stri < 0).astype(jnp.float32).reshape(-1, S).mean(axis=1)
                color = base_col * vis[:, None]
            else:
                bounce_col = self._normal_color(stri).reshape(-1, S, 3).mean(axis=1)
                color = base_col * 0.5 + bounce_col * 0.5
        elif mode == "path":
            color = self._path_trace(key, batch, tri, t, timer)
        else:
            raise ValueError(f"unknown mode {mode!r}")

        with timer.stage("shade"):
            fb = jnp.zeros((W * H, 3), jnp.float32)
            fb = fb.at[batch.slot_to_id].set(color)
            img = np.asarray(fb).reshape(H, W, 3)

        from ntrace_tpu.ray.raybatch import unsort as _unsort

        stats = timer.ms()
        result = RenderResult(
            image=img,
            hit_tri=np.asarray(_unsort(tri, batch.slot_to_id)),
            hit_t=np.asarray(_unsort(t, batch.slot_to_id)),
            stats=stats,
        )
        # Mrays/s per traced pass (kernel time only, reference convention).
        for k in list(stats):
            if k.startswith("rays_"):
                name = k[5:]
                tkey = f"trace_{name}" if name != "primary" else "trace_primary"
                if tkey in stats and stats[tkey] > 0:
                    # stats[k] = ray count; stats[tkey] = ms.
                    result.stats[f"mrays_{name}"] = (
                        stats[k] / 1e6 / (stats[tkey] / 1e3)
                    )
        return result

    def _default_light(self, camera: Camera):
        if any(self.cfg.light):
            return np.asarray(self.cfg.light, np.float32)
        lo, hi = self.scene.bbox()
        # High-center light slightly toward the camera.
        c = (lo + hi) / 2
        return np.array([c[0], hi[1] * 0.95, c[2]], np.float32) * 0.7 + camera.position * 0.3

    def _subset_tracer(self):
        """Lazy 1/seed_subset-triangle prepass tracer (see
        subset_seeded_trace). None when construction is unsupported."""
        if hasattr(self, "_sub_tr"):
            return self._sub_tr
        self._sub_tr = None
        try:
            from ntrace_tpu.bvh.packed import pack_bvh, pick_layout

            K = max(int(self.cfg.seed_subset), 2)
            sub_scene = Scene(positions=self.scene.positions,
                              indices=self.scene.indices[::K],
                              name=f"{self.scene.name}-sub{K}")
            if sub_scene.num_tris < 4:
                return None
            flat = build_accel(
                sub_scene, BuildConfig(builder="binned_sah",
                                       sah_tri_cost=0.02,
                                       max_leaf_size=48), use_cache=True)
            n_refs = int((flat.tri_index >= 0).sum())
            enc = np.ascontiguousarray(
                flat.nodes[:, 12:14]).view(np.int32)
            avg_leaf = n_refs / max(int((enc < 0).sum()), 1)
            tpr, npr = pick_layout(flat.nodes.shape[0], n_refs,
                                   avg_leaf=avg_leaf)
            packed = pack_bvh(flat, sub_scene.tri_verts(),
                              tris_per_row=tpr, nodes_per_row=npr)
            nodes = jax.device_put(jnp.asarray(packed.nodes8))
            tris = jax.device_put(jnp.asarray(packed.tris12))
            rows = self.tuned_rows or self.cfg.packet_rows
            interpret = jax.default_backend() not in ("tpu", "axon")
            self._sub_tr = _packet_family_tracer(
                "packet", nodes, tris, tpr=packed.tris_per_row,
                npr=packed.nodes_per_row,
                lu=4 if avg_leaf >= 6.0 else 1, rows=rows,
                interpret=interpret, tuned_kw=self.tuned_kw,
                dmin=self.tuned_dmin)
        except Exception as e:
            import sys

            print(f"[renderer] subset seed tracer unavailable: {e}",
                  file=sys.stderr)
        return self._sub_tr

    def _secondary_tracer(self, long_rays: bool, tables=None):
        """The tracer secondary passes should use: subset-seeded for long
        incoherent closest-hit bounces when configured, else the plain
        engine tracer. Any-hit calls always pass through unseeded (they
        already early-out on the first hit). tables: optional forest
        chunk tables from device_tables(), for callers whose jit takes
        them as arguments."""
        cfg = self.cfg
        # auto is MEASUREMENT-gated, not heuristic: the r5 fairy device
        # A/B (results_r5_session3.json) priced subset seeding as a NET
        # LOSS on forest-class diffuse (5.1-5.5 vs 6.5 Mrays/s unseeded
        # -- near hits already self-prune via the kernel's running
        # hitT), so auto engages only when a device sweep wrote
        # seed_secondary_on into tuned.json for this fleet.
        on = (cfg.seed_secondary == "on"
              or (cfg.seed_secondary == "auto" and long_rays
                  and self.engine.startswith("packet")
                  and bool(_load_tuned().get("seed_secondary_on"))))
        base = self._tracer_with(tables)
        st_on = (cfg.stage_secondary == "on"
                 or (cfg.stage_secondary == "auto" and long_rays
                     and self.engine.startswith("packet")
                     and bool(_load_tuned().get("stage_secondary_on"))))
        if st_on:
            radii = tuple(float(f) * self.scene_scale
                          for f in cfg.stage_radii)

            def tr_staged(o, d, tn, tx, any_hit):
                if any_hit:
                    return base(o, d, tn, tx, True)
                return staged_closest_trace(base, o, d, tn, tx, radii)

            return tr_staged
        if not on:
            return base
        sub = self._subset_tracer()
        if sub is None:
            return base

        def tr(o, d, tn, tx, any_hit):
            if any_hit:
                return base(o, d, tn, tx, True)
            return subset_seeded_trace(base, sub, o, d, tn, tx)

        return tr

    def _path_trace(self, key, batch, tri, t, timer):
        """`bounces`-bounce diffuse path tracing with emissive materials."""
        cfg = self.cfg
        R = batch.num_rays
        throughput = jnp.ones((R, 3), jnp.float32)
        radiance = jnp.zeros((R, 3), jnp.float32)
        cur_orig, cur_dirn = batch.orig, batch.dirn
        cur_tri, cur_t = tri, t
        alive = cur_tri >= 0
        # Sky term for primary misses.
        radiance += jnp.where(alive[:, None], 0.0, 0.05)
        for b in range(cfg.bounces + 1):
            mat = self.mat_ids[jnp.maximum(cur_tri, 0)]
            emis = self.mat_emissive[mat]
            diff = self.mat_diffuse[mat]
            radiance += jnp.where(alive[:, None], throughput * emis, 0.0)
            throughput = throughput * jnp.where(alive[:, None], diff, 0.0)
            if b == cfg.bounces:
                break
            normals = self._unit_normals(cur_tri, cur_dirn)
            t_safe = jnp.where(alive, cur_t, 0.0)
            hit_pos = cur_orig + t_safe[:, None] * cur_dirn
            key, sub = jax.random.split(key)
            d = raygen.cosine_hemisphere(sub, normals, (R,))
            o = hit_pos + normals * self.eps
            nb = RayBatch(o, d, jnp.zeros((R,), jnp.float32),
                          jnp.where(alive, jnp.float32(self.scene_scale * 10), 0.0),
                          jnp.arange(R, dtype=jnp.int32))
            if cfg.sort_secondary:
                nb = morton_sort_rays(nb, self.scene_lo, self.scene_hi)
            with timer.stage(f"trace_bounce{b}"):
                tr = self._secondary_tracer(long_rays=True)
                if cfg.sort_secondary:  # dead rays are at the end
                    btri, bt, bu, bv = _compact_trace(
                        tr, nb, self._cap(), False,
                        compact=cfg.compact_rays)
                else:
                    btri, bt, bu, bv = _trace_batched(
                        tr, nb, self._cap(), False)
                jax.block_until_ready(btri)
            timer.count(f"rays_bounce{b}", R)
            if cfg.sort_secondary:
                from ntrace_tpu.ray.raybatch import unsort

                btri = unsort(btri, nb.slot_to_id)
                bt = unsort(bt, nb.slot_to_id)
                cur_orig, cur_dirn = o, d
            else:
                cur_orig, cur_dirn = nb.orig, nb.dirn
            # Ambient sky for bounce misses.
            sky = (btri < 0) & alive
            radiance += jnp.where(sky[:, None], throughput * 0.8, 0.0)
            alive = alive & (btri >= 0)
            cur_tri, cur_t = btri, bt
        return radiance


def render_frame(scene: Scene, camera: Camera | None = None,
                 cfg: RenderConfig = RenderConfig(),
                 build_cfg: BuildConfig = BuildConfig()) -> RenderResult:
    """One-call convenience: build, render, return the frame."""
    from ntrace_tpu.scenes import default_camera

    camera = camera or default_camera(scene.name)
    return Renderer(scene, build_cfg, cfg).render(camera)
