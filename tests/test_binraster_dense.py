"""Dense-lane bin-raster engine (v2) vs brute force and v1.

Exactness is the contract: the engine only CULLS via screen bins; every
surviving candidate runs the identical MT arithmetic (op order, f32
rounding) as the BVH engines and v1, so hits must match the golden
bit-for-bit -- see ntrace_tpu/trace/binraster_dense.py docstring.
Mirrors tests/test_binraster.py's strategy: interpret-mode kernel vs the
exhaustive MT reference on random soups, multiple poses, both bin tile
sizes, early-z on/off, and the overflow-poisoning contract.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ntrace_tpu.bvh.golden import brute_force_mt
from ntrace_tpu.core import Camera
from ntrace_tpu.ray.pixeltable import pixel_table
from ntrace_tpu.ray.raygen import camera_arrays, primary
from ntrace_tpu.scenes import make_random_soup
from ntrace_tpu.trace.binraster_dense import trace_dense_primary


def _frame(W, H, campos, fwd, n_tris, seed, **kw):
    scene = make_random_soup(n_tris=n_tris, seed=seed)
    cam = Camera(position=campos, forward=fwd, up=(0.0, 1.0, 0.0),
                 fov_deg=70.0, znear=1e-3, zfar=1e4)
    ca = camera_arrays(cam, W, H)
    order, _ = pixel_table(W, H)
    rb = primary(ca, W, H, order)
    tri, t, u, v = trace_dense_primary(
        jnp.asarray(scene.tri_verts()), ca, rb.dirn,
        width=W, height=H, interpret=True, **kw)
    ref = brute_force_mt(scene, np.asarray(rb.orig), np.asarray(rb.dirn),
                         np.asarray(rb.tmin), np.asarray(rb.tmax))
    return np.asarray(tri), np.asarray(t), np.asarray(u), np.asarray(v), ref


@pytest.mark.parametrize("tile,ez_chunk,sort_mode,kernel", [
    (16, 4, "s11", "walk"), (16, 0, "s11", "walk"), (32, 2, "s11", "walk"),
    (16, 0, "sg", "walk"), (16, 0, "v4", "walk"), (32, 2, "v4", "walk"),
    (16, 0, "v5", "walk"), (32, 2, "v5", "walk"),
    (16, 0, "sg", "visits"), (16, 0, "v4", "visits"),
    (32, 0, "s11", "visits"), (16, 0, "sg", "dma"),
    (16, 0, "v5", "visits")])
def test_dense_matches_brute_force(tile, ez_chunk, sort_mode, kernel):
    tri, t, u, v, ref = _frame(
        64, 64, (0.0, 0.0, 4.0), (0.0, 0.0, -1.0), 300, 7,
        tile=tile, ez_chunk=ez_chunk, sort_mode=sort_mode, kernel=kernel)
    np.testing.assert_array_equal(tri, ref.tri)
    hit = ref.tri >= 0
    assert hit.sum() > 100
    np.testing.assert_allclose(t[hit], ref.t[hit], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(u[hit], ref.u[hit], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(v[hit], ref.v[hit], rtol=1e-3, atol=2e-4)


def test_dense_oblique_camera():
    tri, t, u, v, ref = _frame(
        64, 48, (2.5, 1.5, 3.0), (-0.6, -0.35, -1.0), 500, 23, tile=16)
    np.testing.assert_array_equal(tri, ref.tri)


@pytest.mark.parametrize("sort_mode,kernel", [
    ("s11", "walk"), ("v4", "walk"), ("v4", "visits"), ("sg", "dma"),
    ("v5", "walk")])
def test_dense_camera_inside_soup(sort_mode, kernel):
    # Near-plane crossers + geometry in every direction: exercises the
    # walked-global tier (per-bin prefix visits in the visits kernel)
    # and the exact near-plane clip path.
    tri, t, u, v, ref = _frame(
        64, 64, (0.0, 0.0, 0.0), (0.3, -0.2, -1.0), 400, 37, tile=16,
        sort_mode=sort_mode, kernel=kernel)
    np.testing.assert_array_equal(tri, ref.tri)


def test_dense_overflow_poisons():
    # Undersized static bucket must poison hits (-2), never silently
    # drop triangles (p_max=88 < one pair per tri for 300 tris).
    tri, *_ = _frame(
        64, 64, (0.0, 0.0, 4.0), (0.0, 0.0, -1.0), 300, 7,
        tile=16, p_max=88)
    assert (tri == -2).all()


def test_renderer_dense_engine_matches_stack2():
    # engine="binraster_dense" plugs the v2 screen-space primary engine
    # into the renderer; the frame must be pixel-identical to stack2.
    from ntrace_tpu.core import BuildConfig, RenderConfig
    from ntrace_tpu.render.renderer import render_frame
    from ntrace_tpu.scenes import default_camera, get_scene

    scene = get_scene("conference", n_tris=2000)
    cam = default_camera("conference")
    bc = BuildConfig(builder="binned_sah")
    a = render_frame(scene, cam, build_cfg=bc, cfg=RenderConfig(
        width=64, height=64, mode="primary",
        engine="binraster_dense")).image
    b = render_frame(scene, cam, build_cfg=bc, cfg=RenderConfig(
        width=64, height=64, mode="primary", engine="stack2")).image
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dense_matches_v1_bit_exact():
    # Same soup, same camera, same 32px bins: v2 must agree with v1 on
    # tri ids AND t/u/v bits (both implement packet_pallas MT op order).
    from ntrace_tpu.trace.binraster import trace_binraster_primary

    scene = make_random_soup(n_tris=400, seed=51)
    cam = Camera(position=(0.5, -0.3, 3.5), forward=(-0.1, 0.1, -1.0),
                 up=(0.0, 1.0, 0.0), fov_deg=55.0, znear=1e-3, zfar=1e4)
    W = H = 64
    ca = camera_arrays(cam, W, H)
    order, _ = pixel_table(W, H)
    rb = primary(ca, W, H, order)
    verts = jnp.asarray(scene.tri_verts())
    t2, tt2, u2, v2 = trace_dense_primary(
        verts, ca, rb.dirn, width=W, height=H, tile=32, interpret=True)
    t1, tt1, u1, v1 = trace_binraster_primary(
        verts, ca, rb.dirn, width=W, height=H, tile=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(t1))
    hit = np.asarray(t1) >= 0
    np.testing.assert_array_equal(np.asarray(tt2)[hit],
                                  np.asarray(tt1)[hit])
    np.testing.assert_array_equal(np.asarray(u2)[hit], np.asarray(u1)[hit])
    np.testing.assert_array_equal(np.asarray(v2)[hit], np.asarray(v1)[hit])


def _armed_dense_renderer(monkeypatch, W=64, H=64):
    """A Renderer with the dense engine armed under a PINNED tuned config
    (ADVICE r4: reading the repo's tuned.json would silently change the
    exercised configuration whenever it is re-picked)."""
    from ntrace_tpu.core import BuildConfig, RenderConfig
    from ntrace_tpu.render import renderer as rmod
    from ntrace_tpu.scenes import default_camera, get_scene

    monkeypatch.setattr(rmod, "_load_tuned", lambda: {
        "br2_tile": 16, "br2_ez": 0, "br2_tpv": 1, "br2_sort": "sg",
        "br2_kcap": 64})
    scene = get_scene("conference", n_tris=2000)
    bc = BuildConfig(builder="binned_sah")
    flat = rmod.build_accel(scene, bc, use_cache=False)
    r = rmod.Renderer(scene, bc, RenderConfig(
        width=W, height=H, mode="primary", engine="binraster_dense"),
        flat=flat)
    ca = camera_arrays(default_camera("conference"), W, H)
    order, _ = pixel_table(W, H)
    rb = primary(ca, W, H, order)
    assert r.prepare_primary(ca, W, H)
    assert r._br is not None and r._br.get("dense")
    return r, ca, rb


def test_trace_primary_canonical_inside_jit(monkeypatch):
    # Regression (round 4): bench.py's chained jit calls trace_primary on
    # TRACED inputs, where the contract reduce cannot run -- without the
    # canonical=True assertion the renderer silently fell back to the BVH
    # path and the headline measured the wrong engine. The armed dense
    # path must engage inside jit and match the eager trace exactly.
    import jax

    r, ca, rb = _armed_dense_renderer(monkeypatch)
    eager = r.trace_primary(rb.orig, rb.dirn, rb.tmin, rb.tmax, cam=ca)

    @jax.jit
    def run(o, d, tn, tx):
        return r.trace_primary(o, d, tn, tx, cam=ca, canonical=True)

    jitted = run(rb.orig, rb.dirn, rb.tmin, rb.tmax)
    for a, b in zip(eager, jitted):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (np.asarray(jitted[0]) >= 0).sum() > 1000


def test_pair_budget_declines_arming(monkeypatch):
    # Scale policy (round-5): a camera whose pair count blows the tuned
    # budget must NOT arm the dense engine -- the BVH path serves it.
    from ntrace_tpu.trace import binraster_dense as bd

    r, ca, rb = _armed_dense_renderer(monkeypatch)
    monkeypatch.setattr(
        bd, "count_pairs_dense",
        lambda *a, **k: (jnp.int32(3_000_000), jnp.int32(0), jnp.int32(0)))
    assert not r.prepare_primary(ca, 64, 64)
    assert r._br is None
    # and trace_primary still answers (general path)
    tri, t, u, v = r.trace_primary(rb.orig, rb.dirn, rb.tmin, rb.tmax,
                                   cam=ca)
    assert (np.asarray(tri) >= 0).sum() > 0


def test_canonical_true_checked_on_concrete_inputs(monkeypatch):
    # ADVICE r4: canonical=True on CONCRETE rays that violate the
    # contract must raise, not silently trace a stale structure.
    r, ca, rb = _armed_dense_renderer(monkeypatch)
    bad_tmin = np.asarray(rb.tmin).copy()
    bad_tmin[7] += 0.5
    with pytest.raises(ValueError, match="canonical"):
        r.trace_primary(rb.orig, rb.dirn, jnp.asarray(bad_tmin), rb.tmax,
                        cam=ca, canonical=True)


def test_freeze_structure_staleness_guard(monkeypatch):
    # Round-4 VERDICT weak-5: a camera ROTATED in place passes the
    # origin/tmin contract, so without a fingerprint the frozen rows
    # would silently trace stale bins. The guard must re-prep and give
    # the rotated frame's correct image.
    from ntrace_tpu.core import Camera
    from ntrace_tpu.scenes import default_camera

    r, ca, rb = _armed_dense_renderer(monkeypatch)
    r.freeze_primary_structure(ca)
    assert r._br.get("frozen") is not None

    # Rotate IN PLACE: same position (so the origin/tmin contract still
    # holds), different view -- the frozen bins are stale for ca2. No
    # re-arm on purpose: the guard must catch it, not the caller.
    base = default_camera("conference")
    cam2 = Camera(position=base.position,
                  forward=base.forward + np.float32([0.08, 0.02, 0.0]),
                  up=base.up, fov_deg=70, znear=base.znear,
                  zfar=base.zfar)
    ca2 = camera_arrays(cam2, 64, 64)
    np.testing.assert_array_equal(np.asarray(ca["pos"]),
                                  np.asarray(ca2["pos"]))
    order, _ = pixel_table(64, 64)
    rb2 = primary(ca2, 64, 64, order)
    got = r.trace_primary(rb2.orig, rb2.dirn, rb2.tmin, rb2.tmax, cam=ca2)
    ref = r.trace_primary(rb2.orig, rb2.dirn, rb2.tmin, rb2.tmax, cam=ca2,
                          canonical=False)   # general BVH path
    assert (np.asarray(got[0]) >= 0).any()
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
