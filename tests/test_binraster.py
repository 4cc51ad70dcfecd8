"""Bin-raster primary engine vs brute force (exactness is the contract:
the engine only CULLS via screen bins; every surviving candidate runs the
identical MT arithmetic as the BVH engines, so hits must match the golden
bit-for-bit -- see ntrace_tpu/trace/binraster.py docstring)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ntrace_tpu.bvh.golden import brute_force_mt
from ntrace_tpu.core import Camera
from ntrace_tpu.ray.pixeltable import pixel_table
from ntrace_tpu.ray.raygen import camera_arrays, primary
from ntrace_tpu.scenes import make_random_soup
from ntrace_tpu.trace.binraster import trace_binraster_primary


def _frame(W, H, campos, fwd, n_tris, seed, **kw):
    scene = make_random_soup(n_tris=n_tris, seed=seed)
    cam = Camera(position=campos, forward=fwd, up=(0.0, 1.0, 0.0),
                 fov_deg=70.0, znear=1e-3, zfar=1e4)
    ca = camera_arrays(cam, W, H)
    order, _ = pixel_table(W, H)
    rb = primary(ca, W, H, order)
    tri, t, u, v = trace_binraster_primary(
        jnp.asarray(scene.tri_verts()), ca, rb.dirn,
        width=W, height=H, interpret=True, **kw)
    ref = brute_force_mt(scene, np.asarray(rb.orig), np.asarray(rb.dirn),
                         np.asarray(rb.tmin), np.asarray(rb.tmax))
    return np.asarray(tri), np.asarray(t), np.asarray(u), np.asarray(v), ref


@pytest.mark.parametrize("ez_chunk,unroll", [(8, 4), (0, 2), (4, 1)])
@pytest.mark.parametrize("prep", ["v0", "fast"])
def test_binraster_matches_brute_force(ez_chunk, unroll, prep):
    tri, t, u, v, ref = _frame(
        64, 64, (0.0, 0.0, 4.0), (0.0, 0.0, -1.0), 300, 7,
        ez_chunk=ez_chunk, unroll=unroll, prep=prep)
    np.testing.assert_array_equal(tri, ref.tri)
    hit = ref.tri >= 0
    assert hit.sum() > 100
    np.testing.assert_allclose(t[hit], ref.t[hit], rtol=1e-5, atol=1e-6)
    # Barycentrics: same MT values modulo accumulation-order rounding in
    # the brute-force reference (hit selection above is already exact).
    np.testing.assert_allclose(u[hit], ref.u[hit], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(v[hit], ref.v[hit], rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("prep", ["v0", "fast"])
def test_binraster_camera_inside_soup(prep):
    # Near-plane crossers + behind-camera culls: the conservative
    # full-screen fallback (v0) / global tier (fast) and the cull test
    # are both exercised here.
    tri, t, u, v, ref = _frame(
        64, 64, (0.0, 0.0, 0.2), (0.0, 0.0, -1.0), 800, 3, prep=prep)
    np.testing.assert_array_equal(tri, ref.tri)


def test_binraster_nonsquare_offaxis():
    tri, t, u, v, ref = _frame(
        128, 64, (1.0, 1.0, 1.0), (-1.0, -1.0, -1.0), 1000, 5)
    np.testing.assert_array_equal(tri, ref.tri)


def test_binraster_fast_tiny_kslots_forces_global_tier():
    # k_slots=1 pushes every multi-bin triangle into the global z-sorted
    # prefix; the image must still be brute-force exact.
    tri, t, u, v, ref = _frame(
        64, 64, (0.0, 0.0, 4.0), (0.0, 0.0, -1.0), 500, 11,
        prep="fast", k_slots=1)
    np.testing.assert_array_equal(tri, ref.tri)


def test_binraster_fast_no_payload_matches():
    tri, t, u, v, ref = _frame(
        64, 64, (0.0, 0.0, 4.0), (0.0, 0.0, -1.0), 400, 13,
        prep="fast", payload=False)
    np.testing.assert_array_equal(tri, ref.tri)


def test_binraster_fast_overflow_poisons():
    # Forcing undersized static buckets must poison hits (-2), never
    # silently drop triangles (binraster_prep_fast's ok contract).
    # p_max=24 (a TPB multiple) < one pair per triangle (300 tris):
    # guaranteed overflow. (96 used to overflow only via the unclamped
    # near-plane clip's inflated bboxes; the round-4 conservative clamp
    # shrank those.)
    tri, *_ = _frame(
        64, 64, (0.0, 0.0, 4.0), (0.0, 0.0, -1.0), 300, 7,
        prep="fast", p_max=24)
    assert (np.asarray(tri) == -2).all()


def test_renderer_binraster_engine_matches_stack2():
    # engine="binraster" plugs the screen-space primary engine into the
    # renderer (secondary passes keep the BVH tracer); the rendered frame
    # must be pixel-identical to the reference stack2 path.
    from ntrace_tpu.core import BuildConfig, RenderConfig
    from ntrace_tpu.render.renderer import render_frame
    from ntrace_tpu.scenes import default_camera, get_scene

    scene = get_scene("conference", n_tris=2000)
    cam = default_camera("conference")
    bc = BuildConfig(builder="binned_sah")
    a = render_frame(scene, cam, build_cfg=bc, cfg=RenderConfig(
        width=64, height=64, mode="primary", engine="binraster")).image
    b = render_frame(scene, cam, build_cfg=bc, cfg=RenderConfig(
        width=64, height=64, mode="primary", engine="stack2")).image
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_binraster_fast_walked_global_tier():
    # k_slots=2, k2_slots=4 on a 4x4-bin grid: triangles covering >4 bins
    # (the soup's larger tris seen up close) overflow BOTH sorted tiers
    # and land in the walked-global z-prefix; image must stay exact.
    tri, t, u, v, ref = _frame(
        128, 128, (0.0, 0.0, 0.6), (0.0, 0.0, -1.0), 400, 17,
        prep="fast", k_slots=2, k2_slots=4)
    np.testing.assert_array_equal(tri, ref.tri)
