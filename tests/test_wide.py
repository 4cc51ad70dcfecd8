"""8-wide BVH table + traversal engine correctness."""

import jax.numpy as jnp
import numpy as np
import pytest

from ntrace_tpu.bvh.flatten import flatten_bvh
from ntrace_tpu.bvh.golden import brute_force_anyhit, brute_force_mt
from ntrace_tpu.bvh.median import build_median_bvh
from ntrace_tpu.bvh.sbvh import build_sbvh
from ntrace_tpu.bvh.wide import build_wide_table
from ntrace_tpu.core import BuildConfig, RenderConfig
from ntrace_tpu.scenes import get_scene, make_random_soup
from ntrace_tpu.trace.wide_jax import trace_wide
from tests.conftest import random_rays
from tests.test_bvh import assert_hits_match_brute


def _trace(flat, o, d, tmin, tmax, any_hit=False, chunk=256):
    wt = build_wide_table(flat)
    r = o.shape[0]
    pad = (-r) % chunk
    if pad:
        o = np.concatenate([o, np.zeros((pad, 3), np.float32)])
        d = np.concatenate([d, np.ones((pad, 3), np.float32)])
        tmin = np.concatenate([tmin, np.zeros((pad,), np.float32)])
        tmax = np.concatenate([tmax, np.zeros((pad,), np.float32)])
    out = trace_wide(jnp.asarray(wt.table), wt.n_node_rows,
                     jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
                     jnp.asarray(tmax), any_hit=any_hit, chunk=chunk)
    return tuple(np.asarray(x)[:r] for x in out)


class TestWideEngine:
    @pytest.mark.parametrize("builder,n_tris,seed", [
        ("median", 500, 7), ("median", 5000, 11), ("binned_sah", 3000, 21),
    ])
    def test_matches_brute_force(self, rng, builder, n_tris, seed):
        scene = make_random_soup(n_tris=n_tris, seed=seed)
        cfg = BuildConfig(builder=builder)
        bvh = build_median_bvh(scene, cfg) if builder == "median" \
            else build_sbvh(scene, cfg)
        flat = flatten_bvh(bvh, scene)
        o, d, tmin, tmax = random_rays(rng, 1200)
        tri, t, u, v = _trace(flat, o, d, tmin, tmax)
        brute = brute_force_mt(scene, o, d, tmin, tmax)
        from ntrace_tpu.bvh.golden import HitRecord

        assert (tri >= 0).mean() > 0.1
        assert_hits_match_brute(HitRecord(tri, t, u, v), brute)

    def test_any_hit(self, soup_small, rng):
        flat = flatten_bvh(build_median_bvh(soup_small), soup_small)
        o, d, tmin, tmax = random_rays(rng, 800)
        tri, *_ = _trace(flat, o, d, tmin, tmax, any_hit=True)
        blocked = brute_force_anyhit(soup_small, o, d, tmin, tmax)
        np.testing.assert_array_equal(tri >= 0, blocked)

    def test_negative_direction_rays_miss_empty_slots(self, rng):
        """Empty child slots (3e38 slabs) must never be descended,
        including for rays with negative/mixed direction signs."""
        scene = make_random_soup(n_tris=97, seed=5)  # odd count -> ragged tree
        flat = flatten_bvh(build_median_bvh(scene), scene)
        o = np.full((64, 3), 20.0, np.float32)
        d = -np.abs(np.random.default_rng(0).normal(size=(64, 3))).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        tmin = np.zeros(64, np.float32)
        tmax = np.full(64, 1e9, np.float32)
        tri, t, u, v = _trace(flat, o, d, tmin, tmax)
        brute = brute_force_mt(scene, o, d, tmin, tmax)
        from ntrace_tpu.bvh.golden import HitRecord

        assert_hits_match_brute(HitRecord(tri, t, u, v), brute)

    def test_renderer_bvh8_matches_stack2(self):
        from ntrace_tpu.render import render_frame

        scene = get_scene("conference", n_tris=4000)
        r8 = render_frame(scene, cfg=RenderConfig(width=48, height=32, engine="bvh8"))
        r2 = render_frame(scene, cfg=RenderConfig(width=48, height=32, engine="stack2"))
        same = (r8.hit_tri == r2.hit_tri).mean()
        assert same > 0.999, f"agreement {same}"  # ties may order differently
        np.testing.assert_allclose(r8.hit_t[r8.hit_tri == r2.hit_tri],
                                   r2.hit_t[r8.hit_tri == r2.hit_tri], rtol=1e-5)
