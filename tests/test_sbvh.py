"""SBVH / binned-SAH builder: quality + correctness under ref duplication."""

import numpy as np
import pytest

from ntrace_tpu.bvh.flatten import flatten_bvh
from ntrace_tpu.bvh.golden import brute_force_mt
from ntrace_tpu.bvh.median import build_median_bvh
from ntrace_tpu.bvh.sbvh import build_sbvh
from ntrace_tpu.core import BuildConfig, Scene
from ntrace_tpu.scenes import get_scene, make_random_soup
from ntrace_tpu.trace.cpu import trace_cpu_golden
from tests.conftest import random_rays
from tests.test_bvh import assert_hits_match_brute


@pytest.mark.parametrize("builder", ["binned_sah", "sbvh"])
class TestQualityBuilders:
    def test_traversal_matches_brute(self, rng, builder):
        scene = make_random_soup(n_tris=3000, seed=21)
        cfg = BuildConfig(builder=builder)
        bvh = build_sbvh(scene, cfg)
        bvh.validate(scene.num_tris)
        flat = flatten_bvh(bvh, scene)
        o, d, tmin, tmax = random_rays(rng, 1500)
        rec = trace_cpu_golden(flat, o, d, tmin, tmax)
        brute = brute_force_mt(scene, o, d, tmin, tmax)
        assert_hits_match_brute(rec, brute)

    def test_structured_scene(self, rng, builder):
        scene = get_scene("conference", n_tris=6000)
        bvh = build_sbvh(scene, BuildConfig(builder=builder))
        flat = flatten_bvh(bvh, scene)
        o, d, tmin, tmax = random_rays(rng, 800, extent=9.0)
        rec = trace_cpu_golden(flat, o, d, tmin, tmax)
        brute = brute_force_mt(scene, o, d, tmin, tmax)
        assert_hits_match_brute(rec, brute)


class TestQuality:
    def test_sah_beats_median(self):
        """SAH tree cost must be clearly below the median split's."""
        scene = get_scene("conference", n_tris=8000)
        cfg = BuildConfig(builder="binned_sah")
        sah = build_sbvh(scene, cfg).sah_cost()
        med = build_median_bvh(scene, cfg).sah_cost()
        assert sah < med * 0.9, f"sah={sah:.1f} median={med:.1f}"

    def test_spatial_splits_duplicate_refs_on_long_diagonals(self):
        """A scene of long diagonal slivers crossing a dense cluster should
        trigger spatial splits (tri_order grows beyond num_tris)."""
        rng = np.random.default_rng(5)
        # Dense cluster.
        c = rng.uniform(-1, 1, size=(500, 1, 3))
        off = rng.normal(scale=0.1, size=(500, 3, 3))
        v1 = (c + off).astype(np.float32).reshape(-1, 3)
        # Long diagonals through it.
        a = rng.uniform(-10, -8, size=(60, 3))
        b = rng.uniform(8, 10, size=(60, 3))
        mid = (a + b) / 2 + rng.normal(scale=0.05, size=(60, 3))
        v2 = np.stack([a, b, mid], axis=1).astype(np.float32).reshape(-1, 3)
        v = np.concatenate([v1, v2])
        t = np.arange(v.shape[0], dtype=np.int32).reshape(-1, 3)
        scene = Scene(v, t, name="slivers")
        cfg = BuildConfig(builder="sbvh", sbvh_alpha=1e-6)
        bvh = build_sbvh(scene, cfg)
        bvh.validate(scene.num_tris)
        assert bvh.tri_order.shape[0] > scene.num_tris, "no refs duplicated"
        # Correctness under duplication:
        flat = flatten_bvh(bvh, scene)
        rng2 = np.random.default_rng(6)
        o, d, tmin, tmax = random_rays(rng2, 1000, extent=11.0)
        rec = trace_cpu_golden(flat, o, d, tmin, tmax)
        brute = brute_force_mt(scene, o, d, tmin, tmax)
        # Extreme slivers: Woop f32 t error grows with aspect ratio.
        assert_hits_match_brute(rec, brute, t_rtol=3e-3)

    def test_sbvh_quality_on_slivers(self):
        """Spatial splits should not be worse than plain SAH on slivers."""
        scene = get_scene("hairball", n_tris=20000)
        sbvh = build_sbvh(scene, BuildConfig(builder="sbvh")).sah_cost()
        plain = build_sbvh(scene, BuildConfig(builder="binned_sah")).sah_cost()
        assert sbvh <= plain * 1.05, f"sbvh={sbvh:.1f} plain={plain:.1f}"


def test_unsplitting_reduces_duplication(soup_medium):
    """Stich 2009 reference unsplitting: never MORE refs, same hits."""
    from ntrace_tpu.bvh.flatten import flatten_bvh
    from ntrace_tpu.bvh.golden import brute_force_mt
    from ntrace_tpu.trace.cpu import trace_cpu_golden
    from conftest import random_rays

    cfg_on = BuildConfig(builder="sbvh", sbvh_alpha=1e-2)
    cfg_off = BuildConfig(builder="sbvh", sbvh_alpha=1e-2,
                          sbvh_unsplit=False)
    b_on = build_sbvh(soup_medium, cfg_on)
    b_off = build_sbvh(soup_medium, cfg_off)
    refs_on = len(b_on.tri_order)
    refs_off = len(b_off.tri_order)
    assert refs_on <= refs_off

    flat = flatten_bvh(b_on, soup_medium)
    rng = np.random.default_rng(5)
    o, d, tn, tx = random_rays(rng, 256)
    rec = trace_cpu_golden(flat, o, d, tn, tx)
    ref = brute_force_mt(soup_medium, o, d, tn, tx)
    np.testing.assert_array_equal(rec.tri, ref.tri)


class TestSweepObjectSAH:
    """Full-sweep SAH object splits (reference SplitBVHBuilder behavior)
    vs the binned default: the round-2 'within ~1%' claim, measured."""

    def test_sweep_quality_vs_binned(self):
        for seed in (3, 17, 41):
            scene = make_random_soup(n_tris=2500, seed=seed)
            cb = build_sbvh(scene, BuildConfig(builder="binned_sah"))
            cs = build_sbvh(scene, BuildConfig(builder="binned_sah",
                                               object_sweep=True))
            sb, ss = cb.sah_cost(), cs.sah_cost()
            # Exact sweep must not be materially worse than binned...
            assert ss <= sb * 1.02, (seed, sb, ss)
            # ...and 32-bin SAH must sit within a few % of exact.
            assert sb <= ss * 1.05, (seed, sb, ss)

    def test_sweep_traversal_matches_brute(self, rng):
        from ntrace_tpu.bvh.flatten import flatten_bvh
        from ntrace_tpu.bvh.golden import brute_force_mt
        from ntrace_tpu.trace.cpu import trace_cpu_golden
        from tests.conftest import random_rays
        from tests.test_bvh import assert_hits_match_brute

        scene = make_random_soup(n_tris=1500, seed=9)
        bvh = build_sbvh(scene, BuildConfig(builder="sbvh",
                                            object_sweep=True))
        bvh.validate(scene.num_tris)
        flat = flatten_bvh(bvh, scene)
        o, d, tn, tx = random_rays(rng, 800)
        rec = trace_cpu_golden(flat, o, d, tn, tx)
        assert_hits_match_brute(rec, brute_force_mt(scene, o, d, tn, tx))


class TestNativeBuilder:
    """Native C++ builder (native/sbvh.cpp): same algorithm as the Python
    builder; trees must be equally valid, brute-force-exact to traverse,
    and SAH-cost-equivalent (not bit-identical: float accumulation order
    differs in the prefix sweeps)."""

    @pytest.fixture(autouse=True)
    def _force_native(self, monkeypatch):
        from ntrace_tpu.native.sbvh_lib import native_sbvh_available

        if not native_sbvh_available():
            pytest.skip("no native toolchain")
        monkeypatch.setenv("NTRACE_NATIVE_SBVH", "force")

    @pytest.mark.parametrize("builder", ["binned_sah", "sbvh"])
    @pytest.mark.parametrize("sweep", [False, True])
    def test_traversal_matches_brute(self, rng, builder, sweep):
        scene = make_random_soup(n_tris=3000, seed=77)
        cfg = BuildConfig(builder=builder, object_sweep=sweep)
        bvh = build_sbvh(scene, cfg)
        bvh.validate(scene.num_tris)
        flat = flatten_bvh(bvh, scene)
        o, d, tmin, tmax = random_rays(rng, 1200)
        rec = trace_cpu_golden(flat, o, d, tmin, tmax)
        assert_hits_match_brute(rec, brute_force_mt(scene, o, d, tmin, tmax))

    @pytest.mark.parametrize("builder", ["binned_sah", "sbvh"])
    def test_sah_parity_with_python(self, builder, monkeypatch):
        for seed in (5, 23):
            scene = make_random_soup(n_tris=2000, seed=seed)
            cfg = BuildConfig(builder=builder)
            monkeypatch.setenv("NTRACE_NATIVE_SBVH", "0")
            py = build_sbvh(scene, cfg).sah_cost()
            monkeypatch.setenv("NTRACE_NATIVE_SBVH", "force")
            nat = build_sbvh(scene, cfg).sah_cost()
            assert nat <= py * 1.02, (seed, py, nat)
            assert py <= nat * 1.02, (seed, py, nat)

    def test_spatial_duplication_and_structured_scene(self, rng):
        scene = get_scene("conference", n_tris=6000)
        bvh = build_sbvh(scene, BuildConfig(builder="sbvh"))
        bvh.validate(scene.num_tris)
        flat = flatten_bvh(bvh, scene)
        o, d, tmin, tmax = random_rays(rng, 800, extent=9.0)
        rec = trace_cpu_golden(flat, o, d, tmin, tmax)
        assert_hits_match_brute(rec, brute_force_mt(scene, o, d, tmin, tmax))

    def test_impl_tag_cache_key_distinguishes(self, monkeypatch):
        """accel_cache_key must differ between native and Python paths so a
        cached tree is never served across implementations."""
        from ntrace_tpu.utils.cache import accel_cache_key

        scene = make_random_soup(n_tris=64, seed=1)
        cfg = BuildConfig(builder="sbvh")
        monkeypatch.setenv("NTRACE_NATIVE_SBVH", "force")
        k_native = accel_cache_key(scene, cfg)
        monkeypatch.setenv("NTRACE_NATIVE_SBVH", "0")
        k_py = accel_cache_key(scene, cfg)
        assert k_native != k_py
