"""Occlusion-aware builder + video export."""

import os

import numpy as np
import pytest

from ntrace_tpu.bvh.flatten import flatten_bvh
from ntrace_tpu.bvh.golden import brute_force_mt
from ntrace_tpu.bvh.occlusion import build_occlusion_bvh, occlusion_weights
from ntrace_tpu.core import BuildConfig, Camera, RenderConfig
from ntrace_tpu.scenes import default_camera, get_scene, make_random_soup
from ntrace_tpu.trace.cpu import trace_cpu_golden
from tests.conftest import random_rays
from tests.test_bvh import assert_hits_match_brute


class TestOcclusionBuilder:
    def test_weights_prefer_near_facing(self):
        scene = get_scene("conference", n_tris=3000)
        cam = default_camera("conference")
        w = occlusion_weights(scene, cam)
        assert w.shape == (scene.num_tris,) and (w > 0).all()
        cent = scene.tri_verts().mean(axis=1)
        d2 = ((cent - cam.position) ** 2).sum(axis=1)
        near = w[d2 < np.percentile(d2, 10)].mean()
        far = w[d2 > np.percentile(d2, 90)].mean()
        assert near > far, "near geometry must weigh more"

    def test_traversal_matches_brute(self, rng):
        scene = make_random_soup(n_tris=2000, seed=31)
        cam = Camera(position=[0, 0, 20], forward=[0, 0, -1])
        bvh = build_occlusion_bvh(scene, cam)
        bvh.validate(scene.num_tris)
        flat = flatten_bvh(bvh, scene)
        o, d, tmin, tmax = random_rays(rng, 1000)
        rec = trace_cpu_golden(flat, o, d, tmin, tmax)
        brute = brute_force_mt(scene, o, d, tmin, tmax)
        assert_hits_match_brute(rec, brute)

    def test_uniform_weights_recover_standard_sah(self):
        from ntrace_tpu.bvh.occlusion import _OcclusionBuilder
        from ntrace_tpu.bvh.sbvh import build_sbvh

        scene = make_random_soup(n_tris=1500, seed=7)
        cfg = BuildConfig(builder="binned_sah")
        std = build_sbvh(scene, cfg)
        b = _OcclusionBuilder(scene, cfg, np.ones(scene.num_tris, np.float32))
        b.build(np.arange(scene.num_tris, dtype=np.int64), 0)
        # Same topology class: identical node count and SAH cost.
        assert len(b.child_rows) == std.num_inner


class TestVideo:
    def test_orbit_gif(self, tmp_path):
        from ntrace_tpu.io.video import export_video, orbit_path
        from ntrace_tpu.render.renderer import Renderer

        scene = get_scene("conference", n_tris=2000)
        r = Renderer(scene, BuildConfig(builder="lbvh"),
                     RenderConfig(width=32, height=24))
        lo, hi = scene.bbox()
        cams = orbit_path((lo + hi) / 2, radius=6.0, height=5.0, n_frames=3)
        out = tmp_path / "orbit.gif"
        stats = export_video(r, cams, str(out), fps=4)
        assert out.exists() and out.stat().st_size > 300
        assert len(stats) == 3

    def test_lerp_path(self):
        from ntrace_tpu.io.video import lerp_path

        a = Camera(position=[0, 0, 0], forward=[0, 0, -1], fov_deg=40)
        b = Camera(position=[2, 0, 0], forward=[1, 0, 0], fov_deg=80)
        cams = lerp_path(a, b, 3)
        np.testing.assert_allclose(cams[1].position, [1, 0, 0])
        assert abs(cams[1].fov_deg - 60) < 1e-5


def test_occlusion_frustum_downweights_out_of_view():
    from ntrace_tpu.bvh.occlusion import occlusion_weights
    from ntrace_tpu.core import Camera
    from ntrace_tpu.scenes import make_random_soup

    scene = make_random_soup(n_tris=500, seed=7)
    cam = Camera(position=[0, 0, 40], forward=[0, 0, -1], fov_deg=30.0)
    w_plain = occlusion_weights(scene, cam)
    w_frust = occlusion_weights(scene, cam, aspect=1.0)
    assert w_plain.shape == w_frust.shape == (500,)
    # A narrow frustum over a centered soup must cut some weights.
    assert (w_frust > 0).all() and not np.allclose(w_plain, w_frust)


class TestCompactRays:
    """Between-pass live-ray compaction (_compact_trace) is pixel-exact.

    The reference's kepler_dynamic_fetch capability (SURVEY.md SS3.3):
    terminated rays must not occupy traversal lanes. The TPU analogue
    truncates the Morton-sorted batch (dead rays at the end) to a
    padded live prefix; these tests pin that the truncation + result
    re-padding is invisible in the image for every secondary-ray mode.
    """

    @pytest.mark.parametrize("mode", ["ao", "diffuse", "path"])
    def test_pixel_identical(self, mode):
        from ntrace_tpu.render import render_frame

        scene = get_scene("conference", n_tris=3000)
        frames = {}
        for compact in ("off", "on"):
            cfg = RenderConfig(width=128, height=72, mode=mode, samples=2,
                               seed=3, bounces=2, compact_rays=compact)
            frames[compact] = render_frame(
                scene, cfg=cfg, build_cfg=BuildConfig(builder="median"))
        np.testing.assert_array_equal(frames["off"].image,
                                      frames["on"].image)

    def test_prefix_actually_truncates(self):
        from ntrace_tpu.ray.raybatch import RayBatch
        from ntrace_tpu.render.renderer import _compact_trace
        import jax.numpy as jnp

        n, live = 20000, 5000
        calls = {}

        def tracer(o, d, tn, tx, any_hit):
            calls["n"] = o.shape[0]
            r = o.shape[0]
            return (jnp.full((r,), 2, jnp.int32), jnp.ones((r,), jnp.float32),
                    jnp.zeros((r,), jnp.float32), jnp.zeros((r,), jnp.float32))

        tmax = jnp.where(jnp.arange(n) < live, 1.0, 0.0).astype(jnp.float32)
        b = RayBatch(jnp.zeros((n, 3)), jnp.ones((n, 3)),
                     jnp.zeros((n,)), tmax, jnp.arange(n, dtype=jnp.int32))
        tri, t, u, v = _compact_trace(tracer, b, 1 << 20, False, compact="on")
        assert calls["n"] == 8192  # next pow2 of 5000, floored at 8192
        assert tri.shape == (n,)
        assert (np.asarray(tri[:8192]) == 2).all()
        assert (np.asarray(tri[8192:]) == -1).all()


class TestTunedDispatch:
    """Auto-dispatch tuning plumbing (render/renderer.py _load_tuned +
    scripts/pick_tuned.py): device-measured winner drives `auto`."""

    def test_load_tuned_env_and_disable(self, tmp_path, monkeypatch):
        from ntrace_tpu.render.renderer import _load_tuned

        p = tmp_path / "tuned.json"
        p.write_text('{"engine": "packet_bdl", "packet_rows": 32}')
        monkeypatch.setenv("NTRACE_TUNED", str(p))
        assert _load_tuned() == {"engine": "packet_bdl", "packet_rows": 32}
        monkeypatch.setenv("NTRACE_TUNED", "0")
        assert _load_tuned() == {}
        monkeypatch.setenv("NTRACE_TUNED", str(tmp_path / "absent.json"))
        assert _load_tuned() == {}

    def test_pick_tuned_selects_fastest(self, tmp_path):
        import json
        import shutil
        import subprocess
        import sys

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        work = tmp_path / "repo"
        (work / "scripts").mkdir(parents=True)
        shutil.copy(os.path.join(root, "scripts", "pick_tuned.py"),
                    work / "scripts" / "pick_tuned.py")
        results = {
            "reduce_sum_ns_per_iter": 8.1,                      # ignored
            "packet16_base": {"mrays": 40.0},
            "packet16_bothbc": {"mrays": 44.0},
            "packet_bfs8": {"mrays": 39.0},
            "packet_dleaf32_dm32": {"mrays": 61.0},
            "packet_bdl32_dm32": {"mrays": 95.5},
            "lbvh_packed_ml8": {"wall1_ms": 60.0},              # ignored
        }
        (work / "results_r3b_sweep.json").write_text(json.dumps(results))
        out = subprocess.run(
            [sys.executable, str(work / "scripts" / "pick_tuned.py")],
            capture_output=True, text=True, check=True)
        tuned = json.loads((work / "tuned.json").read_text())
        assert tuned["engine"] == "packet_bdl"
        assert tuned["packet_rows"] == 32
        assert tuned["source_key"] == "packet_bdl32_dm32"
        assert tuned["drain_min"] == 32
        # knob variants map to the base engine WITH their flags
        results["packet16_bothbc"]["mrays"] = 200.0
        (work / "results_r3b_sweep.json").write_text(json.dumps(results))
        subprocess.run(
            [sys.executable, str(work / "scripts" / "pick_tuned.py")],
            capture_output=True, text=True, check=True)
        tuned = json.loads((work / "tuned.json").read_text())
        assert tuned == {"engine": "packet", "packet_rows": 16,
                         "mrays": 200.0, "source_key": "packet16_bothbc",
                         "leafbc": True, "slabbc": True}
        # grouped-queue variants carry qgroup (+ merge_sibs from _ms)
        results["packet_bdl16_qg4_ms"] = {"mrays": 250.0}
        (work / "results_r3b_sweep.json").write_text(json.dumps(results))
        subprocess.run(
            [sys.executable, str(work / "scripts" / "pick_tuned.py")],
            capture_output=True, text=True, check=True)
        tuned = json.loads((work / "tuned.json").read_text())
        assert tuned["engine"] == "packet_bdl"
        assert tuned["qgroup"] == 4
        assert tuned["merge_sibs"] is True
        assert tuned["packet_rows"] == 16

    def test_tuned_engine_on_direct_path(self, tmp_path, monkeypatch):
        """auto + builder=lbvh on the packed-direct path must honour the
        tuned batch-family engine (direct tables are nodes_per_row=1) and
        stay pixel-identical to the base packet kernel."""
        from ntrace_tpu.core import BuildConfig, RenderConfig
        from ntrace_tpu.render.renderer import Renderer
        from ntrace_tpu.scenes import default_camera, get_scene

        p = tmp_path / "tuned.json"
        p.write_text('{"engine": "packet_bdl", "packet_rows": 16}')
        monkeypatch.setenv("NTRACE_DIRECT", "1")
        scene = get_scene("conference@4000")
        cam = default_camera("conference")
        bc = BuildConfig(builder="lbvh", max_leaf_size=32)
        cfg = RenderConfig(width=64, height=48, mode="primary",
                           engine="auto")

        monkeypatch.setenv("NTRACE_TUNED", str(p))
        r = Renderer(scene, bc, cfg)
        assert r._direct and r.engine == "packet_bdl" and r.tuned_rows == 16
        img = np.asarray(r.render(cam).image)

        monkeypatch.setenv("NTRACE_TUNED", "0")
        r2 = Renderer(scene, bc, cfg)
        assert r2._direct and r2.engine == "packet"
        np.testing.assert_array_equal(img, np.asarray(r2.render(cam).image))
