"""Golden-image regression: per-mode frame checksums with fixed seeds.

SURVEY.md SS5: "per-mode (shadow, AO with fixed seed, diffuse with fixed
seed) checksum images committed". Any change to raygen, traversal,
builders, or shading that alters a single pixel flips these hashes --
update them ONLY after verifying renders by eye (tests/README in repo
docs) and note the cause in the commit message.
"""

import numpy as np
import pytest

from ntrace_tpu.core import BuildConfig, RenderConfig
from ntrace_tpu.io.image import checksum
from ntrace_tpu.render import render_frame
from ntrace_tpu.scenes import get_scene

# The five modes under regression. Cross-run determinism and cross-builder
# identity are asserted (robust to backend fma differences); absolute
# per-backend hashes can be pinned once a TPU CI lane exists.
MODES = ["primary", "shadow", "ao", "diffuse", "path"]


@pytest.fixture(scope="module")
def frames():
    scene = get_scene("conference", n_tris=4000)
    out = {}
    for mode in MODES:
        cfg = RenderConfig(width=64, height=48, mode=mode, samples=2,
                           ao_radius=1.5, seed=7)
        out[mode] = render_frame(scene, cfg=cfg,
                                 build_cfg=BuildConfig(builder="median"))
    return out


def test_frames_are_deterministic(frames):
    """Identical config -> bitwise identical frame (seed-stable RNG)."""
    scene = get_scene("conference", n_tris=4000)
    cfg = RenderConfig(width=64, height=48, mode="diffuse", samples=2,
                       ao_radius=1.5, seed=7)
    again = render_frame(scene, cfg=cfg, build_cfg=BuildConfig(builder="median"))
    np.testing.assert_array_equal(frames["diffuse"].image, again.image)


def test_modes_differ_from_each_other(frames):
    sums = {m: checksum(f.image) for m, f in frames.items()}
    assert len(set(sums.values())) == len(sums), f"duplicate frames: {sums}"


def test_builders_pixel_identical(frames):
    """Every builder must produce the same primary frame."""
    scene = get_scene("conference", n_tris=4000)
    cfg = RenderConfig(width=64, height=48, mode="primary")
    base = checksum(frames["primary"].image)
    for builder in ["lbvh", "hlbvh", "binned_sah", "sbvh"]:
        r = render_frame(scene, cfg=cfg, build_cfg=BuildConfig(builder=builder))
        assert checksum(r.image) == base, f"{builder} frame differs"
