"""State dump round-trip + camera signature stability."""

import numpy as np

from ntrace_tpu.core import BuildConfig, Camera, RenderConfig
from ntrace_tpu.utils.state import load_state, save_state


def test_state_roundtrip(tmp_path):
    cam = Camera(position=[1.5, 2.0, -3.0], forward=[0.1, -0.2, 1.0], fov_deg=55)
    rcfg = RenderConfig(width=320, height=200, mode="ao", samples=7,
                        ao_radius=2.5, light=(1.0, 2.0, 3.0))
    bcfg = BuildConfig(builder="sbvh", max_leaf_size=6)
    p = tmp_path / "state.json"
    save_state(p, cam, rcfg, bcfg, extra={"note": "x"})
    cam2, rcfg2, bcfg2, extra = load_state(p)
    np.testing.assert_allclose(cam2.position, cam.position)
    np.testing.assert_allclose(cam2.forward, cam.forward, atol=1e-6)
    assert rcfg2 == rcfg
    assert bcfg2 == bcfg
    assert extra["note"] == "x"


def test_signature_is_stable_across_roundtrips():
    cam = Camera(position=[9.9, -0.1, 4.2], forward=[-1, 0.25, 0.5])
    sig = cam.encode_signature()
    for _ in range(3):
        cam = Camera.decode_signature(sig)
        assert cam.encode_signature() == sig
