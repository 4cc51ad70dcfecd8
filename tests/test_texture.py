"""UV parsing, atlas building/sampling, textured render mode."""

import numpy as np
import pytest

from ntrace_tpu.core import BuildConfig, Material, RenderConfig, Scene
from ntrace_tpu.io.obj import load_obj
from ntrace_tpu.render.texture import build_atlas, interpolate_uv, sample_atlas

OBJ_UV = """mtllib t.mtl
v 0 0 0
v 1 0 0
v 0 1 0
vt 0 0
vt 1 0
vt 0 1
usemtl tex
f 1/1 2/2 3/3
"""
MTL_UV = """newmtl tex
Kd 1 1 1
map_Kd checker.png
"""


@pytest.fixture
def tex_obj(tmp_path):
    from PIL import Image

    # 2x2 checker: (0,0) black, (1,0) white, (0,1) white, (1,1) black
    arr = np.zeros((2, 2, 3), np.uint8)
    arr[0, 1] = arr[1, 0] = 255
    Image.fromarray(arr).save(tmp_path / "checker.png")
    (tmp_path / "t.mtl").write_text(MTL_UV)
    p = tmp_path / "t.obj"
    p.write_text(OBJ_UV)
    return p


def test_uv_parsing(tex_obj):
    s = load_obj(tex_obj, prefer_native=False)
    assert s.uvs is not None and s.uvs.shape == (1, 3, 2)
    np.testing.assert_allclose(s.uvs[0], [[0, 0], [1, 0], [0, 1]])
    assert s.materials[s.mat_ids[0]].texture.endswith("checker.png")


def test_atlas_build_and_sample(tex_obj):
    import jax.numpy as jnp

    s = load_obj(tex_obj, prefer_native=False)
    atlas = jnp.asarray(build_atlas(s.materials, size=4))
    assert atlas.shape == (len(s.materials), 4, 4, 3)
    # Sample the checker corners: uv (0,0) is bottom-left -> image row S-1.
    mat = jnp.asarray([1, 1], dtype=jnp.int32)
    uv = jnp.asarray([[0.1, 0.1], [0.6, 0.1]], jnp.float32)
    got = np.asarray(sample_atlas(atlas, mat, uv))
    assert got[0].mean() != got[1].mean()  # crosses the checker boundary


def test_interpolate_uv():
    import jax.numpy as jnp

    uvs = jnp.asarray(np.array([[[0, 0], [1, 0], [0, 1]]], np.float32))
    tri = jnp.asarray([0], jnp.int32)
    u = jnp.asarray([0.25], jnp.float32)
    v = jnp.asarray([0.5], jnp.float32)
    out = np.asarray(interpolate_uv(uvs, tri, u, v))
    np.testing.assert_allclose(out[0], [0.25, 0.5], atol=1e-6)


def test_textured_render_mode(tex_obj):
    from ntrace_tpu.render import render_frame
    from ntrace_tpu.core import Camera

    s = load_obj(tex_obj, prefer_native=False)
    cam = Camera(position=[0.3, 0.3, 1.5], forward=[0, 0, -1])
    res = render_frame(s, camera=cam,
                       cfg=RenderConfig(width=32, height=24, mode="textured"))
    assert np.isfinite(res.image).all()
    assert res.image.max() > 0.05


def test_textured_mode_flat_scene_without_uvs():
    """Scenes without UVs shade with flat material color tiles."""
    from ntrace_tpu.render import render_frame
    from ntrace_tpu.scenes import get_scene

    scene = get_scene("conference", n_tris=2000)
    res = render_frame(scene, cfg=RenderConfig(width=32, height=24, mode="textured"))
    assert np.isfinite(res.image).all()
    assert res.image.max() > 0.05
