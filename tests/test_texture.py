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


class TestFiltering:
    def _ramp_atlas(self):
        """One material whose base level is a horizontal ramp 0..1."""
        import numpy as np

        from ntrace_tpu.render import texture as tex

        class M:
            texture = ""
            diffuse = (0.0, 0.0, 0.0)

        flat, offs, sides = tex.build_mip_atlas([M()], size=8)
        s = sides[0]
        base = np.zeros((s, s, 3), np.float32)
        base[:, :, 0] = (np.arange(s, dtype=np.float32) / s)[None, :]
        flat = flat.copy()
        flat[0, offs[0]:offs[0] + s * s] = base.reshape(-1, 3)
        # rebuild coarser levels from the ramp
        lvl = base
        for k in range(1, len(sides)):
            lvl = lvl.reshape(lvl.shape[0] // 2, 2, lvl.shape[1] // 2, 2,
                              3).mean(axis=(1, 3))
            sk = sides[k]
            flat[0, offs[k]:offs[k] + sk * sk] = lvl.reshape(-1, 3)
        return flat, offs, sides

    def test_bilinear_interpolates_between_texels(self):
        import jax.numpy as jnp
        import numpy as np

        from ntrace_tpu.render import texture as tex

        flat, offs, sides = self._ramp_atlas()
        s = sides[0]
        mats = jnp.zeros((3,), jnp.int32)
        # u at texel centers 1 and 2, and exactly between them.
        uc = (np.array([1.0, 2.0, 1.5], np.float32) + 0.5) / s
        uv = jnp.stack([jnp.asarray(uc), jnp.full((3,), 0.5)], axis=1)
        out = np.asarray(tex.sample_atlas_bilinear(
            jnp.asarray(flat), offs, sides, mats, uv))
        assert abs(out[0, 0] - 1.0 / s) < 1e-6
        assert abs(out[1, 0] - 2.0 / s) < 1e-6
        # midpoint = average of the two texels
        assert abs(out[2, 0] - 1.5 / s) < 1e-6

    def test_trilinear_selects_mip_level(self):
        import jax.numpy as jnp
        import numpy as np

        from ntrace_tpu.render import texture as tex

        flat, offs, sides = self._ramp_atlas()
        mats = jnp.zeros((2,), jnp.int32)
        # Off-center u: a linear ramp's center equals its mean, so sample
        # at u=0.25 where base level (~0.19) != 1x1 top level (0.4375).
        uv = jnp.stack([jnp.full((2,), 0.25), jnp.full((2,), 0.5)], axis=1)
        out = np.asarray(tex.sample_atlas_trilinear(
            jnp.asarray(flat), offs, sides, mats, uv,
            jnp.asarray([0.0, float(len(sides) - 1)], jnp.float32)))
        top = flat[0, offs[-1]]
        assert abs(out[1, 0] - top[0]) < 1e-6   # max lod == 1x1 level
        assert abs(out[0, 0] - out[1, 0]) > 0.05  # base != global mean

    def test_textured_render_filters(self, tex_obj):
        """All three filters render; trilinear==bilinear near lod 0 class
        scenes and both differ from garbage (smoke-level)."""
        from ntrace_tpu.core import BuildConfig, RenderConfig
        from ntrace_tpu.io.obj import load_obj
        from ntrace_tpu.render import render_frame

        scene = load_obj(tex_obj, prefer_native=False)
        for filt in ("nearest", "bilinear", "trilinear"):
            cfg = RenderConfig(width=24, height=18, mode="textured",
                               tex_filter=filt)
            res = render_frame(scene, cfg=cfg,
                               build_cfg=BuildConfig(builder="median"))
            assert np.isfinite(res.image).all() and res.image.max() > 0, filt
