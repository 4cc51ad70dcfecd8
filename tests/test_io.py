"""OBJ round-trip + native-vs-Python parser agreement + image IO."""

import numpy as np
import pytest

from ntrace_tpu.io.obj import load_obj, load_scene_cached, save_obj
from ntrace_tpu.io.image import checksum, tonemap, write_png
from ntrace_tpu.scenes import get_scene


OBJ_SAMPLE = """# sample
mtllib sample.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vn 0 0 1
vn 0 0 1
vn 0 0 1
vn 0 0 1
vn 0 0 1
usemtl red
f 1 2 3 4
usemtl blue
f 1//1 2//2 5//5
f -5/1/1 -4/2/2 -1/5/5
"""

MTL_SAMPLE = """newmtl red
Kd 1 0 0
Ke 0.1 0 0
newmtl blue
Kd 0 0 1
Ns 50
"""


@pytest.fixture
def obj_file(tmp_path):
    (tmp_path / "sample.mtl").write_text(MTL_SAMPLE)
    p = tmp_path / "sample.obj"
    p.write_text(OBJ_SAMPLE)
    return p


class TestPythonParser:
    def test_parse_forms(self, obj_file):
        s = load_obj(obj_file, prefer_native=False)
        assert s.num_verts == 5
        # quad fans into 2 tris + 2 single tris = 4
        assert s.num_tris == 4
        np.testing.assert_array_equal(s.indices[0], [0, 1, 2])
        np.testing.assert_array_equal(s.indices[1], [0, 2, 3])
        np.testing.assert_array_equal(s.indices[2], [0, 1, 4])
        # negative indices resolve relative to current vertex count
        np.testing.assert_array_equal(s.indices[3], [0, 1, 4])
        assert s.materials[s.mat_ids[0]].name == "red"
        assert s.materials[s.mat_ids[0]].diffuse == (1.0, 0.0, 0.0)
        assert s.materials[s.mat_ids[2]].name == "blue"
        assert s.materials[s.mat_ids[2]].glossiness == 50

    def test_roundtrip_export(self, tmp_path):
        scene = get_scene("conference", n_tris=2000)
        p = tmp_path / "x.obj"
        save_obj(scene, p)
        back = load_obj(p, prefer_native=False)
        assert back.num_tris == scene.num_tris
        np.testing.assert_allclose(back.positions, scene.positions, rtol=1e-5)
        np.testing.assert_array_equal(back.indices, scene.indices)

    def test_binary_cache(self, obj_file, tmp_path, monkeypatch):
        monkeypatch.setenv("NTRACE_CACHE", str(tmp_path / "cache"))
        a = load_scene_cached(obj_file)
        b = load_scene_cached(obj_file)  # from cache
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.indices, b.indices)
        assert [m.name for m in a.materials] == [m.name for m in b.materials]


class TestNativeParser:
    def test_native_matches_python(self, tmp_path, monkeypatch):
        from ntrace_tpu.native import native_available

        if not native_available():
            pytest.skip("no g++ toolchain")
        scene = get_scene("fairy", n_tris=3000)
        p = tmp_path / "big.obj"
        save_obj(scene, p)
        py = load_obj(p, prefer_native=False)
        from ntrace_tpu.io.obj import _load_obj_native

        nat = _load_obj_native(p)
        np.testing.assert_allclose(nat.positions, py.positions, rtol=1e-5)
        np.testing.assert_array_equal(nat.indices, py.indices)
        np.testing.assert_array_equal(nat.mat_ids, py.mat_ids)

    def test_native_index_forms(self, obj_file):
        from ntrace_tpu.native import native_available

        if not native_available():
            pytest.skip("no g++ toolchain")
        from ntrace_tpu.io.obj import _load_obj_native

        py = load_obj(obj_file, prefer_native=False)
        nat = _load_obj_native(obj_file)
        np.testing.assert_array_equal(nat.indices, py.indices)
        np.testing.assert_array_equal(nat.mat_ids, py.mat_ids)
        assert nat.materials[1].diffuse == (1.0, 0.0, 0.0)


class TestImageIO:
    def test_tonemap_and_png(self, tmp_path):
        img = np.linspace(0, 2, 48).reshape(4, 4, 3).astype(np.float32)
        u8 = tonemap(img)
        assert u8.dtype == np.uint8 and u8.max() == 255
        p = tmp_path / "i.png"
        write_png(p, img)
        from PIL import Image

        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back, u8)

    def test_checksum_stable(self):
        img = np.ones((8, 8, 3), np.float32) * 0.5
        assert checksum(img) == checksum(img.copy())
        assert checksum(img) != checksum(img * 0.9)
