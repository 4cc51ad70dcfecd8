"""Wavefront OBJ + MTL import with a binary (.npz) cache.

Reference parity (~ framework/io/MeshWavefrontIO.cpp + MeshBinaryIO.cpp,
expected paths; mount empty -- SURVEY.md SS0): the reference parses OBJ+MTL
(positions, normals, texcoords, materials, submeshes) and caches a fast
binary mesh next to the OBJ so 10M-triangle scenes parse once. We parse the
same core subset (v / vn / f with arbitrary polygon fan triangulation and
v//vn / v/vt/vn index forms, negative indices, usemtl/mtllib with Kd/Ks/Ke)
and cache to content-hashed .npz.

A native C++ fast path (ntrace_tpu/native) is used automatically for large
files when the extension builds; this module is the always-available parser.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import numpy as np

from ntrace_tpu.core import Material, Scene


def _parse_mtl(path: Path) -> dict[str, Material]:
    mats: dict[str, Material] = {}
    cur = None
    if not path.exists():
        return mats
    for line in path.read_text(errors="replace").splitlines():
        parts = line.split()
        if not parts or parts[0].startswith("#"):
            continue
        key = parts[0]
        if key == "newmtl":
            cur = Material(name=parts[1] if len(parts) > 1 else "")
            mats[cur.name] = cur
        elif cur is not None and key in ("Kd", "Ks", "Ke") and len(parts) >= 4:
            rgb = tuple(float(x) for x in parts[1:4])
            if key == "Kd":
                cur.diffuse = rgb
            elif key == "Ks":
                cur.specular = rgb
            else:
                cur.emissive = rgb
        elif cur is not None and key == "Ns" and len(parts) >= 2:
            cur.glossiness = float(parts[1])
        elif cur is not None and key == "map_Kd" and len(parts) >= 2:
            cur.texture = str(path.parent / parts[-1])
    return mats


NATIVE_THRESHOLD_BYTES = 1 << 20  # use the C++ parser above 1 MB


def load_obj(path: str | os.PathLike, prefer_native: bool = True) -> Scene:
    """Parse an OBJ file into a Scene (triangulating polygons fan-wise).

    Files above NATIVE_THRESHOLD_BYTES go through the C++ fast path
    (ntrace_tpu/native/objparse.cpp) when the toolchain is available; the
    pure-Python parser is the always-available fallback and the
    correctness reference for the native one.
    """
    path = Path(path)
    if prefer_native and path.stat().st_size > NATIVE_THRESHOLD_BYTES:
        try:
            return _load_obj_native(path)
        except Exception:
            pass  # fall through to the Python parser
    positions: list[list[float]] = []
    normals: list[list[float]] = []
    texcoords: list[list[float]] = []
    faces: list[tuple[int, int, int]] = []
    face_uvs: list[tuple[int, int, int]] = []
    face_mats: list[int] = []
    materials: list[Material] = [Material(name="default")]
    mat_lut: dict[str, int] = {"default": 0}
    cur_mat = 0

    def resolve(idx: int, n: int) -> int:
        return idx - 1 if idx > 0 else n + idx

    with open(path, "r", errors="replace") as f:
        for line in f:
            if not line or line[0] in "#\n":
                continue
            parts = line.split()
            if not parts:
                continue
            key = parts[0]
            if key == "v":
                positions.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif key == "vn":
                normals.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif key == "vt":
                texcoords.append([float(parts[1]),
                                  float(parts[2]) if len(parts) > 2 else 0.0])
            elif key == "f":
                nv = len(positions)
                nt = len(texcoords)
                idx = [resolve(int(p.split("/")[0]), nv) for p in parts[1:]]
                uvi = []
                for p in parts[1:]:
                    bits = p.split("/")
                    uvi.append(resolve(int(bits[1]), nt)
                               if len(bits) > 1 and bits[1] else -1)
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append((idx[0], idx[k], idx[k + 1]))
                    face_uvs.append((uvi[0], uvi[k], uvi[k + 1]))
                    face_mats.append(cur_mat)
            elif key == "usemtl" and len(parts) > 1:
                name = parts[1]
                if name not in mat_lut:
                    mat_lut[name] = len(materials)
                    materials.append(Material(name=name))
                cur_mat = mat_lut[name]
            elif key == "mtllib" and len(parts) > 1:
                for name, mat in _parse_mtl(path.parent / parts[1]).items():
                    if name in mat_lut:
                        materials[mat_lut[name]] = mat
                    else:
                        mat_lut[name] = len(materials)
                        materials.append(mat)

    pos = np.asarray(positions, dtype=np.float32)
    tris = np.asarray(faces, dtype=np.int32)
    nrm = np.asarray(normals, dtype=np.float32) if len(normals) == len(positions) else None
    uvs = None
    if texcoords and face_uvs:
        tc = np.asarray(texcoords, dtype=np.float32)
        fi = np.asarray(face_uvs, dtype=np.int64)
        uvs = np.where(fi[..., None] >= 0, tc[np.maximum(fi, 0)], 0.0)
        uvs = uvs.astype(np.float32)
    return Scene(
        pos, tris, normals=nrm,
        mat_ids=np.asarray(face_mats, dtype=np.int32),
        materials=materials, name=path.stem, uvs=uvs,
    )


def _load_obj_native(path: str | os.PathLike) -> Scene:
    from ntrace_tpu.native import native_obj_parse

    path = Path(path)
    pos, nrm, faces, face_mat, names, texcoords, face_vt = native_obj_parse(path)
    materials = [Material(name=n) for n in names]
    lut = {n: i for i, n in enumerate(names)}
    # mtllib declarations live in the header; scan the first MB only so
    # the native speed win isn't lost to a second full Python pass.
    head = path.open("rb").read(1 << 20).decode(errors="replace")
    for line in head.splitlines():
        parts = line.split()
        if parts and parts[0] == "mtllib" and len(parts) > 1:
            for name, mat in _parse_mtl(path.parent / parts[1]).items():
                if name in lut:
                    materials[lut[name]] = mat
    if nrm is not None and len(nrm) != len(pos):
        nrm = None
    uvs = None
    if texcoords is not None and face_vt is not None and len(texcoords):
        # Same per-corner assembly as the Python parser: absent corners
        # (vt index -1) get uv (0, 0).
        uvs = np.where(face_vt[..., None] >= 0,
                       texcoords[np.maximum(face_vt, 0)],
                       0.0).astype(np.float32)
    return Scene(pos, faces, normals=nrm, mat_ids=face_mat,
                 materials=materials, name=path.stem, uvs=uvs)


def save_obj(scene: Scene, path: str | os.PathLike) -> None:
    """Export a Scene as OBJ (~ framework/io exportMesh capability)."""
    path = Path(path)
    with open(path, "w") as f:
        f.write(f"# ntrace_tpu export: {scene.name}\n")
        for v in scene.positions:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        if scene.normals is not None:
            for v in scene.normals:
                f.write(f"vn {v[0]} {v[1]} {v[2]}\n")
        cur = -1
        for i, tri in enumerate(scene.indices):
            m = int(scene.mat_ids[i])
            if m != cur:
                f.write(f"usemtl {scene.materials[m].name or f'mat{m}'}\n")
                cur = m
            f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")


def _cache_dir() -> Path:
    d = Path(os.environ.get("NTRACE_CACHE", Path.home() / ".cache" / "ntrace_tpu"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def load_scene_cached(path: str | os.PathLike) -> Scene:
    """load_obj with a content-hashed .npz binary cache (~ MeshBinaryIO)."""
    path = Path(path)
    stat = path.stat()
    key = hashlib.sha1(
        f"{path.resolve()}|{stat.st_size}|{stat.st_mtime_ns}|v2".encode()
    ).hexdigest()[:16]
    cache = _cache_dir() / f"mesh_{key}.npz"
    if cache.exists():
        z = np.load(cache, allow_pickle=True)
        mats = [Material(**m) for m in z["materials"].tolist()]
        nrm = z["normals"] if z["normals"].size else None
        uvs = z["uvs"] if "uvs" in z and z["uvs"].size else None
        return Scene(z["positions"], z["indices"], normals=nrm,
                     mat_ids=z["mat_ids"], materials=mats, name=str(z["name"]),
                     uvs=uvs)
    scene = load_obj(path)
    np.savez_compressed(
        cache,
        positions=scene.positions,
        indices=scene.indices,
        normals=scene.normals if scene.normals is not None else np.zeros((0, 3), np.float32),
        mat_ids=scene.mat_ids,
        materials=np.array([vars(m) for m in scene.materials], dtype=object),
        name=scene.name,
        uvs=scene.uvs if scene.uvs is not None else np.zeros((0, 3, 2), np.float32),
    )
    return scene
