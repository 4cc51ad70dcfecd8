"""Build + ctypes binding for the native OBJ parser.

Lazy g++ compile cached by source hash (the rebuild's CudaCompiler
analogue for host code: ~ framework/gpu/CudaCompiler.cpp compiles kernels
at runtime with an on-disk cache keyed by source+defines). Falls back to
the pure-Python parser when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "objparse.cpp"
_lib = None
_tried = False


def _cache_dir() -> Path:
    d = Path(os.environ.get("NTRACE_CACHE", Path.home() / ".cache" / "ntrace_tpu"))
    d.mkdir(parents=True, exist_ok=True)
    return d


class _ObjData(ctypes.Structure):
    _fields_ = [
        ("positions", ctypes.POINTER(ctypes.c_float)),
        ("n_pos", ctypes.c_int64),
        ("normals", ctypes.POINTER(ctypes.c_float)),
        ("n_norm", ctypes.c_int64),
        ("faces", ctypes.POINTER(ctypes.c_int32)),
        ("face_mat", ctypes.POINTER(ctypes.c_int32)),
        ("n_tris", ctypes.c_int64),
        ("mat_names", ctypes.c_char_p),
        ("mat_names_len", ctypes.c_int64),
        ("error", ctypes.c_char_p),
        ("texcoords", ctypes.POINTER(ctypes.c_float)),
        ("n_vt", ctypes.c_int64),
        ("face_vt", ctypes.POINTER(ctypes.c_int32)),
    ]


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        src = _SRC.read_bytes()
        key = hashlib.sha1(src + b"v1").hexdigest()[:16]
        so = _cache_dir() / f"libobjparse_{key}.so"
        if not so.exists():
            tmp = so.with_suffix(".tmp.so")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(tmp)],
                check=True, capture_output=True, timeout=300,
            )
            os.replace(tmp, so)
        lib = ctypes.CDLL(str(so))
        lib.obj_parse.restype = ctypes.POINTER(_ObjData)
        lib.obj_parse.argtypes = [ctypes.c_char_p]
        lib.obj_free.restype = None
        lib.obj_free.argtypes = [ctypes.POINTER(_ObjData)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def native_obj_parse(path: str):
    """Parse an OBJ natively. Returns (positions (V,3) f32, normals (N,3)
    f32 | None, faces (M,3) i32, face_mat (M,) i32, mat_names list[str],
    texcoords (T,2) f32 | None, face_vt (M,3) i32 | None) or raises
    RuntimeError."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native parser unavailable")
    ptr = lib.obj_parse(str(path).encode())
    d = ptr.contents
    try:
        if d.error:
            raise RuntimeError(f"objparse: {d.error.decode()}")
        np_pos = np.ctypeslib.as_array(d.positions, shape=(max(d.n_pos, 1), 3)).copy()
        np_nrm = (
            np.ctypeslib.as_array(d.normals, shape=(d.n_norm, 3)).copy()
            if d.n_norm else None
        )
        np_faces = np.ctypeslib.as_array(d.faces, shape=(max(d.n_tris, 1), 3)).copy()
        np_mat = np.ctypeslib.as_array(d.face_mat, shape=(max(d.n_tris, 1),)).copy()
        names = d.mat_names.decode().split("\n") if d.mat_names_len else ["default"]
        if d.n_tris == 0:
            np_faces = np_faces[:0]
            np_mat = np_mat[:0]
        if d.n_pos == 0:
            np_pos = np_pos[:0]
        np_tc = (
            np.ctypeslib.as_array(d.texcoords, shape=(d.n_vt, 2)).copy()
            if d.n_vt else None
        )
        np_fvt = (
            np.ctypeslib.as_array(d.face_vt, shape=(max(d.n_tris, 1), 3)).copy()[: d.n_tris]
            if d.n_vt else None
        )
        return (np_pos[: d.n_pos], np_nrm, np_faces[: d.n_tris],
                np_mat[: d.n_tris], names, np_tc, np_fvt)
    finally:
        lib.obj_free(ptr)
