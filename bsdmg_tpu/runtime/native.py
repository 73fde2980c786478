"""ctypes bindings for the native C++ runtime (native/bsdmg_native.cpp).

The reference's host runtime is native Rust (welding src/cuda/mod.rs:268-296,
OBJ export src/renderer/mod.rs:204); this is the C++ equivalent. Loaded
lazily; built on demand with g++ if the shared object is missing. All
callers fall back to the NumPy implementations when unavailable, and tests
assert both produce identical meshes.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "build" / "libbsdmg_native.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO_PATH.exists()
    except Exception:
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SO_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError:
            return None

        lib.bsdmg_weld.restype = ctypes.c_int64
        lib.bsdmg_weld.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.bsdmg_write_obj.restype = ctypes.c_int32
        lib.bsdmg_write_obj.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def weld_vertices_native(
    positions: np.ndarray, normals: np.ndarray, quantization: float = 1e5
):
    """Native weld; same contract as mesh.weld.weld_vertices. None if no lib."""
    lib = _load()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.float32).reshape(-1, 3)
    normals = np.ascontiguousarray(normals, np.float32).reshape(-1, 3)
    n = positions.shape[0]
    if n == 0:
        return (
            np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.int32),
        )
    out_v = np.empty((n, 3), np.float32)
    out_n = np.empty((n, 3), np.float32)
    out_idx = np.empty(n, np.int32)
    unique = lib.bsdmg_weld(
        _fptr(positions),
        _fptr(normals),
        ctypes.c_int64(n),
        ctypes.c_double(quantization),
        _fptr(out_v),
        _fptr(out_n),
        out_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if unique < 0:
        return None
    return (
        out_v[:unique].copy(),
        out_n[:unique].copy(),
        out_idx.reshape(-1, 3),
    )


def write_obj_native(path, vertices, normals, faces) -> bool:
    lib = _load()
    if lib is None:
        return False
    vertices = np.ascontiguousarray(vertices, np.float32)
    normals = np.ascontiguousarray(normals, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    rc = lib.bsdmg_write_obj(
        str(path).encode(),
        _fptr(vertices),
        _fptr(normals),
        ctypes.c_int64(vertices.shape[0]),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(faces.shape[0]),
    )
    return rc == 0


def read_obj_native(path):
    """Parse an OBJ with the native reader. Returns ``(vertices, normals,
    faces)`` float32/float32/int32 arrays or ``None`` if unavailable/failed.
    Normals are zeros when the file's vn count differs from v (same rule as
    the Python reader)."""
    lib = _load()
    if lib is None:
        return None
    lib.bsdmg_obj_count.restype = ctypes.c_int32
    lib.bsdmg_obj_read.restype = ctypes.c_int32
    nv = ctypes.c_int64()
    nn = ctypes.c_int64()
    nf = ctypes.c_int64()
    pathb = str(path).encode()
    if lib.bsdmg_obj_count(pathb, ctypes.byref(nv), ctypes.byref(nn), ctypes.byref(nf)) != 0:
        return None
    vertices = np.empty((nv.value, 3), np.float32)
    normals = np.empty((max(nn.value, 1), 3), np.float32)
    faces = np.empty((nf.value, 3), np.int32)
    rc = lib.bsdmg_obj_read(
        pathb,
        _fptr(vertices), ctypes.c_int64(nv.value),
        _fptr(normals), ctypes.c_int64(nn.value),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ctypes.c_int64(nf.value),
    )
    if rc != 0:
        return None
    if nn.value != nv.value:
        normals = np.zeros_like(vertices)
    else:
        normals = normals[: nv.value]
    return vertices, normals, faces
