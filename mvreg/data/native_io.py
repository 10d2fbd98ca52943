"""ctypes bindings for the native host-side IO/preprocessing library.

Native counterpart of the reference's C++ host data path (SURVEY.md
§2.3: Open3D PLY IO, ME quantize, DataLoader C workers). Falls back to
the pure-numpy implementations in mvreg.data.threedmatch when the shared
library is absent; `native_available()` reports which path is active.

Build the library once per machine: `native/build.sh`.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libmvreg_native.so",
)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
        if os.path.exists(build):
            import subprocess

            subprocess.run([build], check=False, capture_output=True)
    if os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ply_read_xyz.restype = ctypes.c_long
        lib.ply_read_xyz.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.voxel_subsample.restype = ctypes.c_long
        lib.voxel_subsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.random_subsample.restype = ctypes.c_long
        lib.random_subsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    else:
        _lib = False
    return _lib


def native_available() -> bool:
    return bool(_load())


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_ply(path: str, max_points: int = 4_000_000) -> np.ndarray:
    """PLY vertices -> (N, 3) float32 via the native parser (or fallback)."""
    lib = _load()
    if not lib:
        from mvreg.data.threedmatch import read_ply as np_read_ply

        return np_read_ply(path)
    out = np.empty((max_points, 3), np.float32)
    n = lib.ply_read_xyz(path.encode(), _fptr(out), max_points)
    if n < 0:
        from mvreg.data.threedmatch import read_ply as np_read_ply

        return np_read_ply(path)
    return out[:n].copy()


def voxel_subsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """First-point-per-voxel decimation (host-side quantize)."""
    pts = np.ascontiguousarray(points, np.float32)
    lib = _load()
    if not lib:
        coords = np.floor(pts / voxel_size).astype(np.int64)
        _, idx = np.unique(coords, axis=0, return_index=True)
        return pts[np.sort(idx)]
    out = np.empty_like(pts)
    m = lib.voxel_subsample(
        _fptr(pts), len(pts), ctypes.c_float(voxel_size), _fptr(out), len(pts)
    )
    if m < 0:
        raise MemoryError("native voxel_subsample failed")
    return out[:m].copy()


def random_subsample(
    points: np.ndarray, target: int, seed: int = 0
) -> np.ndarray:
    """Deterministic uniform subsample to at most `target` points."""
    pts = np.ascontiguousarray(points, np.float32)
    lib = _load()
    if not lib:
        if len(pts) <= target:
            return pts
        rng = np.random.default_rng(seed)
        return pts[rng.choice(len(pts), target, replace=False)]
    out = np.empty((min(target, len(pts)), 3), np.float32)
    m = lib.random_subsample(
        _fptr(pts), len(pts), target, ctypes.c_uint64(seed), _fptr(out)
    )
    if m < 0:
        raise MemoryError("native random_subsample failed")
    return out[:m]
