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
        if hasattr(lib, "loader_create"):
            lib.loader_create.restype = ctypes.c_long
            lib.loader_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
                ctypes.c_long, ctypes.c_float, ctypes.c_long,
            ]
            lib.loader_next.restype = ctypes.c_long
            lib.loader_next.argtypes = [
                ctypes.c_long, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.loader_destroy.restype = ctypes.c_long
            lib.loader_destroy.argtypes = [ctypes.c_long]
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


class FragmentLoader:
    """Threaded prefetching PLY fragment loader (native pthread pool).

    The reference overlaps host IO/preprocessing with GPU compute via
    torch DataLoader worker processes (SURVEY.md §2.3); this is the
    native counterpart feeding the TPU: worker threads read + voxel-
    subsample + pad fragments while the device consumes earlier ones.
    Iterate to get (index, (P, 3) float32 points, (P,) bool mask) in
    submission order. Falls back to synchronous numpy when the native
    library is unavailable.
    """

    def __init__(
        self,
        paths: list[str],
        points_per_fragment: int,
        voxel_size: float = 0.0,
        threads: int = 4,
    ):
        self._paths = list(paths)
        self._P = int(points_per_fragment)
        self._voxel = float(voxel_size)
        self._lib = _load() or None
        self._id = None
        if self._lib is not None and hasattr(self._lib, "loader_create"):
            arr = (ctypes.c_char_p * len(self._paths))(
                *[p.encode() for p in self._paths]
            )
            lid = self._lib.loader_create(
                arr, len(self._paths), self._P,
                ctypes.c_float(self._voxel), threads,
            )
            self._id = lid if lid >= 0 else None
        self._served = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._served >= len(self._paths):
            raise StopIteration
        self._served += 1
        if self._id is not None:
            out = np.empty((self._P, 3), np.float32)
            cnt = ctypes.c_long(0)
            idx = self._lib.loader_next(
                self._id, _fptr(out), ctypes.byref(cnt)
            )
            if idx < 0:
                raise StopIteration
            mask = np.zeros(self._P, bool)
            mask[: cnt.value] = True
            out[cnt.value:] = 0.0
            return int(idx), out, mask
        # numpy fallback: synchronous
        idx = self._served - 1
        pts = read_ply(self._paths[idx])
        if self._voxel > 0:
            pts = voxel_subsample(pts, self._voxel)
        pts = random_subsample(pts, self._P, seed=idx + 1)
        out = np.zeros((self._P, 3), np.float32)
        out[: len(pts)] = pts
        mask = np.zeros(self._P, bool)
        mask[: len(pts)] = True
        return idx, out, mask

    def close(self):
        if self._id is not None and self._lib is not None:
            self._lib.loader_destroy(self._id)
            self._id = None

    def __del__(self):  # best-effort; explicit close() preferred
        try:
            self.close()
        except Exception:
            pass


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
