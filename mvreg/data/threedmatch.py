"""3DMatch / Redwood file formats: gt.log, gt.info, PLY fragments.

Counterpart of the reference's benchmark-data plumbing
(`ref:scripts/benchmark_pairwise_registration.py` parses `gt.log` /
`gt.info` per the Redwood evaluation protocol; SURVEY.md C17, §3.2).
Pure-numpy readers/writers (no Open3D dependency — SURVEY.md §2.3 drops
it): the formats are plain text blocks and PLY is parsed directly.

gt.log:  repeated blocks of
           i j n            (fragment ids + total fragment count)
           4 rows of 4      (T_ij, row-major)
gt.info: repeated blocks of
           i j n
           6 rows of 6      (information matrix of the pair)
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np


class GtPair(NamedTuple):
    i: int
    j: int
    transform: np.ndarray  # (4, 4)


class GtInfo(NamedTuple):
    i: int
    j: int
    info: np.ndarray  # (6, 6)


def read_gt_log(path: str) -> list[GtPair]:
    pairs = []
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip()]
    k = 0
    while k < len(lines):
        i, j, _ = (int(v) for v in lines[k].split())
        rows = [
            [float(v) for v in lines[k + 1 + r].split()] for r in range(4)
        ]
        pairs.append(GtPair(i=i, j=j, transform=np.array(rows)))
        k += 5
    return pairs


def write_gt_log(path: str, pairs: list[GtPair], n_fragments: int) -> None:
    with open(path, "w") as f:
        for p in pairs:
            f.write(f"{p.i}\t{p.j}\t{n_fragments}\n")
            for row in p.transform:
                f.write("\t".join(f"{v:.8f}" for v in row) + "\n")


def read_gt_info(path: str) -> list[GtInfo]:
    infos = []
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip()]
    k = 0
    while k < len(lines):
        i, j, _ = (int(v) for v in lines[k].split())
        rows = [
            [float(v) for v in lines[k + 1 + r].split()] for r in range(6)
        ]
        infos.append(GtInfo(i=i, j=j, info=np.array(rows)))
        k += 7
    return infos


def write_gt_info(path: str, infos: list[GtInfo], n_fragments: int) -> None:
    with open(path, "w") as f:
        for p in infos:
            f.write(f"{p.i}\t{p.j}\t{n_fragments}\n")
            for row in p.info:
                f.write("\t".join(f"{v:.8f}" for v in row) + "\n")


def read_ply(path: str) -> np.ndarray:
    """Read vertex positions from an ascii or binary-LE PLY -> (N, 3)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n_vert = int(
            next(l.split()[2] for l in header if l.startswith("element vertex"))
        )
        # vertex property layout
        props = []
        in_vertex = False
        for l in header:
            if l.startswith("element"):
                in_vertex = l.startswith("element vertex")
            elif l.startswith("property") and in_vertex:
                _, typ, name = l.split()
                props.append((typ, name))
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n_vert)
            names = [n for _, n in props]
            xyz = [names.index(c) for c in ("x", "y", "z")]
            return data[:, xyz].astype(np.float32)
        assert fmt == "binary_little_endian", f"unsupported PLY format {fmt}"
        np_type = {
            "float": "<f4", "float32": "<f4", "double": "<f8",
            "float64": "<f8", "uchar": "u1", "uint8": "u1", "char": "i1",
            "int8": "i1", "short": "<i2", "ushort": "<u2", "int": "<i4",
            "uint": "<u4", "int32": "<i4",
        }
        dtype = np.dtype([(n, np_type[t]) for t, n in props])
        arr = np.frombuffer(f.read(n_vert * dtype.itemsize), dtype=dtype,
                            count=n_vert)
        return np.stack(
            [arr["x"], arr["y"], arr["z"]], axis=-1
        ).astype(np.float32)


def write_ply(path: str, points: np.ndarray, binary: bool = True) -> None:
    """Write (N, 3) points as a PLY file (the demo-export path, C19)."""
    n = len(points)
    header = (
        "ply\n"
        + ("format binary_little_endian 1.0\n" if binary
           else "format ascii 1.0\n")
        + f"element vertex {n}\n"
        + "property float x\nproperty float y\nproperty float z\n"
        + "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        pts = np.asarray(points, dtype="<f4")
        if binary:
            f.write(pts.tobytes())
        else:
            np.savetxt(f, pts, fmt="%.6f")


class SceneOnDisk(NamedTuple):
    """A benchmark scene directory: fragment clouds + GT pairs."""

    name: str
    fragments: list[np.ndarray]  # list of (Ni, 3)
    gt_pairs: list[GtPair]
    gt_infos: list[GtInfo] | None


def load_scene_dir(path: str) -> SceneOnDisk:
    """Load a 3DMatch-layout scene dir: cloud_bin_*.ply + gt.log [+ gt.info].

    Uses the native PLY parser when built (mvreg.data.native_io)."""
    from mvreg.data import native_io

    frag_files = sorted(
        (f for f in os.listdir(path) if f.endswith(".ply")),
        key=lambda s: int("".join(c for c in s if c.isdigit()) or 0),
    )
    fragments = [native_io.read_ply(os.path.join(path, f)) for f in frag_files]
    gt_pairs = read_gt_log(os.path.join(path, "gt.log"))
    info_path = os.path.join(path, "gt.info")
    gt_infos = read_gt_info(info_path) if os.path.exists(info_path) else None
    return SceneOnDisk(
        name=os.path.basename(path.rstrip("/")),
        fragments=fragments,
        gt_pairs=gt_pairs,
        gt_infos=gt_infos,
    )


# --- Training-set format (SURVEY.md C11): the reference trains on
# preprocessed 3DMatch fragment pairs listed in overlap files and stored
# as .npz point clouds (FCGF preprocessing).

def load_npz_fragment(path: str, key: str = "pcd") -> np.ndarray:
    """Load a preprocessed fragment .npz -> (N, 3) float32.

    FCGF's preprocessing stores clouds under 'pcd' (xyz) and optionally
    'color'; fall back to the first 3-column array found.
    """
    data = np.load(path)
    if key in data:
        return np.asarray(data[key], np.float32)[:, :3]
    for k in data.files:
        arr = np.asarray(data[k])
        if arr.ndim == 2 and arr.shape[1] >= 3:
            return arr[:, :3].astype(np.float32)
    raise KeyError(f"no point array found in {path} (keys: {data.files})")


class TrainPair(NamedTuple):
    file_i: str
    file_j: str
    overlap: float


def read_overlap_list(path: str, min_overlap: float = 0.3) -> list[TrainPair]:
    """Parse an FCGF-style overlap list: '<frag_i> <frag_j> <overlap>' per
    line; keep pairs above `min_overlap` (the reference trains on >30%
    overlap pairs)."""
    pairs = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            ov = float(parts[2])
            if ov >= min_overlap:
                pairs.append(TrainPair(parts[0], parts[1], ov))
    return pairs
