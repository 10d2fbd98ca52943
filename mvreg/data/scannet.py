"""ScanNet multiview evaluation dataset reader (SURVEY.md C12).

The reference evaluates transformation sync on preprocessed ScanNet
scenes: per scene, ~30 TSDF-fused fragments plus GT absolute camera-to-
world poses (`ref:lib/data.py`, download script; SURVEY.md C12, C18).
This reader handles the on-disk layout the reference's download produces:

    <root>/<scene_id>/
        fragment_*.ply          (or cloud_bin_*.ply)
        pose_*.txt              (4x4 GT absolute pose per fragment,
                                 row-major; alternatively poses.log in
                                 Redwood trajectory format)

and converts it to the framework's padded-array scene contract. With no
dataset on disk, `synthetic_scannet_scene` writes a synthetic scene in
this exact layout so the reader/eval path is testable end-to-end.
"""

from __future__ import annotations

import os
import re
from typing import NamedTuple

import numpy as np

from mvreg.data.threedmatch import write_ply


class ScanNetScene(NamedTuple):
    name: str
    points: np.ndarray  # (N, P, 3) padded fragment clouds, local frames
    mask: np.ndarray  # (N, P)
    R_gt: np.ndarray  # (N, 3, 3) absolute rotations (local -> world)
    t_gt: np.ndarray  # (N, 3)


def _numeric_sort(files: list[str]) -> list[str]:
    def key(s):
        nums = re.findall(r"\d+", s)
        return int(nums[-1]) if nums else 0

    return sorted(files, key=key)


def read_pose_txt(path: str) -> np.ndarray:
    T = np.loadtxt(path).reshape(4, 4)
    return T


def read_trajectory_log(path: str) -> list[np.ndarray]:
    """Redwood .log trajectory: blocks of 'i i n' + 4x4 matrices."""
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip()]
    out = []
    k = 0
    while k < len(lines):
        rows = [[float(v) for v in lines[k + 1 + r].split()] for r in range(4)]
        out.append(np.array(rows))
        k += 5
    return out


def load_scene(
    path: str, points_per_fragment: int = 16384, seed: int = 0
) -> ScanNetScene:
    """Load one scene directory into the padded contract."""
    files = [
        f for f in os.listdir(path)
        if f.endswith(".ply") and ("fragment" in f or "cloud" in f)
    ]
    files = _numeric_sort(files)
    n = len(files)
    if n == 0:
        raise FileNotFoundError(f"no fragment PLYs in {path}")

    poses: list[np.ndarray] = []
    pose_files = _numeric_sort(
        [f for f in os.listdir(path) if f.startswith("pose") and
         f.endswith(".txt")]
    )
    if len(pose_files) == n:
        poses = [read_pose_txt(os.path.join(path, f)) for f in pose_files]
    elif os.path.exists(os.path.join(path, "poses.log")):
        poses = read_trajectory_log(os.path.join(path, "poses.log"))
    else:
        raise FileNotFoundError(f"no GT poses in {path}")

    P = points_per_fragment
    pts = np.zeros((n, P, 3), np.float32)
    msk = np.zeros((n, P), bool)
    R = np.zeros((n, 3, 3), np.float32)
    t = np.zeros((n, 3), np.float32)
    # Threaded native prefetch (pthread pool) when built; the fallback
    # inside FragmentLoader is the synchronous numpy path.
    from mvreg.data.native_io import FragmentLoader

    loader = FragmentLoader(
        [os.path.join(path, f) for f in files], points_per_fragment=P,
        threads=4,
    )
    for k, frag_pts, frag_mask in loader:
        pts[k] = frag_pts
        msk[k] = frag_mask
    loader.close()
    for k in range(n):
        R[k] = poses[k][:3, :3]
        t[k] = poses[k][:3, 3]
    return ScanNetScene(
        name=os.path.basename(path.rstrip("/")),
        points=pts, mask=msk, R_gt=R, t_gt=t,
    )


def list_scenes(root: str) -> list[str]:
    return sorted(
        os.path.join(root, d) for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
    )


def write_synthetic_scene_dir(
    path: str, seed: int = 0, num_fragments: int = 8,
    points_per_fragment: int = 4096,
) -> None:
    """Materialize a synthetic scene in the ScanNet on-disk layout (tests
    and offline demos of the real-data path)."""
    from mvreg.data.synthetic import make_scene

    scene = make_scene(
        seed, num_fragments=num_fragments,
        points_per_fragment=points_per_fragment,
    )
    os.makedirs(path, exist_ok=True)
    for k in range(num_fragments):
        pts = scene.points[k][scene.mask[k]]
        write_ply(os.path.join(path, f"fragment_{k:03d}.ply"), pts)
        T = np.eye(4)
        T[:3, :3] = scene.R_gt[k]
        T[:3, 3] = scene.t_gt[k]
        np.savetxt(os.path.join(path, f"pose_{k:03d}.txt"), T)
