"""grain-backed input pipeline: the torch-DataLoader-worker replacement.

SURVEY.md C11/§2.3: the reference feeds training from torch DataLoader
worker processes (multiprocessing, C core) that load .npz fragment
pairs, apply random rotation augmentation, and collate. Here the same
contract is a `grain.MapDataset` pipeline — deterministic per (seed,
epoch), checkpointable, with optional multiprocess prefetching — that
emits the exact `PairBatch` the jitted train step consumes. Host work is
deliberately light (load, augment, pad): voxelization happens on-device
(ops/voxel), unlike the reference which quantizes on the host workers.

Sources:
  * `synthetic_pair_records(n)` — index-keyed synthetic pairs (no
    downloads; deterministic in the record index).
  * `threedmatch_pair_records(root, list_file)` — FCGF-style overlap
    list over on-disk .npz/.ply fragments with GT poses.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import numpy as np

import grain

from mvreg.data import synthetic
from mvreg.data.threedmatch import load_npz_fragment, read_overlap_list
from mvreg.train.loop import PairBatch


def _pad_points(pts: np.ndarray, num: int) -> tuple[np.ndarray, np.ndarray]:
    """Subsample-or-pad to exactly `num` rows; returns (points, mask)."""
    out = np.zeros((num, 3), np.float32)
    msk = np.zeros((num,), bool)
    n = min(len(pts), num)
    if len(pts) > num:
        sel = np.random.default_rng(len(pts)).choice(
            len(pts), size=num, replace=False
        )
        pts = pts[sel]
    out[:n] = pts[:n]
    msk[:n] = True
    return out, msk


def _augment_pair(
    pts0: np.ndarray, pts1: np.ndarray, R01: np.ndarray, t01: np.ndarray,
    rng: np.random.Generator,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Random SO(3) rotation of each fragment's local frame (the
    reference's training augmentation, SURVEY.md C11) with the GT
    relative transform updated to match."""
    from mvreg.data.synthetic import _random_rotation

    A0 = _random_rotation(rng)[0].astype(np.float32)
    A1 = _random_rotation(rng)[0].astype(np.float32)
    # x0' = A0 x0, x1' = A1 x1  =>  T'_01 = A1 ∘ T_01 ∘ A0⁻¹
    R_new = A1 @ R01 @ A0.T
    t_new = A1 @ t01
    return pts0 @ A0.T, pts1 @ A1.T, R_new, t_new


class SyntheticPairMap:
    """Record index -> PairBatch element (batch dims added by .batch)."""

    def __init__(self, points_per_fragment: int, noise: float = 0.005,
                 augment: bool = False, seed: int = 0):
        self.points = points_per_fragment
        self.noise = noise
        self.augment = augment
        self.seed = seed

    def __call__(self, idx: int) -> dict[str, np.ndarray]:
        scene = synthetic.make_pair(int(idx), self.points, self.noise)
        R0, t0 = scene.R_gt[0], scene.t_gt[0]
        R1, t1 = scene.R_gt[1], scene.t_gt[1]
        R01 = (R1.T @ R0).astype(np.float32)
        t01 = (R1.T @ (t0 - t1)).astype(np.float32)
        p0, p1 = scene.points[0], scene.points[1]
        m0, m1 = scene.mask[0], scene.mask[1]
        if self.augment:
            rng = np.random.default_rng(self.seed * 100003 + int(idx))
            p0, p1, R01, t01 = _augment_pair(p0, p1, R01, t01, rng)
        return {
            "points": np.stack([p0, p1]).astype(np.float32),
            "mask": np.stack([m0, m1]),
            "R_ij": R01,
            "t_ij": t01,
        }


class ThreeDMatchPairMap:
    """(file_i, file_j, pose files) record -> PairBatch element."""

    def __init__(self, root: str, points_per_fragment: int,
                 augment: bool = True, seed: int = 0):
        self.root = root
        self.points = points_per_fragment
        self.augment = augment
        self.seed = seed

    def __call__(self, rec: dict[str, Any]) -> dict[str, np.ndarray]:
        p0 = load_npz_fragment(os.path.join(self.root, rec["file_i"]))
        p1 = load_npz_fragment(os.path.join(self.root, rec["file_j"]))
        R01 = np.asarray(rec["R_ij"], np.float32)
        t01 = np.asarray(rec["t_ij"], np.float32)
        rng = np.random.default_rng(self.seed * 100003 + int(rec["index"]))
        if self.augment:
            p0, p1, R01, t01 = _augment_pair(p0, p1, R01, t01, rng)
        p0, m0 = _pad_points(p0, self.points)
        p1, m1 = _pad_points(p1, self.points)
        return {
            "points": np.stack([p0, p1]).astype(np.float32),
            "mask": np.stack([m0, m1]),
            "R_ij": R01,
            "t_ij": t01,
        }


def _to_pair_batch(d: dict[str, np.ndarray]) -> PairBatch:
    return PairBatch(
        points=d["points"], mask=d["mask"], R_ij=d["R_ij"], t_ij=d["t_ij"]
    )


def synthetic_pair_dataset(
    num_pairs: int,
    batch_pairs: int,
    points_per_fragment: int,
    seed: int = 0,
    augment: bool = False,
    shuffle: bool = True,
) -> grain.MapDataset:
    """Finite epoch dataset of synthetic pairs -> batched PairBatch."""
    ds = grain.MapDataset.source(list(range(num_pairs)))
    if shuffle:
        ds = ds.shuffle(seed=seed)
    ds = ds.map(SyntheticPairMap(points_per_fragment, augment=augment,
                                 seed=seed))
    return ds.batch(batch_pairs, drop_remainder=True).map(_to_pair_batch)


def threedmatch_pair_dataset(
    root: str,
    overlap_list: str,
    batch_pairs: int,
    points_per_fragment: int,
    poses: dict[tuple[str, str], tuple[np.ndarray, np.ndarray]],
    seed: int = 0,
    min_overlap: float = 0.3,
    augment: bool = True,
) -> grain.MapDataset:
    """Epoch dataset over an FCGF-style overlap list (SURVEY.md C11).

    `poses` maps (file_i, file_j) -> GT (R_ij, t_ij) (the preprocessed
    3DMatch training release stores these alongside the pair list).
    """
    pairs = read_overlap_list(overlap_list, min_overlap)
    records = []
    for k, p in enumerate(pairs):
        R, t = poses[(p.file_i, p.file_j)]
        records.append({
            "index": k, "file_i": p.file_i, "file_j": p.file_j,
            "R_ij": np.asarray(R, np.float32),
            "t_ij": np.asarray(t, np.float32),
        })
    ds = grain.MapDataset.source(records).shuffle(seed=seed)
    ds = ds.map(ThreeDMatchPairMap(root, points_per_fragment,
                                   augment=augment, seed=seed))
    return ds.batch(batch_pairs, drop_remainder=True).map(_to_pair_batch)


def epochs(ds: grain.MapDataset, num_epochs: int | None = None,
           read_options: grain.ReadOptions | None = None):
    """Iterate `ds` for `num_epochs` (None = forever) with background
    prefetch threads (the worker-process analog; grain's repeat reshuffles
    per epoch because MapDataset shuffling is epoch-keyed)."""
    ds = ds.repeat(num_epochs)
    it = ds.to_iter_dataset(read_options=read_options
                            or grain.ReadOptions(num_threads=2,
                                                 prefetch_buffer_size=4))
    yield from it
