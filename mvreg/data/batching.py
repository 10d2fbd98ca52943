"""Host-side batch construction for training.

Counterpart of the reference's DataLoader collate path (SURVEY.md C11,
§3.1): the reference voxelizes on host workers; here voxelization lives
on-device (ops/voxel), so the host only assembles fixed-size padded
arrays — cheap enough that a single process keeps the chip fed. A grain
pipeline can replace this for real datasets without changing the batch
contract.
"""

from __future__ import annotations

import numpy as np

from mvreg.data import synthetic
from mvreg.train.loop import PairBatch, SceneBatch


def _relative_np(R0, t0, R1, t1):
    """GT T_01 mapping fragment-0 coords into fragment 1 (numpy)."""
    R = R1.T @ R0
    t = R1.T @ (t0 - t1)
    return R, t


def synthetic_pair_batch(
    seed: int,
    batch_size: int,
    points_per_fragment: int = 2048,
    noise: float = 0.005,
    shift_range: tuple[float, float] = (0.5, 0.5),
    negative_fraction: float = 0.0,
    richness: str = "v1",
) -> PairBatch:
    """Build a PairBatch of synthetic fragment pairs.

    shift_range: crop-center shift (m) sampled per pair — an overlap
    curriculum (the recall protocol evaluates non-consecutive, i.e.
    low-overlap, pairs; training only on one easy shift leaves the
    descriptor untrained there).
    negative_fraction: probability of a ZERO-overlap pair (crops ≥ one
    crop diameter apart). Negatives carry no pose supervision (the train
    loss already gates on GT-inlier count) but teach the filter to emit
    all-outlier labels and the confidence head to flag junk edges — the
    calibration that 30-fragment pose graphs need, where most of the
    C(N,2) edges are junk.
    """
    pts = np.zeros((batch_size, 2, points_per_fragment, 3), np.float32)
    msk = np.zeros((batch_size, 2, points_per_fragment), bool)
    Rij = np.zeros((batch_size, 3, 3), np.float32)
    tij = np.zeros((batch_size, 3), np.float32)
    for b in range(batch_size):
        r = np.random.default_rng(seed * 65599 + b)
        if r.random() < negative_fraction:
            # Zero-overlap negative: opposite-corner crops of the SAME
            # world (the make_scene walk clips centers to the world box,
            # so no overlap_shift value can guarantee separation; corner
            # placement gives >=3.1 m in xy > 2.4 m crop diameter).
            c0 = np.array([r.uniform(0.5, 0.9), r.uniform(0.5, 0.9),
                           r.uniform(0.1, 0.4)])
            c1 = np.array([r.uniform(3.1, 3.5), r.uniform(3.1, 3.5),
                           r.uniform(0.1, 0.4)])
            scene = synthetic.make_scene(
                seed * 10007 + b, num_fragments=2,
                points_per_fragment=points_per_fragment, noise=noise,
                centers_override=np.stack([c0, c1]), richness=richness,
            )
        else:
            shift = float(r.uniform(*shift_range))
            scene = synthetic.make_pair(
                seed * 10007 + b, points_per_fragment, noise,
                overlap_shift=shift, richness=richness,
            )
        pts[b] = scene.points
        msk[b] = scene.mask
        R, t = _relative_np(
            scene.R_gt[0], scene.t_gt[0], scene.R_gt[1], scene.t_gt[1]
        )
        Rij[b], tij[b] = R.astype(np.float32), t.astype(np.float32)
    return PairBatch(points=pts, mask=msk, R_ij=Rij, t_ij=tij)


def synthetic_pair_stream(
    seed: int,
    batch_size: int,
    points_per_fragment: int = 2048,
    noise: float = 0.005,
    pool_pairs: int = 0,
    shift_range: tuple[float, float] = (0.5, 0.5),
    negative_fraction: float = 0.0,
    richness: str = "v1",
):
    """Generator of PairBatches (deterministic in seed).

    pool_pairs == 0: a fresh scene every step (infinite-data regime).
    pool_pairs > 0:  pregenerate a fixed dataset of `pool_pairs` pairs and
    cycle it with reshuffling — the reference's epoch regime (a fixed
    3DMatch pair list, SURVEY.md C11), which the descriptor needs to make
    optimization progress rather than chasing a nonstationary stream.
    """
    if pool_pairs <= 0:
        step = 0
        while True:
            yield synthetic_pair_batch(
                seed + step, batch_size, points_per_fragment, noise,
                shift_range, negative_fraction, richness,
            )
            step += 1
        return

    n_batches = (pool_pairs + batch_size - 1) // batch_size
    pool = [
        synthetic_pair_batch(
            seed + k, batch_size, points_per_fragment, noise,
            shift_range, negative_fraction, richness,
        )
        for k in range(n_batches)
    ]
    rng = np.random.default_rng(seed)
    while True:
        for k in rng.permutation(n_batches):
            yield pool[k]


def synthetic_scene_batch(
    seed: int,
    batch_size: int,
    num_fragments: int = 4,
    points_per_fragment: int = 2048,
    noise: float = 0.005,
) -> SceneBatch:
    """Build a SceneBatch of synthetic multiview scenes (sync stage)."""
    pts = np.zeros(
        (batch_size, num_fragments, points_per_fragment, 3), np.float32
    )
    msk = np.zeros((batch_size, num_fragments, points_per_fragment), bool)
    Rg = np.zeros((batch_size, num_fragments, 3, 3), np.float32)
    tg = np.zeros((batch_size, num_fragments, 3), np.float32)
    for b in range(batch_size):
        scene = synthetic.make_scene(
            seed * 20011 + b, num_fragments, points_per_fragment, noise=noise
        )
        pts[b], msk[b] = scene.points, scene.mask
        Rg[b], tg[b] = scene.R_gt, scene.t_gt
    return SceneBatch(points=pts, mask=msk, R_gt=Rg, t_gt=tg)


def synthetic_scene_stream(
    seed: int,
    batch_size: int,
    num_fragments: int = 4,
    points_per_fragment: int = 2048,
    noise: float = 0.005,
    pool_scenes: int = 0,
):
    """Generator of SceneBatches; pool_scenes>0 = fixed-dataset regime."""
    if pool_scenes <= 0:
        step = 0
        while True:
            yield synthetic_scene_batch(
                seed + step, batch_size, num_fragments,
                points_per_fragment, noise,
            )
            step += 1
        return
    n_batches = (pool_scenes + batch_size - 1) // batch_size
    pool = [
        synthetic_scene_batch(
            seed + k, batch_size, num_fragments, points_per_fragment, noise
        )
        for k in range(n_batches)
    ]
    rng = np.random.default_rng(seed)
    while True:
        for k in rng.permutation(n_batches):
            yield pool[k]
