"""grain input pipeline: determinism, batch contract, train-step compat."""

import numpy as np
import pytest

import jax

from mvreg.data.grain_pipeline import (
    SyntheticPairMap,
    epochs,
    synthetic_pair_dataset,
    threedmatch_pair_dataset,
)
from mvreg.train.loop import PairBatch


def test_batch_contract():
    ds = synthetic_pair_dataset(
        num_pairs=8, batch_pairs=4, points_per_fragment=256, seed=0
    )
    batches = list(ds)
    assert len(batches) == 2
    b = batches[0]
    assert isinstance(b, PairBatch)
    assert b.points.shape == (4, 2, 256, 3)
    assert b.mask.shape == (4, 2, 256)
    assert b.R_ij.shape == (4, 3, 3)
    # rotations are orthonormal
    RtR = np.einsum("bij,bik->bjk", b.R_ij, b.R_ij)
    np.testing.assert_allclose(
        RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5
    )


def test_deterministic_in_seed():
    a = list(synthetic_pair_dataset(6, 2, 128, seed=3))
    b = list(synthetic_pair_dataset(6, 2, 128, seed=3))
    c = list(synthetic_pair_dataset(6, 2, 128, seed=4))
    np.testing.assert_array_equal(a[0].points, b[0].points)
    assert not np.array_equal(a[0].points, c[0].points)


def test_augmentation_preserves_gt():
    """Augmented pair: GT transform must still map frag0 onto frag1."""
    plain = SyntheticPairMap(1024, augment=False)(5)
    aug = SyntheticPairMap(1024, augment=True, seed=1)(5)
    for d in (plain, aug):
        p0, p1 = d["points"][0], d["points"][1]
        m0, m1 = d["mask"][0].astype(bool), d["mask"][1].astype(bool)
        x = p0[m0] @ d["R_ij"].T + d["t_ij"]
        # overlapping region: each transformed frag0 point close to SOME
        # frag1 point (crops overlap ~50%; median NN dist small)
        d2 = ((x[:, None, :] - p1[None, m1, :]) ** 2).sum(-1)
        nn = np.sqrt(d2.min(axis=1))
        assert np.median(nn) < 0.08
    assert not np.allclose(plain["points"], aug["points"])


def test_epochs_reshuffle_and_prefetch():
    ds = synthetic_pair_dataset(8, 2, 64, seed=0)
    it = epochs(ds, num_epochs=2)
    batches = list(it)
    assert len(batches) == 8  # 4 per epoch x 2
    e1 = np.stack([b.R_ij for b in batches[:4]])
    e2 = np.stack([b.R_ij for b in batches[4:]])
    # same data, different order across epochs
    assert not np.array_equal(e1, e2)
    assert np.allclose(np.sort(e1.ravel()), np.sort(e2.ravel()))


def test_threedmatch_dataset_from_disk(tmp_path):
    """Real on-disk layout: npz fragments + overlap list + GT poses."""
    rng = np.random.default_rng(0)
    root = tmp_path / "train"
    root.mkdir()
    files, poses = [], {}
    base = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    for k in range(3):
        f = f"frag_{k}.npz"
        np.savez(root / f, pcd=base + 0.01 * k)
        files.append(f)
    lines = []
    for i in range(3):
        for j in range(i + 1, 3):
            lines.append(f"{files[i]} {files[j]} 0.5\n")
            poses[(files[i], files[j])] = (
                np.eye(3, dtype=np.float32),
                np.zeros(3, np.float32),
            )
    lst = tmp_path / "pairs.txt"
    lst.write_text("".join(lines))
    ds = threedmatch_pair_dataset(
        str(root), str(lst), batch_pairs=1, points_per_fragment=256,
        poses=poses, seed=0, augment=True,
    )
    batches = list(ds)
    assert len(batches) == 3
    b = batches[0]
    assert b.points.shape == (1, 2, 256, 3)
    assert b.mask[0, 0].sum() == 256  # 500 points subsampled to 256


def test_feeds_train_step():
    """One jitted descriptor train step straight off the grain iterator."""
    from mvreg.train.loop import make_train_step
    from mvreg.train.state import create_train_state
    from mvreg.config.schema import PipelineConfig, override

    cfg = override(
        PipelineConfig(),
        **{
            "voxel.capacities": [512, 256, 128, 64],
            "voxel.voxel_size": 0.08,
            "model.channels": [4, 8, 8, 16],
            "model.descriptor_dim": 8,
            "match.num_corr": 128,
            "filter.channels": 16,
            "filter.num_clusters": 8,
            "filter.blocks_before": 1,
            "filter.blocks_cluster": 1,
            "filter.blocks_after": 1,
            "train.batch_pairs": 2,
        },
    )
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, stage="descriptor")
    ds = synthetic_pair_dataset(4, 2, 512, seed=0, augment=True)
    for batch in ds:
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss_total"]))
