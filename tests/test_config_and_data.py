import os

import numpy as np
import pytest

from mvreg.config.schema import (
    PipelineConfig,
    load_yaml,
    override,
    save_yaml,
)
from mvreg.data.synthetic import make_pair, make_scene


def test_config_roundtrip(tmp_path):
    cfg = override(
        PipelineConfig(),
        **{"voxel.voxel_size": 0.05, "sync.num_iters": 7,
           "model.channels": [8, 16, 32, 64]},
    )
    path = os.path.join(tmp_path, "cfg.yaml")
    save_yaml(cfg, path)
    cfg2 = load_yaml(path)
    assert cfg2 == cfg
    assert cfg2.voxel.voxel_size == 0.05
    assert cfg2.sync.num_iters == 7
    assert cfg2.model.channels == (8, 16, 32, 64)


def test_config_override_unknown_key():
    with pytest.raises(KeyError):
        override(PipelineConfig(), **{"voxel.bogus": 1})


def test_config_defaults_match_reference():
    cfg = PipelineConfig()
    assert cfg.voxel.voxel_size == 0.025  # 2.5 cm, SURVEY.md C1
    assert cfg.model.descriptor_dim == 32  # FCGF output dim
    assert cfg.filter.num_clusters == 500  # OANet m
    assert cfg.sync.num_iters == 4  # reference IRLS iterations


def test_make_scene_shapes_and_overlap():
    scene = make_scene(seed=0, num_fragments=4, points_per_fragment=1024)
    assert scene.points.shape == (4, 1024, 3)
    assert scene.mask.shape == (4, 1024)
    assert scene.mask.any(axis=1).all(), "every fragment has points"
    # GT poses are rigid
    RtR = np.einsum("nij,nkj->nik", scene.R_gt, scene.R_gt)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (4, 3, 3)),
                               atol=1e-5)
    # consecutive fragments overlap in world space
    for k in range(3):
        w0 = scene.points[k][scene.mask[k]] @ scene.R_gt[k].T + scene.t_gt[k]
        w1 = scene.points[k + 1][scene.mask[k + 1]] @ scene.R_gt[k + 1].T \
            + scene.t_gt[k + 1]
        d = np.linalg.norm(w0[:, None, :] - w1[None, :500, :], axis=-1)
        overlap = (d.min(axis=1) < 0.05).mean()
        assert overlap > 0.15, f"fragments {k},{k+1} overlap={overlap}"


def test_make_scene_deterministic():
    s1 = make_scene(seed=42, num_fragments=3, points_per_fragment=256)
    s2 = make_scene(seed=42, num_fragments=3, points_per_fragment=256)
    np.testing.assert_array_equal(s1.points, s2.points)
    np.testing.assert_array_equal(s1.R_gt, s2.R_gt)


def test_make_pair():
    pair = make_pair(seed=7, points_per_fragment=512)
    assert pair.points.shape[0] == 2
    assert pair.mask.sum() > 500


def test_resolve_config_precedence(tmp_path):
    """Explicit YAML > checkpoint-saved config > defaults, then --set."""
    from mvreg.config.schema import (
        PipelineConfig,
        override,
        resolve_config,
        save_yaml,
    )

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    save_yaml(
        override(PipelineConfig(), **{"voxel.voxel_size": 0.05}),
        str(ckpt / "config.yaml"),
    )
    explicit = tmp_path / "explicit.yaml"
    save_yaml(
        override(PipelineConfig(), **{"voxel.voxel_size": 0.1}),
        str(explicit),
    )

    assert resolve_config(None, None, ()).voxel.voxel_size == 0.025
    assert resolve_config(None, str(ckpt), ()).voxel.voxel_size == 0.05
    assert resolve_config(str(explicit), str(ckpt), ()).voxel.voxel_size == 0.1
    got = resolve_config(None, str(ckpt), ["voxel.voxel_size=0.2"])
    assert got.voxel.voxel_size == 0.2
    # tuple-valued --set survives the eval round-trip
    got = resolve_config(None, None, ["voxel.capacities=(64,32,16,8)"])
    assert got.voxel.capacities == (64, 32, 16, 8)


def test_pair_curriculum_and_negatives():
    """Overlap curriculum + zero-overlap negative pairs (batching.py)."""
    from mvreg.data.batching import synthetic_pair_batch

    # Wide shift range produces varying overlap; negative pairs have no
    # world-space overlap at all.
    b = synthetic_pair_batch(
        7, 6, points_per_fragment=512, shift_range=(0.3, 1.2),
        negative_fraction=1.0,
    )
    for k in range(6):
        p0 = b.points[k, 0][b.mask[k, 0]]
        p1 = b.points[k, 1][b.mask[k, 1]]
        w0 = p0 @ b.R_ij[k].T + b.t_ij[k]  # into frame 1 via GT
        d = np.linalg.norm(w0[:, None, :] - w1_sub(p1)[None], axis=-1)
        assert (d.min(axis=1) < 0.05).mean() < 0.02  # ~no overlap


def w1_sub(p, n=400):
    return p[:: max(1, len(p) // n)][:n]


def test_pair_batch_default_unchanged():
    from mvreg.data.batching import synthetic_pair_batch

    a = synthetic_pair_batch(3, 2, points_per_fragment=256)
    b = synthetic_pair_batch(3, 2, points_per_fragment=256,
                             shift_range=(0.5, 0.5), negative_fraction=0.0)
    np.testing.assert_array_equal(a.points, b.points)
