"""User-facing Registrar API: ragged clouds in, consistent poses out."""

import numpy as np
import pytest

from mvreg.api import Registrar
from mvreg.config.schema import PipelineConfig, override
from mvreg.data.synthetic import make_scene


@pytest.fixture(scope="module")
def registrar():
    cfg = override(
        PipelineConfig(),
        **{
            "voxel.voxel_size": 0.08,
            "voxel.capacities": [2048, 1024, 512, 256],
            "model.channels": [8, 16, 32, 64],
            "model.descriptor_dim": 16,
            "match.num_corr": 256,
            "sync.num_iters": 4,
        },
    )
    return Registrar(cfg)


def _ragged_scene(n=4, p=1500):
    scene = make_scene(seed=3, num_fragments=n, points_per_fragment=2048)
    clouds = []
    rng = np.random.default_rng(0)
    for i in range(n):
        pts = scene.points[i][scene.mask[i]]
        keep = rng.permutation(len(pts))[: p - 37 * i]  # ragged sizes
        clouds.append(pts[keep])
    return scene, clouds


def test_register_scene_gauge_and_consistency(registrar):
    scene, clouds = _ragged_scene()
    out = registrar.register(clouds)
    n = len(clouds)
    assert out.R.shape == (n, 3, 3) and out.t.shape == (n, 3)
    # Gauge: fragment 0 at identity.
    np.testing.assert_allclose(out.R[0], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(out.t[0], 0.0, atol=1e-5)
    # Valid rotations.
    for R in out.R:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
        assert np.linalg.det(R) > 0.9
    # (Accuracy with trained weights is covered by the pipeline and eval
    # tests; an untrained toy descriptor cannot register a scene, so this
    # test pins only the API contract.)
    assert np.all(np.isfinite(out.edge_confidence))
    assert out.edge_index.shape == (n * (n - 1) // 2, 2)


def test_register_identical_clouds_is_identity(registrar):
    """Two copies of the same cloud must register to ~identity even with
    untrained descriptors (features match exactly)."""
    _, clouds = _ragged_scene(n=2)
    out = registrar.register_pair(clouds[0], clouds[0].copy())
    cos = (np.trace(out.R) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 1.0
    assert np.linalg.norm(out.t) < 0.05


def test_register_pair_shapes(registrar):
    _, clouds = _ragged_scene(n=2)
    out = registrar.register_pair(clouds[0], clouds[1])
    assert out.R.shape == (3, 3) and out.t.shape == (3,)
    assert 0.0 <= out.confidence <= 1.0
    assert out.num_correspondences > 0
    np.testing.assert_allclose(out.R @ out.R.T, np.eye(3), atol=1e-4)


def test_input_validation(registrar):
    with pytest.raises(ValueError):
        registrar.register([np.zeros((10, 3))])  # < 2 fragments
    with pytest.raises(ValueError):
        registrar.register_pair(np.zeros((4, 2)), np.zeros((4, 3)))
    with pytest.raises(ValueError):
        registrar.register_pair(
            np.zeros((64, 3)), np.zeros((64, 3)), num_points=32
        )
