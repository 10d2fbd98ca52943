"""Vectorized RANSAC: recovery under heavy outliers, padding, jit/vmap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvreg.core.metrics import rotation_error_deg, translation_error
from mvreg.core.ransac import ransac_kabsch
from mvreg.core.procrustes import irls_kabsch


def _problem(seed, n=256, outlier_frac=0.7, noise=0.002):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    # random rotation via quaternion
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w_, xq, yq, zq = q
    R = np.array(
        [
            [1 - 2 * (yq**2 + zq**2), 2 * (xq * yq - w_ * zq), 2 * (xq * zq + w_ * yq)],
            [2 * (xq * yq + w_ * zq), 1 - 2 * (xq**2 + zq**2), 2 * (yq * zq - w_ * xq)],
            [2 * (xq * zq - w_ * yq), 2 * (yq * zq + w_ * xq), 1 - 2 * (xq**2 + yq**2)],
        ],
        dtype=np.float32,
    )
    t = rng.uniform(-2, 2, size=3).astype(np.float32)
    y = x @ R.T + t + noise * rng.normal(size=(n, 3)).astype(np.float32)
    n_out = int(outlier_frac * n)
    out_rows = rng.choice(n, size=n_out, replace=False)
    y[out_rows] = rng.uniform(-3, 3, size=(n_out, 3)).astype(np.float32)
    return (
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(R), jnp.asarray(t),
        np.setdiff1d(np.arange(n), out_rows),
    )


def test_recovers_under_70pct_outliers():
    x, y, R, t, inl_rows = _problem(0, outlier_frac=0.7)
    mask = jnp.ones(x.shape[0], bool)
    res = jax.jit(
        lambda x, y, m, k: ransac_kabsch(x, y, m, k, num_hypotheses=512)
    )(x, y, mask, jax.random.PRNGKey(1))
    assert float(rotation_error_deg(res.R, R)) < 1.0
    assert float(translation_error(res.t, t)) < 0.02
    assert float(jnp.linalg.det(res.R)) == pytest.approx(1.0, abs=1e-4)
    # found most of the true inliers
    assert int(res.num_inliers) > 0.8 * len(inl_rows)


def test_beats_uniform_irls_at_high_outlier_rate():
    """The regime RANSAC exists for: IRLS from uniform weights can fall
    into the outlier basin at ~80% contamination; RANSAC must not."""
    wins = 0
    for seed in range(3):
        x, y, R, t, _ = _problem(seed * 7 + 1, outlier_frac=0.8)
        mask = jnp.ones(x.shape[0], bool)
        res = ransac_kabsch(x, y, mask, jax.random.PRNGKey(seed),
                            num_hypotheses=1024)
        err_r = float(rotation_error_deg(res.R, R))
        Ri, ti, _ = irls_kabsch(x, y, mask.astype(x.dtype))
        err_i = float(rotation_error_deg(Ri, R))
        assert err_r < 2.0
        wins += err_r <= err_i + 1e-3
    assert wins >= 2


def test_padding_invariance():
    x, y, R, t, _ = _problem(3, n=128, outlier_frac=0.5)
    key = jax.random.PRNGKey(0)
    res_a = ransac_kabsch(x, y, jnp.ones(128, bool), key)
    xp = jnp.concatenate([x, jnp.full((64, 3), 1e6, x.dtype)])
    yp = jnp.concatenate([y, jnp.full((64, 3), -1e6, y.dtype)])
    mp = jnp.concatenate([jnp.ones(128, bool), jnp.zeros(64, bool)])
    res_b = ransac_kabsch(xp, yp, mp, key)
    # same valid-first sample draw -> identical models
    np.testing.assert_allclose(
        np.asarray(res_a.R), np.asarray(res_b.R), atol=1e-5
    )
    assert int(res_a.num_inliers) == int(res_b.num_inliers)


def test_all_masked_is_finite():
    x = jnp.zeros((32, 3))
    y = jnp.zeros((32, 3))
    res = ransac_kabsch(x, y, jnp.zeros(32, bool), jax.random.PRNGKey(0))
    assert bool(jnp.all(jnp.isfinite(res.R)))
    assert bool(jnp.all(jnp.isfinite(res.t)))
    assert int(res.num_inliers) == 0


def test_vmaps_over_edges():
    xs, ys, Rs = [], [], []
    for seed in range(4):
        x, y, R, t, _ = _problem(seed, n=128, outlier_frac=0.6)
        xs.append(x), ys.append(y), Rs.append(R)
    X, Y = jnp.stack(xs), jnp.stack(ys)
    M = jnp.ones((4, 128), bool)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    res = jax.vmap(
        lambda x, y, m, k: ransac_kabsch(x, y, m, k, num_hypotheses=256)
    )(X, Y, M, keys)
    for b in range(4):
        assert float(rotation_error_deg(res.R[b], Rs[b])) < 2.0


def test_pipeline_ransac_estimator():
    """register_pair with match.estimator='ransac' end to end."""
    from mvreg.config.schema import PipelineConfig, override
    from mvreg.data.synthetic import make_pair
    from mvreg.pipeline import extract_descriptors, init_params, register_pair

    cfg = override(
        PipelineConfig(),
        **{
            "voxel.capacities": [512, 256, 128, 64],
            "voxel.voxel_size": 0.08,
            "model.channels": [4, 8, 8, 16],
            "model.descriptor_dim": 8,
            "match.num_corr": 128,
            "match.estimator": "ransac",
            "match.ransac_hypotheses": 128,
            "match.overlap_ransac_hypotheses": 64,
            "filter.channels": 16,
            "filter.num_clusters": 8,
            "filter.blocks_before": 1,
            "filter.blocks_cluster": 1,
            "filter.blocks_after": 1,
        },
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    scene = make_pair(seed=0, points_per_fragment=512)
    pts, msk = jnp.asarray(scene.points), jnp.asarray(scene.mask)
    desc = extract_descriptors(params, cfg, pts, msk)
    di = jax.tree_util.tree_map(lambda a: a[0], desc)
    dj = jax.tree_util.tree_map(lambda a: a[1], desc)
    out = jax.jit(
        lambda p: register_pair(p, cfg, di, dj, use_filter=False)
    )(params)
    assert bool(jnp.all(jnp.isfinite(out.R)))
    assert float(jnp.linalg.det(out.R)) == pytest.approx(1.0, abs=1e-3)
