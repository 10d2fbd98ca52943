"""Spectral geometric-consistency inlier scoring (ops/spectral_match)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvreg.core.metrics import rotation_error_deg
from mvreg.core.procrustes import irls_kabsch
from mvreg.core.transforms import apply_transform, random_rigid
from mvreg.ops.spectral_match import (
    compatibility_scores,
    pairwise_dist,
    spectral_filter_weights,
)


def _corr_set(seed, K, inlier_rate, noise=0.01):
    rng = np.random.default_rng(seed)
    n_in = int(K * inlier_rate)
    x = rng.uniform(-1.2, 1.2, (K, 3)).astype(np.float32)
    R, t = random_rigid(jax.random.PRNGKey(seed), ())
    y = np.array(apply_transform(R, t, jnp.asarray(x)))
    y[n_in:] = (
        rng.uniform(-1.2, 1.2, (K - n_in, 3)) @ np.asarray(R).T
        + np.asarray(t)
        + rng.normal(0, 1.0, (K - n_in, 3))
    )
    y[:n_in] += noise * rng.normal(size=(n_in, 3))
    return jnp.asarray(x), jnp.asarray(y), R, t, n_in


def test_pairwise_dist_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 3)).astype(np.float32)
    d = np.asarray(pairwise_dist(jnp.asarray(x)))
    ref = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    np.testing.assert_allclose(d, ref, atol=1e-4)


@pytest.mark.parametrize("rate", [0.05, 0.15])
def test_scores_separate_inliers(rate):
    x, y, R, t, n_in = _corr_set(1, 768, rate)
    s = np.asarray(
        compatibility_scores(x, y, jnp.ones(768, bool), sigma=0.05)
    )
    assert s[:n_in].mean() > 5 * s[n_in:].mean()


def test_rescues_low_inlier_kabsch():
    """The headline property: 5% inliers -> sub-degree pose where plain
    IRLS fails by tens of degrees."""
    x, y, R, t, n_in = _corr_set(2, 1024, 0.05)
    m = jnp.ones(1024, bool)
    R_irls, _, _ = irls_kabsch(x, y, m.astype(jnp.float32), 3, 0.05)
    w = spectral_filter_weights(x, y, m, sigma=0.05)
    R_spec, _, _ = irls_kabsch(x, y, w, 3, 0.05)
    assert float(rotation_error_deg(R_irls, R)) > 5.0
    assert float(rotation_error_deg(R_spec, R)) < 1.0


def test_mask_and_padding_invariance():
    x, y, R, t, n_in = _corr_set(3, 512, 0.2)
    m_full = jnp.ones(512, bool)
    s_full = compatibility_scores(x, y, m_full)
    # append garbage padded rows: scores of real rows must not change
    pad = 128
    xp = jnp.concatenate([x, jnp.full((pad, 3), 7.0)], axis=0)
    yp = jnp.concatenate([y, jnp.full((pad, 3), -7.0)], axis=0)
    mp = jnp.concatenate([m_full, jnp.zeros(pad, bool)])
    s_pad = compatibility_scores(xp, yp, mp)
    np.testing.assert_allclose(
        np.asarray(s_full), np.asarray(s_pad[:512]), atol=1e-4
    )
    assert float(jnp.max(s_pad[512:])) == 0.0
    # quantile gate over valid entries only
    w = spectral_filter_weights(xp, yp, mp, keep_quantile=0.5)
    assert float(jnp.max(w[512:])) == 0.0
    assert int(jnp.sum(w[:512] > 0)) <= 512


def test_jit_and_vmap():
    xs, ys = [], []
    for k in range(3):
        x, y, *_ = _corr_set(10 + k, 256, 0.2)
        xs.append(x)
        ys.append(y)
    xb, yb = jnp.stack(xs), jnp.stack(ys)
    mb = jnp.ones((3, 256), bool)
    f = jax.jit(jax.vmap(
        lambda a, b, m: spectral_filter_weights(a, b, m)
    ))
    w = f(xb, yb, mb)
    assert w.shape == (3, 256)
    assert bool(jnp.all(jnp.isfinite(w)))


@pytest.mark.slow  # 76 s compile-bound integration anchor (r4 timing);
# the op-level spectral tests above stay in the default tier, and every
# eval-harness run exercises the default-on pipeline path
def test_pipeline_spectral_default_on():
    """register_pair with match.spectral (the default) stays finite and
    solves a clean synthetic pair."""
    from mvreg.config.schema import PipelineConfig
    from mvreg.data.synthetic import make_pair
    from mvreg.pipeline import extract_descriptors, init_params, register_pair
    from mvreg.config.schema import override

    cfg = override(
        PipelineConfig(),
        **{
            "voxel.capacities": [1024, 512, 256, 128],
            "voxel.voxel_size": 0.06,
            "model.channels": [8, 16, 16, 32],
            "model.descriptor_dim": 16,
            "match.num_corr": 256,
            "filter.channels": 32,
            "filter.num_clusters": 16,
            "filter.blocks_before": 1,
            "filter.blocks_cluster": 1,
            "filter.blocks_after": 1,
        },
    )
    assert cfg.match.spectral
    params = init_params(jax.random.PRNGKey(0), cfg)
    scene = make_pair(seed=0, points_per_fragment=1024)
    desc = extract_descriptors(
        params, cfg, jnp.asarray(scene.points), jnp.asarray(scene.mask)
    )
    di = jax.tree_util.tree_map(lambda a: a[0], desc)
    dj = jax.tree_util.tree_map(lambda a: a[1], desc)
    out = register_pair(params, cfg, di, dj)
    assert np.isfinite(np.asarray(out.R)).all()
    assert abs(float(jnp.linalg.det(out.R)) - 1.0) < 1e-3
