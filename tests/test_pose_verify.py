"""Pose verification + overlap-scored RANSAC (ops/pose_verify.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvreg.core.metrics import rotation_error_deg
from mvreg.core.ransac import ransac_kabsch
from mvreg.core.transforms import apply_transform, random_rigid
from mvreg.ops.pose_verify import (
    overlap_score,
    ransac_overlap_candidate,
    select_best_pose,
)


def test_overlap_score_prefers_true_pose():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (512, 3)).astype(np.float32))
    R, t = random_rigid(jax.random.PRNGKey(0), ())
    y = apply_transform(R, t, x)
    m = jnp.ones(512, bool)
    s_true = float(overlap_score(R, t, x, m, y, m, tau=0.05))
    R_bad, t_bad = random_rigid(jax.random.PRNGKey(1), ())
    s_bad = float(overlap_score(R_bad, t_bad, x, m, y, m, tau=0.05))
    assert s_true > 0.95
    assert s_bad < 0.5 * s_true


def _aliased_set(seed=0, K=512, n_true=64, period=0.4):
    """Structured-outlier correspondences: a periodic 'floor' matched
    one period off (mutually rigid-consistent alias, the majority) plus
    a minority of true matches on distinctive structure."""
    rng = np.random.default_rng(seed)
    R, t = random_rigid(jax.random.PRNGKey(seed), ())
    # floor points on a rough grid
    n_floor = K - n_true
    g = rng.integers(0, 6, size=(n_floor, 2)) * period
    floor = np.column_stack([g, 0.02 * rng.normal(size=n_floor)]).astype(
        np.float32
    )
    # distinctive cluster off the floor
    uniq = (rng.uniform(0.3, 1.0, (n_true, 3)) + [0.3, 0.3, 0.6]).astype(
        np.float32
    )
    x = np.concatenate([floor, uniq]).astype(np.float32)
    y_true = np.array(apply_transform(R, t, jnp.asarray(x)))
    y = y_true.copy()
    # alias: every floor point matched one period along +x (still on the
    # floor lattice -> distances preserved within the alias clique)
    shift = np.array(
        apply_transform(R, jnp.zeros(3), jnp.asarray([[period, 0, 0]]))
    )[0] - np.array(
        apply_transform(R, jnp.zeros(3), jnp.asarray([[0.0, 0, 0]]))
    )[0]
    y[:n_floor] = y_true[:n_floor] + shift
    y[n_floor:] += 0.005 * rng.normal(size=(n_true, 3))
    return (
        jnp.asarray(x), jnp.asarray(y), R, t,
        jnp.asarray(np.concatenate([x[n_floor:]]).astype(np.float32)),
    )


def test_overlap_ransac_beats_consensus_on_structured_outliers():
    x, y, R, t, _ = _aliased_set()
    K = x.shape[0]
    m = jnp.ones(K, bool)
    # consensus RANSAC picks the alias (it has 7x the support)
    rr = ransac_kabsch(x, y, m, jax.random.PRNGKey(0),
                       num_hypotheses=512)
    err_consensus = float(rotation_error_deg(rr.R, R))
    # verification clouds: x itself vs the TRUE target cloud y_true
    y_cloud = apply_transform(R, t, x)
    R_o, t_o = ransac_overlap_candidate(
        jax.random.PRNGKey(0), x, y, m,
        x[::2], m[::2], y_cloud, m, num_hypotheses=512, tau=0.05,
    )
    err_overlap = float(rotation_error_deg(R_o, R))
    # the alias translates by one period -> consensus lands ~period off
    # in translation (rotation may agree); overlap scoring must land on
    # the true pose
    t_err_consensus = float(jnp.linalg.norm(rr.t - t))
    t_err_overlap = float(jnp.linalg.norm(t_o - t))
    assert t_err_consensus > 0.2, (t_err_consensus, err_consensus)
    # raw minimal-sample pose (pre-ICP-polish): true basin, not alias
    assert t_err_overlap < 0.15, (t_err_overlap, err_overlap)
    assert err_overlap < 3.0


def test_select_best_pose_shapes():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (128, 3)).astype(np.float32))
    R, t = random_rigid(jax.random.PRNGKey(3), ())
    y = apply_transform(R, t, x)
    m = jnp.ones(128, bool)
    R_bad, t_bad = random_rigid(jax.random.PRNGKey(4), ())
    Rb, tb, scores = select_best_pose(
        jnp.stack([R_bad, R]), jnp.stack([t_bad, t]), x, m, y, m
    )
    assert scores.shape == (2,)
    np.testing.assert_allclose(np.asarray(Rb), np.asarray(R), atol=1e-6)
