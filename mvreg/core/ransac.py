"""Vectorized RANSAC rigid-pose estimation, TPU-native.

The reference family uses sequential RANSAC (Open3D) as its classic robust
estimator baseline next to the learned filtering (SURVEY.md C17/C19 —
benchmark scripts and demo). A data-dependent hypothesis loop maps
terribly to XLA, so this is RANSAC re-designed as a *static hypothesis
batch*: all H minimal samples are drawn at once, all H closed-form
Procrustes solves run as one vmapped 4x4 eigenproblem, and scoring all
H x N residuals is a couple of batched contractions. No loop, no branch,
one compiled program — and it composes with vmap over pose-graph edges.

Complements `mvreg.core.procrustes.irls_kabsch` (differentiable, used in
training): RANSAC is the high-breakdown choice at eval time when the
putative set is overwhelmingly outliers (>70%), where IRLS from a uniform
start can converge to the wrong basin.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvreg.core.procrustes import kabsch

Array = jax.Array


class RansacResult(NamedTuple):
    R: Array  # (..., 3, 3)
    t: Array  # (..., 3)
    inliers: Array  # (..., N) bool — inlier set of the refined model
    num_inliers: Array  # (...,) int32


def _sample_indices(
    key: Array, mask: Array, num_hypotheses: int, sample_size: int
) -> Array:
    """(H, S) indices of valid rows (uniform with replacement).

    Valid-first ordering + modular draw keeps shapes static; an all-masked
    input degenerates to row 0 (caller sees 0 inliers).
    """
    n = mask.shape[0]
    order = jnp.argsort(~mask.astype(bool))  # valid rows first
    nv = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    draws = jax.random.randint(
        key, (num_hypotheses, sample_size), 0, nv, dtype=jnp.int32
    )
    return order[draws]


def ransac_kabsch(
    x: Array,
    y: Array,
    mask: Array,
    key: Array,
    num_hypotheses: int = 512,
    sample_size: int = 3,
    inlier_threshold: float = 0.075,
    refine_iters: int = 2,
) -> RansacResult:
    """Robust rigid registration of correspondences (N, 3) x 2.

    One static program: H minimal hypotheses -> batched closed-form
    Procrustes -> inlier counting -> best model -> LSQ refinement on its
    inlier set (`refine_iters` recompute-inliers/re-solve rounds).

    Degenerate minimal samples (collinear triples) produce low-scoring
    models and are never selected; an all-outlier putative set returns
    the best-effort model with its (small) inlier count for the caller
    to threshold.
    """
    N = x.shape[0]
    m = mask.astype(x.dtype)

    idx = _sample_indices(key, mask, num_hypotheses, sample_size)  # (H, S)
    xs, ys = x[idx], y[idx]  # (H, S, 3)
    w_h = jnp.ones(idx.shape, x.dtype)
    R_h, t_h = kabsch(xs, ys, w_h)  # (H, 3, 3), (H, 3)

    # Residuals of every correspondence under every hypothesis: (H, N).
    pred = jnp.einsum("hij,nj->hni", R_h, x) + t_h[:, None, :]
    r2 = jnp.sum((pred - y) ** 2, axis=-1)
    thr2 = inlier_threshold * inlier_threshold
    inl = (r2 < thr2) & mask.astype(bool)[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    R, t = R_h[best], t_h[best]

    # Iterative refinement: weighted LSQ on the current inlier set.
    def refine(carry, _):
        R, t = carry
        pred = jnp.einsum("ij,nj->ni", R, x) + t
        r2 = jnp.sum((pred - y) ** 2, axis=-1)
        w = ((r2 < thr2).astype(x.dtype)) * m
        # Guard: an empty inlier set keeps the previous model (weights all
        # zero would make kabsch see only the 1e-12 clamp).
        ok = jnp.sum(w) >= 3
        R2, t2 = kabsch(x, y, jnp.where(ok, w, m + 1e-6))
        R2 = jnp.where(ok, R2, R)
        t2 = jnp.where(ok, t2, t)
        return (R2, t2), None

    (R, t), _ = jax.lax.scan(refine, (R, t), None, length=refine_iters)

    pred = jnp.einsum("ij,nj->ni", R, x) + t
    r2 = jnp.sum((pred - y) ** 2, axis=-1)
    inliers = (r2 < thr2) & mask.astype(bool)
    return RansacResult(
        R=R, t=t, inliers=inliers,
        num_inliers=jnp.sum(inliers.astype(jnp.int32)),
    )
