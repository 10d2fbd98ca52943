"""Spectral geometric-consistency inlier scoring for correspondences.

At low inlier rates (5-20% — exactly the regime where the learned
filter + IRLS Procrustes collapses to a wrong-by-120-deg pose on real
scene graphs, see runs/results/r2_scene8_diag_cpu.json) the strongest
non-learned signal is RIGID DISTANCE PRESERVATION: for two true
correspondences (x_i, y_i), (x_j, y_j) of one rigid motion,
‖x_i − x_j‖ = ‖y_i − y_j‖ exactly. Build the pairwise compatibility
matrix

    C_ij = exp(−(‖x_i−x_j‖ − ‖y_i−y_j‖)² / (2σ²)),   C_ii = 0

and score each correspondence by the principal eigenvector of C
(Leordeanu & Hebert ICCV'05 spectral matching; the same consistency
core as SC²-PCR, CVPR'22). Inliers form a mutually-consistent clique
and dominate the eigenvector; outliers are consistent only by chance.

TPU mapping: C is one (K, K) elementwise kernel off two Gram matmuls;
the eigenvector is a few power iterations (matvecs) — all MXU/VPU work,
static shapes, vmappable over an edge batch. K=2048 → 16 MB fp32 C.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def pairwise_dist(x: Array) -> Array:
    """(K, 3) -> (K, K) Euclidean distances (one Gram matmul)."""
    # Precision.HIGHEST: see ops/icp.py — the compatibility kernel
    # compares |dx - dy| against sigma ~ 5 cm; bf16 Gram noise is larger.
    g = jnp.dot(x, x.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    sq = jnp.diagonal(g)
    d2 = sq[:, None] + sq[None, :] - 2.0 * g
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def compatibility_scores(
    x: Array,
    y: Array,
    mask: Array,
    sigma: float = 0.05,
    num_iters: int = 12,
) -> Array:
    """Principal-eigenvector inlier scores (K,) in [0, 1].

    x, y (K, 3) putative correspondence endpoints; mask (K,) validity.
    sigma: distance-consistency scale (≈ voxel size). Scores are the
    power-iterated principal eigenvector of the compatibility matrix,
    normalized to max 1.
    """
    m = mask.astype(jnp.float32)
    dx = pairwise_dist(x)
    dy = pairwise_dist(y)
    diff = dx - dy
    C = jnp.exp(-(diff * diff) / (2.0 * sigma * sigma))
    C = C * m[:, None] * m[None, :]
    C = C - jnp.diag(jnp.diagonal(C))  # zero self-compatibility

    v = m / jnp.maximum(jnp.sum(m), 1.0)

    def body(v, _):
        v = jnp.dot(C, v, preferred_element_type=jnp.float32)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        return v, None

    v, _ = jax.lax.scan(body, v, None, length=num_iters)
    v = jnp.abs(v) * m
    return v / jnp.maximum(jnp.max(v), 1e-12)


def spectral_filter_weights(
    x: Array,
    y: Array,
    mask: Array,
    sigma: float = 0.05,
    num_iters: int = 12,
    keep_quantile: float = 0.9,
) -> Array:
    """Soft inlier weights: eigenvector scores, zeroed below a quantile.

    The eigenvector separates the consistent clique from chance matches;
    the quantile gate (over VALID entries) hard-suppresses the tail so
    the downstream weighted Kabsch sees an almost-clean set.
    """
    s = compatibility_scores(x, y, mask, sigma, num_iters)
    valid = mask.astype(bool)
    # quantile over valid scores only: padded rows carry score 0
    big = jnp.where(valid, s, jnp.nan)
    thr = jnp.nanquantile(big, keep_quantile)
    thr = jnp.where(jnp.isfinite(thr), thr, 0.0)
    return jnp.where(s >= thr, s, 0.0) * mask
