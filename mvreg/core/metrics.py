"""Pose-error metrics.

Counterpart of the reference's `rotation_error` / `translation_error` /
`transformation_residuals` (`ref:lib/utils.py`; SURVEY.md L1, C10) and the
benchmark protocols' error definitions (SURVEY.md C17/C18).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rotation_error_rad(R_est: Array, R_gt: Array) -> Array:
    """Angular geodesic distance arccos((tr(R_estᵀ R_gt) - 1) / 2), radians."""
    tr = jnp.einsum("...ij,...ij->...", R_est, R_gt)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arccos(cos)


def rotation_error_deg(R_est: Array, R_gt: Array) -> Array:
    return jnp.rad2deg(rotation_error_rad(R_est, R_gt))


def translation_error(t_est: Array, t_gt: Array) -> Array:
    """Euclidean translation error (..., )."""
    return jnp.linalg.norm(t_est - t_gt, axis=-1)


def transformation_residuals(
    R: Array, t: Array, x: Array, y: Array
) -> Array:
    """Per-point residuals ||R x + t - y|| for x, y (..., N, 3)."""
    diff = jnp.einsum("...ij,...nj->...ni", R, x) + t[..., None, :] - y
    return jnp.linalg.norm(diff, axis=-1)


def masked_rmse(res: Array, mask: Array) -> Array:
    """RMSE of residuals (..., N) over mask (..., N) ∈ {0,1}."""
    w = mask.astype(res.dtype)
    denom = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    return jnp.sqrt(jnp.sum(w * res * res, axis=-1) / denom)


def masked_median(x: Array, mask: Array, big: float = 1e9) -> Array:
    """Median of x (..., N) restricted to mask, via sort with +inf padding.

    Exact when the number of valid entries is odd; for even counts returns
    the lower median (standard for robust residual statistics).
    """
    n = jnp.sum(mask.astype(jnp.int32), axis=-1)
    xs = jnp.sort(jnp.where(mask > 0, x, big), axis=-1)
    idx = jnp.maximum((n - 1) // 2, 0)
    return jnp.take_along_axis(xs, idx[..., None], axis=-1)[..., 0]


def ecdf_at(values: Array, thresholds: Array, valid: Array | None = None) -> Array:
    """Empirical CDF of `values` evaluated at `thresholds` (ScanNet protocol).

    Returns fraction of valid entries <= threshold, shape thresholds.shape.
    """
    v = values.reshape(-1)
    if valid is None:
        m = jnp.ones_like(v)
    else:
        m = valid.reshape(-1).astype(v.dtype)
    hits = (v[None, :] <= thresholds.reshape(-1, 1)).astype(v.dtype) * m[None, :]
    return (jnp.sum(hits, axis=1) / jnp.maximum(jnp.sum(m), 1.0)).reshape(
        thresholds.shape
    )
