"""Differentiable weighted Procrustes / Kabsch, TPU-native.

Counterpart of `ref:lib/utils.py::kabsch_transformation_estimation`
(SURVEY.md C5): given weighted correspondences (x_i, y_i, w_i) estimate the
rigid (R, t) minimizing Σ w_i ||R x_i + t - y_i||².

TPU-first design choice: instead of differentiating through a general SVD
(whose backward has 1/(s_i² - s_j²) terms that blow up on the isotropic
point sets that are *common* in clean registration), we solve Wahba's
problem in quaternion form (Horn 1987): the optimal rotation is the top
eigenvector of a symmetric 4x4 matrix K(H) built linearly from the 3x3
cross-covariance H. The custom VJP differentiates the eigenvector with
clamped spectral-gap denominators — stable wherever the optimal rotation is
well-defined, and automatically returns a *proper* rotation (no det
correction branch). The whole solve is closed-form 4x4 math, `vmap`s over
thousands of pose-graph edges, and never leaves the device (the reference
runs SVD on cuSOLVER and sync eigs on host LAPACK; SURVEY.md §3.1/§3.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvreg.core.transforms import quat_to_rotmat

Array = jax.Array


def _quat_matrix(H: Array) -> Array:
    """Linear map H (..., 3, 3) -> Horn's symmetric K (..., 4, 4).

    With H_ab = Σ w x̄_a ȳ_b, the unit quaternion maximizing qᵀKq is the
    rotation with ȳ ≈ R x̄ (verified convention; see tests).
    """
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    row0 = jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1)
    row1 = jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1)
    row2 = jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1)
    row3 = jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


@jax.custom_vjp
def wahba_quaternion(H: Array) -> Array:
    """Optimal rotation quaternion (w, x, y, z) for cross-covariance H.

    Differentiable with a spectral-gap-clamped backward; q and -q encode the
    same rotation, so the sign canonicalization (w >= 0) is gradient-exempt.
    """
    q, _, _ = _wahba_fwd_impl(H)
    return q


def _wahba_fwd_impl(H: Array):
    K = _quat_matrix(H)
    lam, V = jnp.linalg.eigh(K)  # ascending
    q = V[..., :, -1]
    sign = jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q * sign, (lam, V * sign[..., None, :]), K


def _wahba_fwd(H):
    q, (lam, V), _ = _wahba_fwd_impl(H)
    return q, (H, lam, V)


def _wahba_bwd(res, g):
    H, lam, V = res
    # dq/dK via first-order eigenvector perturbation:
    #   dq = Σ_{i<n} v_i v_iᵀ dK q / (λ_n - λ_i)
    # so  dL/dK = Σ_{i<n} (v_iᵀ g) / (λ_n - λ_i) · v_i qᵀ, symmetrized.
    lam_n = lam[..., -1:]
    gap = lam_n - lam  # (..., 4); last entry 0
    inv_gap = jnp.where(
        jnp.arange(lam.shape[-1]) == lam.shape[-1] - 1,
        0.0,
        1.0 / jnp.maximum(gap, 1e-6),
    )
    q = V[..., :, -1]
    coef = jnp.einsum("...ki,...k->...i", V, g) * inv_gap  # (v_iᵀ g)/gap_i
    M = jnp.einsum("...ki,...i,...l->...kl", V, coef, q)
    dK = 0.5 * (M + jnp.swapaxes(M, -1, -2))
    # K(H) is linear; pull dK back through it.
    _, vjp_fn = jax.vjp(_quat_matrix, H)
    (dH,) = vjp_fn(dK)
    return (dH,)


wahba_quaternion.defvjp(_wahba_fwd, _wahba_bwd)


def cross_covariance(
    x: Array, y: Array, w: Array
) -> tuple[Array, Array, Array]:
    """Weighted cross-covariance H = Σ wᵢ x̄ᵢ ȳᵢᵀ and centroids (μx, μy).

    x, y: (..., N, 3); w: (..., N) nonnegative weights (zero = ignored, so
    padding masks fold directly into w).
    """
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    wn = w / wsum
    mu_x = jnp.einsum("...n,...ni->...i", wn, x)
    mu_y = jnp.einsum("...n,...ni->...i", wn, y)
    xc = x - mu_x[..., None, :]
    yc = y - mu_y[..., None, :]
    H = jnp.einsum("...n,...na,...nb->...ab", wn, xc, yc)
    return H, mu_x, mu_y


def kabsch(
    x: Array, y: Array, w: Array
) -> tuple[Array, Array]:
    """Weighted Procrustes: (R, t) minimizing Σ wᵢ ||R xᵢ + t - yᵢ||².

    Batched over leading dims; fully differentiable in x, y, w. Padding is
    handled by zero weights.
    """
    H, mu_x, mu_y = cross_covariance(x, y, w)
    q = wahba_quaternion(H)
    R = quat_to_rotmat(q)
    t = mu_y - jnp.einsum("...ij,...j->...i", R, mu_x)
    return R, t


def irls_kabsch(
    x: Array,
    y: Array,
    w0: Array,
    num_iters: int = 3,
    scale: float = 0.05,
) -> tuple[Array, Array, Array]:
    """Robust weighted Procrustes via Cauchy-IRLS reweighting.

    The TPU-native replacement for per-pair RANSAC (the reference's robust
    alternative; [B:north_star] "per-pair RANSAC/weighted-Procrustes →
    batched vmapped SVD"): RANSAC's data-dependent hypothesis loop maps
    terribly to XLA, while a fixed small number of closed-form re-solves
    is branch-free, batched, and differentiable. Each iteration solves
    weighted Kabsch, then shrinks weights by a Cauchy kernel of the
    point residual at `scale` (meters).

    Returns (R, t, final_weights). Zero rows of w0 stay zero (padding).
    """
    def step(carry, _):
        w, _, _ = carry
        R, t = kabsch(x, y, w)
        diff = jnp.einsum("...ij,...nj->...ni", R, x) + t[..., None, :] - y
        r2 = jnp.sum(diff * diff, axis=-1)
        w_new = w0 / (1.0 + r2 / (scale * scale))
        return (w_new, R, t), None

    R0, t0 = kabsch(x, y, w0)
    (w, R, t), _ = jax.lax.scan(
        step, (w0, R0, t0), None, length=num_iters
    )
    return R, t, w


def so3_project(M: Array) -> Array:
    """Nearest rotation (Frobenius) to M (..., 3, 3), always det +1.

    argmin_R ||R - M||_F = argmax_R tr(RᵀM) = Wahba with H = Mᵀ. Used by the
    synchronization layer to project averaged rotation blocks back to SO(3)
    (SURVEY.md C7) — replaces the reference's per-block SVD + det fixup.
    """
    return quat_to_rotmat(wahba_quaternion(jnp.swapaxes(M, -1, -2)))
