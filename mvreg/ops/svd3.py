"""Batched 3x3 SVD / symmetric eigendecomposition, TPU-first.

The reference leans on cuSOLVER/MAGMA batched SVD through `torch.svd`
(`ref:lib/utils.py::kabsch_transformation_estimation`; SURVEY.md C5, §2.3).
On TPU we instead use a branch-free cyclic-Jacobi eigendecomposition of
AᵀA with a fixed unrolled sweep count: every operation is elementwise or a
3x3 matmul, so a (B, 3, 3) batch maps onto the VPU with no host fallback,
no dynamic control flow, and full `vmap`/`grad` support.

Public API:
  eigh3x3(B)       -> (eigvals desc, eigvecs) for symmetric B (..., 3, 3)
  svd3(A)          -> (U, s, Vt) with s sorted descending, s >= 0 except
                      possibly s[-1] < 0 is never returned — reflections are
                      expressed through U's third column sign.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_JACOBI_SWEEPS = 6  # 3 rotations per sweep; 6 sweeps reaches fp32 roundoff.


def _jacobi_rotation(B: Array, V: Array, p: int, q: int) -> tuple[Array, Array]:
    """One batched Jacobi rotation zeroing B[p, q], branch-free."""
    bpp = B[..., p, p]
    bqq = B[..., q, q]
    bpq = B[..., p, q]
    # theta = 0.5 * atan2(2 b_pq, b_qq - b_pp); atan2(0, 0) == 0 so the
    # already-diagonal case degrades to the identity rotation.
    theta = 0.5 * jnp.arctan2(2.0 * bpq, bqq - bpp)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    # Build the Givens matrix G(p, q, theta) for this static (p, q).
    eye = jnp.zeros(B.shape[:-2] + (3, 3), B.dtype) + jnp.eye(3, dtype=B.dtype)
    G = eye.at[..., p, p].set(c)
    G = G.at[..., q, q].set(c)
    G = G.at[..., p, q].set(s)
    G = G.at[..., q, p].set(-s)
    Gt = jnp.swapaxes(G, -1, -2)
    return Gt @ B @ G, V @ G


def eigh3x3(B: Array, sweeps: int = _JACOBI_SWEEPS) -> tuple[Array, Array]:
    """Symmetric eigendecomposition of (..., 3, 3), eigvals sorted descending.

    Returns (w, V) with B ≈ V diag(w) Vᵀ, V orthogonal (det +1 not enforced).
    """
    V = jnp.zeros_like(B) + jnp.eye(3, dtype=B.dtype)
    # Symmetrize defensively; Jacobi assumes exact symmetry.
    B = 0.5 * (B + jnp.swapaxes(B, -1, -2))
    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            B, V = _jacobi_rotation(B, V, p, q)
    w = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    order = jnp.argsort(-w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def _safe_normalize(v: Array, eps: float) -> tuple[Array, Array]:
    """Returns (v / ||v||, ||v||) with zero-safe division."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps), n[..., 0]


def _orthogonal_to(u: Array) -> Array:
    """A unit vector orthogonal to unit u, branch-free.

    Crosses u with the basis vector least aligned with it.
    """
    a = jnp.abs(u)
    idx = jnp.argmin(a, axis=-1)
    basis = jnp.eye(3, dtype=u.dtype)[idx]
    v = jnp.cross(u, basis)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, 1e-20)


def svd3(A: Array, eps: float = 1e-12) -> tuple[Array, Array, Array]:
    """Batched SVD of (..., 3, 3): A = U @ diag(s) @ Vt.

    s is sorted descending and non-negative. Reflections (det A < 0) carry
    their sign in U's last column, matching LAPACK convention. Degenerate
    (rank-deficient) inputs get a valid orthonormal completion of U.
    """
    B = jnp.swapaxes(A, -1, -2) @ A
    w, V = eigh3x3(B)
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    AV = A @ V  # columns: s_i * u_i
    # u0: dominant left vector, identity fallback for A ≈ 0.
    u0, n0 = _safe_normalize(AV[..., :, 0], eps)
    u0 = jnp.where(
        (n0 > eps)[..., None], u0, jnp.array([1.0, 0.0, 0.0], dtype=A.dtype)
    )
    # u1: orthogonalize A v1 against u0, fallback to any orthogonal vector.
    av1 = AV[..., :, 1]
    av1 = av1 - jnp.sum(av1 * u0, axis=-1, keepdims=True) * u0
    u1, n1 = _safe_normalize(av1, eps)
    u1 = jnp.where((n1 > eps)[..., None], u1, _orthogonal_to(u0))
    # u2: completes the frame; its sign carries det(A).
    u2 = jnp.cross(u0, u1)
    sign2 = jnp.sign(jnp.sum(u2 * AV[..., :, 2], axis=-1))
    sign2 = jnp.where(sign2 == 0, 1.0, sign2)
    u2 = u2 * sign2[..., None]
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, s, jnp.swapaxes(V, -1, -2)
