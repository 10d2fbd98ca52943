"""Symmetric eigendecomposition with a degenerate-spectrum-safe backward.

The reference differentiates `torch.symeig` through the synchronization
layer (`ref:lib/synchronization.py`; SURVEY.md C7, §7 hard-part 3); the
standard eigh VJP has 1/(λi - λj) factors that explode when the spectrum
clusters — which happens *by construction* for a consistent pose graph (the
connection Laplacian has a 3-fold degenerate null space). This wrapper
clamps those denominators so training-through-sync stays finite; at exact
degeneracy the gradient is a subgradient of the (non-unique) eigenbasis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.custom_vjp
def eigh_safe(A: Array) -> tuple[Array, Array]:
    """Like jnp.linalg.eigh (ascending eigenvalues) with clamped backward."""
    w, V = jnp.linalg.eigh(A)
    return w, V


def _fwd(A):
    w, V = jnp.linalg.eigh(A)
    return (w, V), (w, V)


def _bwd(res, g):
    w, V = res
    gw, gV = g
    n = w.shape[-1]
    # F_ij = 1 / (w_j - w_i) off-diagonal, clamped; 0 on the diagonal.
    dw = w[..., None, :] - w[..., :, None]
    sign = jnp.where(dw >= 0, 1.0, -1.0)
    F = sign / jnp.maximum(jnp.abs(dw), 1e-6)
    F = F * (1.0 - jnp.eye(n, dtype=w.dtype))
    VtgV = jnp.swapaxes(V, -1, -2) @ gV
    core = gw[..., :, None] * jnp.eye(n, dtype=w.dtype) + F * VtgV
    dA = V @ core @ jnp.swapaxes(V, -1, -2)
    # Project to symmetric (input space is symmetric matrices).
    dA = 0.5 * (dA + jnp.swapaxes(dA, -1, -2))
    return (dA,)


eigh_safe.defvjp(_fwd, _bwd)
