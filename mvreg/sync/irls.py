"""IRLS spectral transformation synchronization, fully on-device.

Counterpart of `ref:lib/synchronization.py::transformation_synchronization`
(SURVEY.md C7, call stack §3.3): given pairwise pose measurements
{T̂_ij, c_ij} on a graph of N fragments, produce globally consistent
absolute poses {T_i} by iterating
  (a) spectral rotation sync  — 3 smallest eigenvectors of the weighted
      connection Laplacian, blocks projected to SO(3);
  (b) translation sync        — linear least squares on the graph
      Laplacian with the gauge fixed by a mean-translation penalty;
  (c) Cauchy reweighting      — c_e <- c⁰_e / (1 + (r_e / b)²) from the
      consistency residual of T̂_ij against the current absolute poses.

The reference runs this on host LAPACK (CPU `eigh`, breaking the
GPU-resident pipeline; SURVEY.md §3.1); here every step is XLA on-device,
the loop is a `lax.scan` with static iteration count, and gradients flow
through `eigh_safe` (clamped backward — the Laplacian's null space is
3-fold degenerate by construction).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvreg.core.procrustes import so3_project
from mvreg.core.transforms import relative
from mvreg.ops.eigh_safe import eigh_safe
from mvreg.sync.laplacian import (
    connection_laplacian,
    graph_laplacian,
    translation_rhs,
)

Array = jax.Array


class SyncResult(NamedTuple):
    R: Array  # (N, 3, 3) absolute rotations (world frame is gauge-arbitrary)
    t: Array  # (N, 3) absolute translations
    weights: Array  # (E,) final IRLS edge weights
    residuals: Array  # (E,) final per-edge consistency residuals


def rotation_sync_from_laplacian(L: Array, n_nodes: int) -> Array:
    """Spectral rotation sync from an assembled (3N, 3N) Laplacian.

    Split out so the distributed path (edge-sharded partial assembly +
    psum; mvreg/parallel/dist_sync.py) can share the spectral step.
    """
    # Small diagonal shift: shifts the whole spectrum, leaves eigenvectors
    # unchanged, and keeps eigh well behaved if some node is isolated.
    L = L + 1e-6 * jnp.eye(3 * n_nodes, dtype=L.dtype)
    _, V = eigh_safe(L)
    U = V[:, :3]  # 3 smallest eigenvectors, (3N, 3)
    blocks = U.reshape(n_nodes, 3, 3)  # row-block i ≈ R_iᵀ Q for a gauge Q
    # A single eigenvector column sign flip toggles det of *all* blocks at
    # once; align so blocks are near SO(3) rather than O(3)\SO(3).
    mean_det = jnp.mean(jnp.linalg.det(blocks))
    U = U * jnp.where(mean_det < 0, jnp.array([1.0, 1.0, -1.0]), 1.0)
    blocks = U.reshape(n_nodes, 3, 3)
    return so3_project(jnp.swapaxes(blocks, -1, -2))


def rotation_sync(
    edge_idx: Array, R_ij: Array, c: Array, n_nodes: int
) -> Array:
    """Spectral rotation synchronization -> (N, 3, 3) absolute rotations."""
    L = connection_laplacian(edge_idx, R_ij, c, n_nodes)
    return rotation_sync_from_laplacian(L, n_nodes)


def translation_solve(L: Array, b: Array, c_scale: Array) -> Array:
    """Solve the gauge-fixed translation system from assembled (L, b).

    Shared by the single-host and edge-sharded paths. `c_scale` is a
    scalar weight scale (mean |c|) used to condition the gauge term.
    """
    n_nodes = L.shape[0]
    mean_c = jnp.maximum(c_scale, 1e-8)
    gauge = mean_c * jnp.ones((n_nodes, n_nodes), dtype=L.dtype) / n_nodes
    A = L + gauge + 1e-6 * mean_c * jnp.eye(n_nodes, dtype=L.dtype)
    t = jnp.linalg.solve(A, b)
    return t - jnp.mean(t, axis=0, keepdims=True)


def translation_sync(
    edge_idx: Array, R_nodes: Array, t_ij: Array, c: Array, n_nodes: int
) -> Array:
    """Least-squares translation sync given rotations -> (N, 3).

    Solves (L + gauge) t = b where the rank-1 gauge term (penalizing the
    mean translation) makes the system positive definite for a connected
    graph, so plain Cholesky-backed `solve` works and differentiates.
    """
    L = graph_laplacian(edge_idx, c, n_nodes)
    b = translation_rhs(edge_idx, R_nodes, t_ij, c, n_nodes)
    return translation_solve(L, b, jnp.mean(jnp.abs(c)))


def consistency_residuals(
    edge_idx: Array,
    R_ij: Array,
    t_ij: Array,
    R_nodes: Array,
    t_nodes: Array,
    trans_scale: float = 1.0,
) -> Array:
    """Per-edge residual of measurement vs synced poses.

    r_e = ||R̂_ij - R_jᵀR_i||_F + ||t̂_ij - R_jᵀ(t_i - t_j)|| / trans_scale
    (the reference's combined rotation+translation consistency residual,
    paper §3.3).
    """
    i, j = edge_idx[:, 0], edge_idx[:, 1]
    R_pred, t_pred = relative(R_nodes[i], t_nodes[i], R_nodes[j], t_nodes[j])
    r_rot = jnp.linalg.norm(
        (R_ij - R_pred).reshape(R_ij.shape[0], 9), axis=-1
    )
    r_tr = jnp.linalg.norm(t_ij - t_pred, axis=-1) / trans_scale
    return r_rot + r_tr


def synchronize(
    edge_idx: Array,
    R_ij: Array,
    t_ij: Array,
    c_init: Array,
    n_nodes: int,
    num_iters: int = 4,
    cauchy_b: float = 0.5,
    trans_scale: float = 1.0,
) -> SyncResult:
    """IRLS transformation synchronization (jit/vmap/grad-safe).

    Args:
      edge_idx, R_ij, t_ij: pairwise measurements (padded edges: c_init 0).
      c_init: initial edge confidences (from the confidence head, C6).
      n_nodes: static fragment count N.
      num_iters: IRLS iterations (reference uses ~4).
      cauchy_b: Cauchy kernel scale for reweighting.
    """
    c0 = jnp.maximum(c_init, 0.0)

    def step(c, _):
        R_nodes = rotation_sync(edge_idx, R_ij, c, n_nodes)
        t_nodes = translation_sync(edge_idx, R_nodes, t_ij, c, n_nodes)
        r = consistency_residuals(
            edge_idx, R_ij, t_ij, R_nodes, t_nodes, trans_scale
        )
        c_new = c0 / (1.0 + (r / cauchy_b) ** 2)
        return c_new, (R_nodes, t_nodes, r)

    c_final, (Rs, ts, rs) = jax.lax.scan(step, c0, None, length=num_iters)
    return SyncResult(R=Rs[-1], t=ts[-1], weights=c_final, residuals=rs[-1])
