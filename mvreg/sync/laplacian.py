"""Pose-graph Laplacian assembly for transformation synchronization.

Counterpart of the Laplacian/System construction inside
`ref:lib/synchronization.py::transformation_synchronization` (SURVEY.md C7).
The reference assembles these on host NumPy; here assembly is pure XLA
scatter-adds over a static-capacity edge list, so it jits, vmaps over
scenes, differentiates, and — for large graphs — shards over an `edge`
mesh axis with a `psum` of the per-node blocks (see mvreg/parallel).

Edge-list convention (static shapes, padded edges carry weight 0):
  edge_idx: (E, 2) int32 — (i, j), i != j, referencing N nodes
  R_ij:     (E, 3, 3)    — rotation of the measured T_ij (frame i -> j)
  t_ij:     (E, 3)
  c:        (E,)         — nonnegative edge weights (0 = pruned/padded)

Pose conventions: absolute pose T_i maps frame i to world; a consistent
graph satisfies R_ij = R_jᵀ R_i and t_ij = R_jᵀ (t_i - t_j).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def connection_laplacian(
    edge_idx: Array, R_ij: Array, c: Array, n_nodes: int
) -> Array:
    """Weighted SO(3) connection Laplacian, (3N, 3N).

    Minimizing tr(Zᵀ L Z) over Z = [R_1ᵀ; ...; R_Nᵀ] (3N, 3) encodes
    Σ c_ij ||R_i - R_j R_ij||²_F, so the 3 smallest eigenvectors of L carry
    the synchronized rotations. Blocks:
      L[i, i] += c_ij I,  L[j, j] += c_ij I
      L[i, j] -= c_ij R_ijᵀ,  L[j, i] -= c_ij R_ij
    """
    i, j = edge_idx[:, 0], edge_idx[:, 1]
    cR = c[:, None, None] * R_ij
    blocks = jnp.zeros((n_nodes, n_nodes, 3, 3), dtype=R_ij.dtype)
    eye = jnp.eye(3, dtype=R_ij.dtype)
    blocks = blocks.at[i, i].add(c[:, None, None] * eye)
    blocks = blocks.at[j, j].add(c[:, None, None] * eye)
    blocks = blocks.at[i, j].add(-jnp.swapaxes(cR, -1, -2))
    blocks = blocks.at[j, i].add(-cR)
    return blocks.transpose(0, 2, 1, 3).reshape(3 * n_nodes, 3 * n_nodes)


def graph_laplacian(edge_idx: Array, c: Array, n_nodes: int) -> Array:
    """Scalar weighted graph Laplacian (N, N) for translation sync."""
    i, j = edge_idx[:, 0], edge_idx[:, 1]
    L = jnp.zeros((n_nodes, n_nodes), dtype=c.dtype)
    L = L.at[i, i].add(c)
    L = L.at[j, j].add(c)
    L = L.at[i, j].add(-c)
    L = L.at[j, i].add(-c)
    return L


def translation_rhs(
    edge_idx: Array, R_nodes: Array, t_ij: Array, c: Array, n_nodes: int
) -> Array:
    """Right-hand side b (N, 3) of the translation normal equations.

    With rotations fixed, each edge contributes the linear residual
    t_i - t_j - R_j t_ij; stationarity gives (L ⊗ I₃) t = b with
    b_i += c_ij R_j t_ij and b_j -= c_ij R_j t_ij.
    """
    i, j = edge_idx[:, 0], edge_idx[:, 1]
    rhs_e = c[:, None] * jnp.einsum("eab,eb->ea", R_nodes[j], t_ij)
    b = jnp.zeros((n_nodes, 3), dtype=t_ij.dtype)
    b = b.at[i].add(rhs_e)
    b = b.at[j].add(-rhs_e)
    return b
