"""Edge-sharded distributed transformation synchronization.

The driver-mandated multi-host path [B:configs[4], B:north_star:
"distributed pose-graph synchronization ... psum/all_gather of 4x4 edge
measurements and Laplacian blocks"]; SURVEY.md §2.4/§5.7-8. The reference
has no distributed code at all — its sync runs on one host's LAPACK.

Design (the scaling-book recipe, applied to pose graphs):
  * The edge list — measurements (R_ij, t_ij), confidences, residuals —
    is sharded over the mesh's `edge` axis: every device owns E/D edges.
    Pairwise registration upstream is embarrassingly parallel over the
    same sharding.
  * Each IRLS iteration assembles *partial* Laplacian blocks and RHS from
    local edges only (XLA scatter-adds), then one `psum` over the edge
    axis yields the full (3N,3N) connection Laplacian and (N,3) RHS on
    every device — the collective moves O(N²) block data over ICI, never
    the O(E) edge set.
  * The small spectral solves (eigh of 3Nx3N, solve of NxN) are computed
    redundantly on every device (cheap, keeps everything SPMD).
  * Reweighting is edge-local again. No host round-trip anywhere.

Numerical invariant (tested): edge-sharded == single-host to float
tolerance, any device count that divides E.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mvreg.parallel.mesh import EDGE_AXIS
from mvreg.sync.irls import (
    SyncResult,
    consistency_residuals_split,
    rotation_sync_from_laplacian,
    translation_solve,
)
from mvreg.sync.laplacian import (
    connection_laplacian,
    graph_laplacian,
    translation_rhs,
)

Array = jax.Array


def sync_body_local(
    eidx_l: Array,
    R_l: Array,
    t_l: Array,
    c0_l: Array,
    *,
    n_nodes: int,
    num_edges: int,
    num_iters: int,
    cauchy_b: float,
    trans_scale: float,
    cauchy_b_trans: float = 0.15,
):
    """Edge-local IRLS sync body for use INSIDE a shard_map over EDGE_AXIS.

    Assembles partial Laplacian/RHS from the local edge shard, psums over
    the edge axis, solves the (replicated) spectral/linear systems, and
    reweights locally. Returns (R_nodes, t_nodes, c_final_l, r_l) with the
    node results replicated and the per-edge results local. Shared by the
    standalone sharded sync (make_sync_fn) and the sharded scene
    registration (mvreg/parallel/dist_scene.py).
    """
    c0_l = jnp.maximum(c0_l, 0.0)

    def assemble(c_l):
        L_part = connection_laplacian(eidx_l, R_l, c_l, n_nodes)
        Lt_part = graph_laplacian(eidx_l, c_l, n_nodes)
        csum_part = jnp.sum(jnp.abs(c_l))
        L, Lt, csum = jax.lax.psum(
            (L_part, Lt_part, csum_part), EDGE_AXIS
        )
        return L, Lt, csum / num_edges

    def _tsolve(c_l, R_nodes):
        Lt_part = graph_laplacian(eidx_l, c_l, n_nodes)
        b_part = translation_rhs(eidx_l, R_nodes, t_l, c_l, n_nodes)
        csum_part = jnp.sum(jnp.abs(c_l))
        Lt, b, csum = jax.lax.psum(
            (Lt_part, b_part, csum_part), EDGE_AXIS
        )
        return translation_solve(Lt, b, csum / num_edges)

    def step(c_l, _):
        L, Lt, c_scale = assemble(c_l)
        R_nodes = rotation_sync_from_laplacian(L, n_nodes)
        b_part = translation_rhs(eidx_l, R_nodes, t_l, c_l, n_nodes)
        b = jax.lax.psum(b_part, EDGE_AXIS)
        t_nodes = translation_solve(Lt, b, c_scale)
        # second translation pass with translation-specific robust
        # weights (mirrors sync/irls.synchronize exactly — slid-alias
        # edges have good rotation but poisoned translation)
        _, r_tr = consistency_residuals_split(
            eidx_l, R_l, t_l, R_nodes, t_nodes, trans_scale
        )
        c_tr = c0_l / (1.0 + (r_tr / cauchy_b_trans) ** 2)
        c_tr = c_tr * (c_l > 0)
        t_nodes = _tsolve(c_tr, R_nodes)
        r_rot, r_tr = consistency_residuals_split(
            eidx_l, R_l, t_l, R_nodes, t_nodes, trans_scale
        )
        r_l = r_rot + r_tr
        c_new = c0_l / (1.0 + (r_l / cauchy_b) ** 2)
        return c_new, (R_nodes, t_nodes, r_l)

    c_final, (Rs, ts, rs) = jax.lax.scan(step, c0_l, None, length=num_iters)
    return Rs[-1], ts[-1], c_final, rs[-1]


def make_sync_fn(
    mesh: Mesh,
    n_nodes: int,
    num_edges: int,
    num_iters: int = 4,
    cauchy_b: float = 0.5,
    trans_scale: float = 1.0,
    cauchy_b_trans: float = 0.15,
):
    """Build the jitted edge-sharded sync over `mesh`.

    Returned fn takes GLOBAL arrays (edge_idx, R_ij, t_ij, c_init) already
    placed with an edge sharding — jax.device_put in the single-controller
    case, or jax.make_array_from_process_local_data across hosts
    (mvreg/parallel/multihost.py) — and returns (R, t, weights, residuals).
    """
    E = num_edges
    n_dev = mesh.shape[EDGE_AXIS]
    assert E % n_dev == 0, f"edge count {E} not divisible by {n_dev} devices"

    espec = P(EDGE_AXIS)
    rspec = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(espec, espec, espec, espec),
        out_specs=(rspec, rspec, espec, espec),
        check_vma=False,
    )
    def _run(eidx_l, R_l, t_l, c0_l):
        return sync_body_local(
            eidx_l, R_l, t_l, c0_l,
            n_nodes=n_nodes, num_edges=E, num_iters=num_iters,
            cauchy_b=cauchy_b, trans_scale=trans_scale,
            cauchy_b_trans=cauchy_b_trans,
        )

    return jax.jit(_run)


def synchronize_sharded(
    mesh: Mesh,
    edge_idx: Array,
    R_ij: Array,
    t_ij: Array,
    c_init: Array,
    n_nodes: int,
    num_iters: int = 4,
    cauchy_b: float = 0.5,
    trans_scale: float = 1.0,
    cauchy_b_trans: float = 0.15,
) -> SyncResult:
    """Single-controller convenience wrapper: place + run the sharded sync.

    Inputs are global arrays (padded edges carry c_init == 0); E must be
    divisible by the edge-axis size.
    """
    fn = make_sync_fn(
        mesh, n_nodes, edge_idx.shape[0], num_iters, cauchy_b, trans_scale,
        cauchy_b_trans,
    )
    sharding = NamedSharding(mesh, P(EDGE_AXIS))
    args = [
        jax.device_put(x, sharding) for x in (edge_idx, R_ij, t_ij, c_init)
    ]
    R, t, w, r = fn(*args)
    return SyncResult(R=R, t=t, weights=w, residuals=r)
