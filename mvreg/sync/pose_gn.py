"""Global robust pose-graph Gauss-Newton over raw correspondences.

Why this exists (round-2 diagnosis, RESULTS.md): after IRLS sync +
pairwise refinement + per-node scene-ICP, 30-fragment scenes keep a
*collectively warped* translation solution — neighboring fragments are
mutually consistent, so any per-edge or per-node local step is already
at its optimum, yet long graph cycles carry correlated drift
(trans-ECDF@75cm stalled at 45% vs the >=70% target). The sync layer
only ever sees per-edge POSE SUMMARIES (R_ij, t_ij); once those are
locally consistent it cannot see the warp either.

The fix is a joint second-order solve over all N node poses that goes
back to the VERIFIED CORRESPONDENCES themselves (the reference has no
equivalent; its pipeline stops at sync — SURVEY.md §3.3). Each kept
correspondence (x in frame i, y in frame j) contributes the residual

    r = (R_i x + t_i) - (R_j y + t_j)        in world coordinates,

a constraint that couples nodes across every edge of the graph
simultaneously — mid- and long-range edges act as loop closures, which
is exactly the information a collective warp violates.

TPU-native design: the normal system is assembled with dense einsums
over the static (E, K) correspondence set (MXU work), scattered into a
(6N, 6N) block matrix (XLA scatter-add), and solved in one small dense
LU on device; the whole optimization is a fixed-length `lax.scan` with
Cauchy IRLS reweighting — jit/vmap/grad-safe. The assembly is linear in
edges, so the edge-sharded path (parallel/dist_scene) computes partial
(H, g) from its local shard and psums — the same collective pattern as
the Laplacian assembly in parallel/dist_sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvreg.core.procrustes import so3_project
from mvreg.sync.irls import SyncResult

Array = jax.Array


def _skew(v: Array) -> Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix [v]x."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


def _exp_so3(w: Array) -> Array:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 1e-12)
    k = w / theta
    K = _skew(k)
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + jnp.sin(th) * K + (1.0 - jnp.cos(th)) * (K @ K)


def assemble_normal_system(
    edge_idx: Array,
    x: Array,
    y: Array,
    w_base: Array,
    R: Array,
    t: Array,
    n_nodes: int,
    scale: float,
) -> tuple[Array, Array]:
    """One GN linearization: (H (N,N,6,6), g (N,6)) at poses (R, t).

    Per-node parameterization is (w, dt) with R_i <- Exp(w_i) R_i,
    t_i <- t_i + dt_i; Jacobians of r w.r.t. (w_i, dt_i, w_j, dt_j) are
    (-[R_i x]x, I, [R_j y]x, -I). Linear in edges: partial sums from an
    edge shard psum to the global system (used by parallel/dist_scene).
    """
    i_idx, j_idx = edge_idx[:, 0], edge_idx[:, 1]
    Ri, ti = R[i_idx], t[i_idx]
    Rj, tj = R[j_idx], t[j_idx]
    a = jnp.einsum("eab,ekb->eka", Ri, x)  # R_i x   (E, K, 3)
    b = jnp.einsum("eab,ekb->eka", Rj, y)  # R_j y
    r = (a + ti[:, None, :]) - (b + tj[:, None, :])  # (E, K, 3)
    rn2 = jnp.sum(r * r, axis=-1)
    w = w_base / (1.0 + rn2 / (scale * scale))  # Cauchy IRLS (E, K)

    A = -_skew(a)  # dr/dw_i  (E, K, 3, 3)
    B = _skew(b)   # dr/dw_j

    def wsum(lhs, rhs):  # sum_k w * lhs^T rhs -> (E, 3, 3)
        return jnp.einsum("ek,ekab,ekac->ebc", w, lhs, rhs)

    def wvec(lhs, vec):  # sum_k w * lhs^T vec -> (E, 3)
        return jnp.einsum("ek,ekab,eka->eb", w, lhs, vec)

    sw = jnp.sum(w, axis=-1)  # (E,)
    eyeE = sw[:, None, None] * jnp.eye(3, dtype=w.dtype)
    AtA = wsum(A, A)
    BtB = wsum(B, B)
    AtB = wsum(A, B)
    At = jnp.einsum("ek,ekab->eba", w, A)  # sum w A^T  (E, 3, 3)
    Bt = jnp.einsum("ek,ekab->eba", w, B)
    Atr = wvec(A, r)
    Btr = wvec(B, r)
    swr = jnp.einsum("ek,eka->ea", w, r)

    def blk(m00, m01, m10, m11):
        top = jnp.concatenate([m00, m01], axis=-1)
        bot = jnp.concatenate([m10, m11], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)  # (E, 6, 6)

    H = jnp.zeros((n_nodes, n_nodes, 6, 6), jnp.float32)
    g = jnp.zeros((n_nodes, 6), jnp.float32)
    H = H.at[i_idx, i_idx].add(
        blk(AtA, At, jnp.swapaxes(At, -1, -2), eyeE)
    )
    H = H.at[j_idx, j_idx].add(
        blk(BtB, -Bt, -jnp.swapaxes(Bt, -1, -2), eyeE)
    )
    # off-diagonal (i, j): [[sum wA^TB, -sum wA^T], [sum wB, -sum w I]]
    Hij = blk(AtB, -At, jnp.swapaxes(Bt, -1, -2), -eyeE)
    H = H.at[i_idx, j_idx].add(Hij)
    H = H.at[j_idx, i_idx].add(jnp.swapaxes(Hij, -1, -2))
    g = g.at[i_idx].add(jnp.concatenate([Atr, swr], axis=-1))
    g = g.at[j_idx].add(jnp.concatenate([Btr, -swr], axis=-1))
    return H, g


def solve_update(
    H: Array,
    g: Array,
    R: Array,
    t: Array,
    damping: float,
    gauge_weight: float,
) -> tuple[Array, Array]:
    """Damped-GN update from the assembled global system (replicated)."""
    N = R.shape[0]
    Hd = H.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
    gd = g.reshape(6 * N)
    diag_mean = jnp.maximum(jnp.mean(jnp.diagonal(Hd)), 1e-8)
    # gauge prior: pin node 0's update to zero (6-dof global gauge)
    gauge = jnp.zeros((6 * N,), jnp.float32).at[:6].set(
        gauge_weight * diag_mean
    )
    Hd = Hd + jnp.diag(
        damping * jnp.diagonal(Hd) + 1e-6 * diag_mean + gauge
    )
    delta = -jnp.linalg.solve(Hd, gd).reshape(N, 6)
    dw, dt = delta[:, :3], delta[:, 3:]
    ok = jnp.all(jnp.isfinite(delta))  # reject degenerate solves
    dw = jnp.where(ok, dw, 0.0)
    dt = jnp.where(ok, dt, 0.0)
    return so3_project(_exp_so3(dw) @ R), t + dt


def pose_graph_gn(
    edge_idx: Array,
    x: Array,
    y: Array,
    w_corr: Array,
    w_edge: Array,
    sync: SyncResult,
    num_iters: int = 6,
    scale: float = 0.05,
    damping: float = 1e-3,
    gauge_weight: float = 1e4,
    axis_name: str | None = None,
    num_nodes: int | None = None,
    scale_start: float | None = None,
) -> SyncResult:
    """Jointly refine absolute poses against all correspondences.

    Args:
      edge_idx: (E, 2) int32 edges (i, j) — the local shard when called
        under shard_map with `axis_name` set.
      x, y: (E, K, 3) correspondence positions — x in frame i, y in
        frame j (exactly PairResult.x / PairResult.y).
      w_corr: (E, K) base per-correspondence weights in [0, 1]
        (filter weight x corr_mask); zero rows contribute nothing.
      w_edge: (E,) per-edge gate (final IRLS sync weights): pruned /
        aliased edges must not pull the joint solve.
      sync: initial absolute poses (the IRLS sync output).
      num_iters: Gauss-Newton iterations (static; lax.scan).
      scale: Cauchy scale (meters) for the robust reweighting of ||r||.
      damping: Levenberg factor, relative to the diagonal.
      gauge_weight: prior pinning node 0 at its initial pose.
      axis_name: if set, (H, g) partial sums are psum'ed over this mesh
        axis (edge-sharded assembly; solve replicated per device).
      num_nodes: static N override (defaults to sync.R.shape[0]).
      scale_start: graduated non-convexity — the Cauchy scale anneals
        geometrically from scale_start to scale across iterations, so
        correspondences on nodes that start far off (meters) still pull
        early, while the final iterations keep the tight basin. None =
        constant scale.

    Returns sync with refined (R, t) (weights/residuals passed through).
    """
    N = num_nodes if num_nodes is not None else sync.R.shape[0]
    w_base = (w_corr * w_edge[:, None]).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    s0 = scale if scale_start is None else scale_start
    if num_iters > 1:
        scales = jnp.asarray(
            s0 * (scale / s0) ** (jnp.arange(num_iters) / (num_iters - 1)),
            jnp.float32,
        )
    else:
        scales = jnp.full((num_iters,), scale, jnp.float32)

    def step(carry, s_it):
        R, t = carry
        H, g = assemble_normal_system(
            edge_idx, xf, yf, w_base, R, t, N, s_it
        )
        if axis_name is not None:
            H, g = jax.lax.psum((H, g), axis_name)
        R_new, t_new = solve_update(H, g, R, t, damping, gauge_weight)
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(
        step, (sync.R.astype(jnp.float32), sync.t.astype(jnp.float32)),
        scales,
    )
    return sync._replace(R=R, t=t)
