"""Per-voxel surface normals from raw-point neighborhood moments.

Round-4 accuracy lever (VERDICT r3 item 3): correspondence positions
are sub-voxel point centroids, but two matched voxels from different
fragments cover *different* surface patches (the grids are offset), so
even perfect matches carry an ~voxel/2 tangential centroid mismatch —
the measured 2-3 cm noise floor under every point-to-point solve. The
fix is point-to-PLANE residuals in the ICP polish stages: distances
measured along the surface normal only, where the mismatch is real
signal; tangential sliding is free. That needs normals.

Normals come from the eigenvector of the smallest eigenvalue of the
point covariance over a voxel's face-adjacent neighborhood: all moments
(count, sum, second moment) accumulate with one masked segment-sum over
the raw points, neighbors aggregate via the level-0 kernel-map rows for
the 7 face offsets, and the 3x3 eigendecomposition is the batched
Jacobi `eigh3x3` already used by the Procrustes stack. No reference
counterpart (the reference stops at weighted Procrustes; SURVEY.md
§3.2) — this is eval-time geometry, no learned parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvreg.ops import voxel as vx
from mvreg.ops.svd3 import eigh3x3

Array = jax.Array

# center + 6 face-adjacent offsets
_FACE_OFFSETS = (
    (0, 0, 0), (1, 0, 0), (-1, 0, 0),
    (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1),
)


def voxel_normals(
    grid: vx.VoxelGrid,
    points: Array,
    min_points: int = 6,
) -> tuple[Array, Array]:
    """Surface normal + planarity weight per voxel.

    points (P, 3) are the raw fragment points behind `grid`. Returns
    (normals (V, 3) unit vectors, weight (V,) in [0, 1]). The weight is
    the planarity (l1 - l2)/l0 of the local covariance spectrum
    (~1 on planes, ~0 on edges/corners/noise), zeroed where fewer than
    `min_points` points support the fit. Normal SIGN is arbitrary —
    point-to-plane residuals are sign-invariant.
    """
    V = grid.keys.shape[0]
    pm = grid.point_mask.astype(jnp.float32)
    # fragment-local frame: keeps second moments ~O(extent^2) for f32
    p = (points - grid.origin) * pm[:, None]

    ones = pm
    s1 = jax.ops.segment_sum(p, grid.point2voxel, num_segments=V)
    outer = p[:, :, None] * p[:, None, :]  # (P, 3, 3)
    s2 = jax.ops.segment_sum(
        outer.reshape(-1, 9), grid.point2voxel, num_segments=V
    )
    n = jax.ops.segment_sum(ones, grid.point2voxel, num_segments=V)

    # aggregate over the 7-voxel face neighborhood (one equi-join row
    # per offset; 27 offsets measured 3-4x the cost for little normal
    # quality on surface geometry)
    offsets = jnp.array(_FACE_OFFSETS, jnp.int32)
    kmap = vx.kernel_map(grid.keys, grid.mask, offsets)  # (7, V)
    moments = jnp.concatenate([n[:, None], s1, s2], axis=-1)  # (V, 13)
    moments_z = jnp.concatenate(
        [moments, jnp.zeros((1, 13), moments.dtype)], axis=0
    )
    agg = jnp.sum(moments_z[jnp.where(kmap < 0, V, kmap)], axis=0)

    na = jnp.maximum(agg[:, 0], 1e-6)
    mu = agg[:, 1:4] / na[:, None]
    cov = agg[:, 4:].reshape(-1, 3, 3) / na[:, None, None] - (
        mu[:, :, None] * mu[:, None, :]
    )
    w_eig, v_eig = eigh3x3(cov)  # eigvals descending
    normal = v_eig[..., 2]  # smallest-eigenvalue eigenvector
    nrm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nrm, 1e-12)

    l0 = jnp.maximum(w_eig[:, 0], 1e-12)
    planarity = jnp.clip((w_eig[:, 1] - w_eig[:, 2]) / l0, 0.0, 1.0)
    ok = (agg[:, 0] >= min_points) & grid.mask
    return normal * ok[:, None], planarity * ok


def _moments(points: Array, seg: Array, weights: Array, V: int) -> Array:
    """(count, sum, second-moment) rows (V, 13) by segment-sum."""
    p = points * weights[:, None]
    s1 = jax.ops.segment_sum(p, seg, num_segments=V)
    outer = points[:, :, None] * p[:, None, :]
    s2 = jax.ops.segment_sum(outer.reshape(-1, 9), seg, num_segments=V)
    n = jax.ops.segment_sum(weights, seg, num_segments=V)
    return jnp.concatenate([n[:, None], s1, s2], axis=-1)


def _normals_from_moments(
    agg: Array, mask: Array, min_points: int
) -> tuple[Array, Array]:
    na = jnp.maximum(agg[:, 0], 1e-6)
    mu = agg[:, 1:4] / na[:, None]
    cov = agg[:, 4:].reshape(-1, 3, 3) / na[:, None, None] - (
        mu[:, :, None] * mu[:, None, :]
    )
    w_eig, v_eig = eigh3x3(cov)
    normal = v_eig[..., 2]
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
    )
    l0 = jnp.maximum(w_eig[:, 0], 1e-12)
    planarity = jnp.clip((w_eig[:, 1] - w_eig[:, 2]) / l0, 0.0, 1.0)
    ok = (agg[:, 0] >= min_points) & mask
    return normal * ok[:, None], planarity * ok


def voxel_normals_l1(
    grid0: "vx.VoxelGrid",
    points: Array,
    pool,
    kmap1: Array,
    num_coarse: int,
    min_points: int = 6,
    neighbor_agg: bool = False,
) -> tuple[Array, Array]:
    """Per-L0-voxel normals computed at the L1 (2x coarser) level.

    Bench-measured motivation: the L0 version's neighbor aggregation is
    a 7*V0-row gather (~7 ms/step at bench scale — the per-row gather
    floor again, r4_bench_k19 regression). Here every expensive step is
    a scatter/segment-sum or reuses the plan's EXISTING L1 kernel map:
    L0 moments pool into parents (V0-row scatter), aggregate over the
    L1 kernel map (K*V1 rows, ~8x fewer than the L0 version), and L0
    voxels inherit their parent's normal (V0-row gather). Normals at
    2-3 voxel patch scale are also better conditioned than the L0 fit.

    pool: PoolMap L0->L1; kmap1: (K, V1) L1 kernel map (any tap count),
    used only when `neighbor_agg` — at 2x voxel size a single L1 cell
    already holds the ~8 child voxels' points (enough for a plane fit),
    and the kernel-map aggregation is K*V1 gathered rows per fragment
    (~12 ms/step at bench scale — measured to cost more than the plane
    stages it feeds, r4_bench_k27_cur 47.6 vs 57.0 fr/s plane-off).
    Returns (normals (V0, 3), planarity (V0,)).
    """
    V0 = grid0.keys.shape[0]
    pm = grid0.point_mask.astype(jnp.float32)
    p = (points - grid0.origin) * pm[:, None]
    m0 = _moments(p, grid0.point2voxel, pm, V0)

    # pool moments to parents (scatter; overflow rows -> dump)
    parent = jnp.where(pool.mask, pool.parent, num_coarse)
    m1 = jax.ops.segment_sum(m0, parent, num_segments=num_coarse + 1)
    agg = m1[:num_coarse]
    if neighbor_agg:
        # optional L1-neighborhood smoothing via the existing kernel map
        m1z = m1.at[num_coarse].set(0.0)
        agg = jnp.sum(
            m1z[jnp.where(kmap1 < 0, num_coarse, kmap1)], axis=0
        )

    mask1 = jnp.arange(num_coarse) >= 0  # all rows; gated by counts
    n1, w1 = _normals_from_moments(agg, mask1, min_points)

    # L0 voxels inherit the parent normal
    par = jnp.minimum(pool.parent, num_coarse - 1)
    n0 = n1[par] * pool.mask[:, None]
    w0 = w1[par] * pool.mask
    return n0, w0
