"""Scene-level ICP refinement of synchronized node poses.

After IRLS sync the rotations are globally consistent to a few degrees
but translations accumulate drift along the pose graph (measured at 30
fragments: rot-ECDF@10° 0.73 while trans-ECDF@25cm only 0.25 —
runs/results/r2_mv30_v4_full_cpu.json). The reference stops at sync;
this stage polishes each node's ABSOLUTE pose against the world-frame
union of all other fragments: Jacobi sweeps of per-node point-to-point
ICP (every node refines against the previous iterate's world cloud,
then all update simultaneously — order-free, deterministic, SPMD-safe).

Static shapes: per node one (K, (N·S)) distance matmul per ICP step,
with S-point per-node subsampling of the world cloud. All MXU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvreg.ops.icp import icp_refine
from mvreg.sync.irls import SyncResult

Array = jax.Array


def scene_icp_refine(
    centers: Array,
    masks: Array,
    sync: SyncResult,
    rounds: int = 2,
    icp_iters: int = 3,
    scale: float = 0.05,
    trust_radius: float = 0.25,
    target_subsample: int = 512,
    normals: Array | None = None,
    nweights: Array | None = None,
    plane_rounds: int = 0,
    plane_iters: int = 2,
    min_inliers: int = 16,
) -> SyncResult:
    """Polish absolute poses (N,3,3)/(N,3) against the joint world cloud.

    centers (N, V, 3) fragment keypoint clouds (local frames), masks
    (N, V). Each Jacobi round: build the world cloud from current poses
    (S spread-subsampled points per node), then every node ICPs its own
    cloud against the world cloud WITH ITS OWN POINTS MASKED OUT.

    With `plane_rounds > 0` and per-voxel `normals` (N, V, 3) (+
    planarity `nweights` (N, V)), that many EXTRA rounds run afterwards
    using point-to-plane residuals (normals rotated into world frame
    each round) — the stage that breaks the point-to-point centroid
    noise floor (see ops/icp.icp_refine).
    """
    N, V, _ = centers.shape
    S = min(target_subsample, V)
    # deterministic spread subsample: same hash order as select_keypoints
    idx = jnp.arange(V, dtype=jnp.uint32)
    h = idx * jnp.uint32(0x9E3779B9)
    h = h ^ (h >> 16)
    order = jnp.argsort(h)[:S]
    sub = centers[:, order]  # (N, S, 3)
    sub_mask = masks[:, order]  # (N, S)
    sub_nrm = normals[:, order] if normals is not None else None
    sub_nw = nweights[:, order] if nweights is not None else None

    R, t = sync.R, sync.t

    def make_round(plane: bool):
        def one_round(carry, _):
            R, t = carry
            world = (
                jnp.einsum("nij,nsj->nsi", R, sub) + t[:, None, :]
            )  # (N, S, 3)
            flat = world.reshape(N * S, 3)
            flat_mask = sub_mask.reshape(N * S)
            if plane:
                wn = jnp.einsum("nij,nsj->nsi", R, sub_nrm)
                flat_n = wn.reshape(N * S, 3)
                flat_nw = (
                    sub_nw.reshape(N * S) if sub_nw is not None else None
                )

            def refine_node(k):
                # mask out node k's own points from the target
                not_self = (jnp.arange(N * S) // S) != k
                tm = flat_mask & not_self
                if plane:
                    return icp_refine(
                        R[k], t[k], centers[k], masks[k], flat, tm,
                        num_iters=0, scale=scale,
                        trust_radius=trust_radius,
                        min_inliers=min_inliers,
                        y_normals=flat_n, y_nweight=flat_nw,
                        plane_iters=plane_iters,
                    )
                return icp_refine(
                    R[k], t[k], centers[k], masks[k], flat, tm,
                    num_iters=icp_iters, scale=scale,
                    trust_radius=trust_radius,
                    min_inliers=min_inliers,
                )

            R2, t2 = jax.lax.map(refine_node, jnp.arange(N))
            return (R2, t2), None

        return one_round

    (R, t), _ = jax.lax.scan(
        make_round(False), (R, t), None, length=rounds
    )
    if plane_rounds > 0 and normals is not None:
        (R, t), _ = jax.lax.scan(
            make_round(True), (R, t), None, length=plane_rounds
        )
    return sync._replace(R=R, t=t)
