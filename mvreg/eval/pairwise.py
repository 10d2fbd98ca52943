"""3DMatch pairwise registration benchmark (registration recall).

Counterpart of `ref:scripts/benchmark_pairwise_registration.py`
(SURVEY.md C17, call stack §3.2), using the standard Redwood/3DMatch
protocol: for each GT-overlapping pair, the pose error is evaluated as

    RMSE² = ξᵀ · Info · ξ / n_info

where ξ is the 6-DoF difference between the estimated and GT transforms
(Δt ‖ 2·vec(Δq)) and Info is the pair's `gt.info` information matrix
(covariance of the GT-overlap correspondences). A pair is successfully
registered if RMSE < 0.2 m; recall is the fraction of successes, averaged
per scene and over scenes.

Unlike the reference (Python loop per pair, features cached to disk), the
whole scene evaluates as a handful of batched device programs.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

from mvreg.core import transforms as tf
from mvreg.data.threedmatch import GtInfo, GtPair

import jax
import jax.numpy as jnp

Array = jax.Array


def pose_difference_xi(T_est: np.ndarray, T_gt: np.ndarray) -> np.ndarray:
    """Redwood 6-DoF difference ξ = [Δt ; q_vec(ΔR)] of T_gt⁻¹ T_est.

    Exactly the official evaluation's parameterization (Redwood
    `mrComputeTransformationError`: ``er = [te; -qt(2:4)]`` — the
    quaternion vector part WITHOUT a factor of 2; the small-angle
    factor 2 of δR·p ≈ p + 2·δq×p lives inside the info matrix, see
    info_matrix_from_points). The sign of q_vec is irrelevant under the
    quadratic form.
    """
    delta = np.linalg.inv(T_gt) @ T_est
    dt = delta[:3, 3]
    q = np.asarray(tf.rotmat_to_quat(jnp.asarray(delta[:3, :3])))
    return np.concatenate([dt, q[1:]])


def pair_rmse(
    T_est: np.ndarray, T_gt: np.ndarray, info: np.ndarray
) -> float:
    """Redwood protocol RMSE (meters) for one pair.

    RMSE² = ξᵀ·Info·ξ / Info[0,0]. The official divisor is the (0,0)
    entry: Info = Σ_p AᵀA with A = [I₃ | −2·skew(p)], so Info[0,0] is
    the overlap correspondence count n and the quotient is the mean
    squared point displacement over the GT-overlap set.
    """
    xi = pose_difference_xi(T_est, T_gt)
    n = max(info[0, 0], 1e-9)
    return float(np.sqrt(xi @ info @ xi / n))


def default_info(n: float = 1.0) -> np.ndarray:
    """Fallback info matrix (identity scaled): plain RMSE on ξ."""
    return np.eye(6) * n


def info_matrix_from_points(points: np.ndarray) -> np.ndarray:
    """Official Redwood gt.info matrix for an overlap point set (n, 3).

    Info = Σ_p AᵀA, A = [I₃ | −2·skew(p)] — the Jacobian of the point
    displacement Δp = Δt + 2·δq×p w.r.t. ξ = [t ; q_vec]. Used to write
    protocol-faithful synthetic gt.info stand-ins; matches what the
    reference's benchmark consumes from the published 3DMatch files.
    """
    p = np.asarray(points, np.float64)
    n = p.shape[0]
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    zeros = np.zeros(n)
    ones = np.ones(n)
    # A rows stacked per point: (n, 3, 6)
    A = np.stack(
        [
            np.stack([ones, zeros, zeros, zeros, 2 * z, -2 * y], -1),
            np.stack([zeros, ones, zeros, -2 * z, zeros, 2 * x], -1),
            np.stack([zeros, zeros, ones, 2 * y, -2 * x, zeros], -1),
        ],
        axis=1,
    )
    return np.einsum("nij,nik->jk", A, A)


class PairwiseSceneResult(NamedTuple):
    recall: float
    rre_deg: np.ndarray  # per evaluated pair (successful ones hold values)
    rte: np.ndarray
    rmse: np.ndarray
    success: np.ndarray


def evaluate_scene_pairs(
    est_transforms: Sequence[np.ndarray],
    gt_pairs: Sequence[GtPair],
    gt_infos: Sequence[GtInfo] | None = None,
    rmse_threshold: float = 0.2,
) -> PairwiseSceneResult:
    """Registration recall for one scene.

    est_transforms[k] is the estimated 4x4 T for gt_pairs[k]. Per the
    standard protocol, only non-consecutive pairs (|i - j| > 1) count
    toward recall (consecutive fragments are trivially aligned by
    odometry), matching the reference harness.
    """
    info_map = {}
    if gt_infos is not None:
        info_map = {(g.i, g.j): g.info for g in gt_infos}

    rres, rtes, rmses, succ = [], [], [], []
    for T_est, pair in zip(est_transforms, gt_pairs):
        if abs(pair.i - pair.j) <= 1:
            continue
        T_gt = pair.transform
        info = info_map.get((pair.i, pair.j))
        if info is None:
            info = default_info(1.0)
            n = 1.0
        rmse = pair_rmse(np.asarray(T_est), T_gt, info)
        dR = T_gt[:3, :3].T @ np.asarray(T_est)[:3, :3]
        rre = float(
            np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        )
        rte = float(np.linalg.norm(np.asarray(T_est)[:3, 3] - T_gt[:3, 3]))
        rres.append(rre)
        rtes.append(rte)
        rmses.append(rmse)
        succ.append(rmse < rmse_threshold)

    succ_arr = np.array(succ, bool)
    return PairwiseSceneResult(
        recall=float(succ_arr.mean()) if len(succ_arr) else 0.0,
        rre_deg=np.array(rres),
        rte=np.array(rtes),
        rmse=np.array(rmses),
        success=succ_arr,
    )


def aggregate_recall(
    scene_results: dict[str, PairwiseSceneResult],
) -> dict[str, float]:
    """Mean-over-scenes recall table (the reference's headline number)."""
    out = {name: r.recall for name, r in scene_results.items()}
    out["mean"] = float(np.mean(list(out.values()))) if out else 0.0
    return out
