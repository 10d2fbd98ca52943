"""Training losses.

Counterparts of `ref:lib/loss.py::ClassificationLoss` /
`TransformationLoss` (SURVEY.md C9, C10) plus the FCGF hardest-contrastive
descriptor loss the reference inherits from Choy et al. for backbone
training. All mask-aware, all pure jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvreg.core import transforms as tf
from mvreg.ops.knn import pairwise_sqdist

Array = jax.Array


def classification_loss(
    logits: Array, labels: Array, mask: Array, balanced: bool = True
) -> Array:
    """Balanced BCE over inlier logits (SURVEY.md C9).

    labels ∈ {0,1}: 1 iff the correspondence is a GT inlier
    (‖y - T_gt x‖ < τ). Balancing reweights pos/neg classes to equal total
    mass, as the reference does (inliers are the minority class).
    """
    m = mask.astype(logits.dtype)
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    if balanced:
        n_pos = jnp.maximum(jnp.sum(labels * m), 1.0)
        n_neg = jnp.maximum(jnp.sum((1 - labels) * m), 1.0)
        w = labels * (0.5 / n_pos) + (1 - labels) * (0.5 / n_neg)
        return jnp.sum(per * w * m)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def inlier_labels(
    x: Array, y: Array, R_gt: Array, t_gt: Array, mask: Array, tau: float
) -> Array:
    """GT inlier labels: ‖R_gt x + t_gt - y‖ < τ (meters)."""
    res = jnp.linalg.norm(
        jnp.einsum("...ij,...nj->...ni", R_gt, x) + t_gt[..., None, :] - y,
        axis=-1,
    )
    return ((res < tau) & (mask > 0)).astype(x.dtype)


def transformation_loss(
    R_est: Array,
    t_est: Array,
    R_gt: Array,
    t_gt: Array,
    rot_weight: float = 1.0,
    trans_weight: float = 1.0,
) -> Array:
    """Pose loss: chordal rotation distance + L2 translation (C10).

    ‖R_est - R_gt‖²_F is the smooth chordal surrogate of angular error
    (∝ sin²(θ/2)); reference uses an equivalent rotation-error term.
    """
    rot = jnp.sum((R_est - R_gt) ** 2, axis=(-2, -1))
    tr = jnp.sum((t_est - t_gt) ** 2, axis=-1)
    return jnp.mean(rot_weight * rot + trans_weight * tr)


def correspondence_loss(
    R_est: Array, t_est: Array, x: Array, y: Array, mask: Array,
    clip: float = 1.0,
) -> Array:
    """Mean clipped residual of estimated transform over GT-inlier pairs."""
    res = jnp.linalg.norm(
        jnp.einsum("...ij,...nj->...ni", R_est, x)
        + t_est[..., None, :] - y,
        axis=-1,
    )
    m = mask.astype(res.dtype)
    return jnp.sum(jnp.minimum(res, clip) * m) / jnp.maximum(jnp.sum(m), 1.0)


def gt_correspondences(
    centers_a: Array,
    mask_a: Array,
    centers_b: Array,
    mask_b: Array,
    R_ab: Array,
    t_ab: Array,
    radius: float,
) -> tuple[Array, Array]:
    """GT positive voxel pairs: for each voxel of A, the nearest voxel of B
    (in B's frame, after applying the GT T_ab) if within `radius`.

    Returns (idx_b (V,), valid (V,)). Brute-force 3D NN — one GEMM.
    """
    a_in_b = tf.apply_transform(R_ab, t_ab, centers_a)
    d2 = pairwise_sqdist(a_in_b, centers_b)
    d2 = jnp.where(mask_b[None, :] > 0, d2, 1e30)
    idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    dmin = jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0]
    valid = (dmin < radius * radius) & (mask_a > 0)
    return idx, valid


def hardest_contrastive_loss(
    desc_a: Array,
    centers_a: Array,
    mask_a: Array,
    desc_b: Array,
    centers_b: Array,
    mask_b: Array,
    R_ab: Array,
    t_ab: Array,
    pos_radius: float = 0.0375,
    safe_radius: float = 0.1,
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
    num_samples: int = 512,
) -> Array:
    """FCGF hardest-contrastive descriptor loss (Choy et al., ICCV 2019).

    Positives: GT-corresponding voxel pairs (within pos_radius under the
    GT transform). Negatives: per anchor, the hardest (closest-descriptor)
    voxel of the other fragment that is spatially *far* (> safe_radius)
    from the true correspondence.

      L = mean relu(d_pos - m_pos)² + ½ mean relu(m_neg - d_neg_a)²
                                    + ½ mean relu(m_neg - d_neg_b)²  (sym)
    """
    idx_b, valid = gt_correspondences(
        centers_a, mask_a, centers_b, mask_b, R_ab, t_ab, pos_radius
    )
    # Subsample anchors for the expensive negative mining (static count).
    # Valid-first order alone would take a coordinate-sorted slab of the
    # fragment (rows are key-sorted); hash the row index for a
    # deterministic uniform spatial spread of anchors.
    n = valid.shape[0]
    h = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)
    tie = ((h ^ (h >> 16)) & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65536.0
    order = jnp.argsort((~valid).astype(jnp.float32) * 2.0 + tie)[:num_samples]
    anchors = desc_a[order]  # (S, D)
    pos = desc_b[idx_b[order]]  # (S, D)
    val = valid[order]
    a_pos_world = tf.apply_transform(R_ab, t_ab, centers_a)[order]

    d_pos = jnp.sqrt(jnp.sum((anchors - pos) ** 2, axis=-1) + 1e-12)

    # Hardest negatives for anchors, mined over fragment B.
    d2_ab = pairwise_sqdist(anchors, desc_b)
    far_b = pairwise_sqdist(a_pos_world, centers_b) > safe_radius**2
    ok_b = far_b & (mask_b[None, :] > 0)
    d2_ab = jnp.where(ok_b, d2_ab, 1e30)
    d_neg_a = jnp.sqrt(jnp.min(d2_ab, axis=-1) + 1e-12)

    # Symmetric: hardest negatives for the positives, mined over A.
    d2_ba = pairwise_sqdist(pos, desc_a)
    b_world = centers_b[idx_b[order]]
    a_world = tf.apply_transform(R_ab, t_ab, centers_a)
    far_a = pairwise_sqdist(b_world, a_world) > safe_radius**2
    ok_a = far_a & (mask_a[None, :] > 0)
    d2_ba = jnp.where(ok_a, d2_ba, 1e30)
    d_neg_b = jnp.sqrt(jnp.min(d2_ba, axis=-1) + 1e-12)

    v = val.astype(desc_a.dtype)
    nv = jnp.maximum(jnp.sum(v), 1.0)
    l_pos = jnp.sum(jnp.maximum(d_pos - pos_margin, 0) ** 2 * v) / nv
    l_neg_a = jnp.sum(jnp.maximum(neg_margin - d_neg_a, 0) ** 2 * v) / nv
    l_neg_b = jnp.sum(jnp.maximum(neg_margin - d_neg_b, 0) ** 2 * v) / nv
    loss = l_pos + 0.5 * (l_neg_a + l_neg_b)
    aux = {
        "d_pos": jnp.sum(d_pos * v) / nv,
        "d_neg": jnp.sum(d_neg_a * jnp.minimum(v, 1.0)) / nv,
        "n_pos_pairs": jnp.sum(v),
    }
    return loss, aux
