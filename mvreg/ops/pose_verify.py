"""Pose hypothesis verification by cloud-overlap scoring.

Structured outliers defeat any single weighting scheme: on self-similar
scenes (periodic floors, repeated furniture — and 3DMatch corridors),
wrong-but-rigid-consistent match cliques exist, so both the learned
filter (runs/results/r2_scene8_diag_cpu.json: 61% of true-overlap edges
confidently wrong) and spectral consistency (r2_scene8_diag_spectral:
worse — it amplifies the biggest clique, not the right one) can pick an
aliased pose. What disambiguates aliases is the FULL geometry: a slid/
flipped solution aligns the repetitive structure but misaligns
everything else. Score every candidate pose by symmetric cloud overlap

    score(T) = ½·frac_x[ d(T·x, Y) < τ ] + ½·frac_y[ d(T⁻¹·y, X) < τ ]

(one (K, V) distance matmul per direction — MXU work) and keep the
argmax. The reference has no counterpart; its benchmark absorbs such
failures as lost recall.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvreg.core.transforms import inverse

Array = jax.Array


def _frac_close(
    x: Array, x_mask: Array, y: Array, y_mask: Array, tau: float
) -> Array:
    """Soft proximity score: mean over valid x of hinge(1 − d_NN/τ).

    The hinge (instead of a hard d<τ count) keeps the alias/junk
    discrimination (anything beyond τ contributes 0) while ranking
    good poses by *precision* — a hard count at τ=10 cm scored a
    0.5 cm-accurate pose and a 10 cm-off pose identically, letting the
    selection pick the worse candidate on clean pairs.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1)
    # Precision.HIGHEST: see ops/icp.py — bf16-multiply Gram terms
    # swamp d^2 at the tau gates on TPU.
    d2 = x2 + y2[None, :] - 2.0 * jnp.dot(
        x, y.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = jnp.where(y_mask[None, :], d2, jnp.inf)
    d = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))
    prox = jnp.maximum(1.0 - d / tau, 0.0) * x_mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(x_mask.astype(jnp.float32)), 1.0)
    return jnp.sum(prox) / n


def overlap_score(
    R: Array,
    t: Array,
    x: Array,
    x_mask: Array,
    y: Array,
    y_mask: Array,
    tau: float = 0.1,
) -> Array:
    """Symmetric overlap fraction of the pose T: x -> y, in [0, 1]."""
    xt = jnp.einsum("ij,nj->ni", R, x) + t
    Ri, ti = inverse(R, t)
    yt = jnp.einsum("ij,nj->ni", Ri, y) + ti
    return 0.5 * (
        _frac_close(xt, x_mask, y, y_mask, tau)
        + _frac_close(yt, y_mask, x, x_mask, tau)
    )


def ransac_overlap_candidate(
    key: Array,
    x: Array,
    y: Array,
    corr_mask: Array,
    xv: Array,
    xv_mask: Array,
    yv: Array,
    yv_mask: Array,
    num_hypotheses: int = 512,
    tau: float = 0.1,
    chunk: int = 64,
) -> tuple[Array, Array]:
    """Best minimal-sample pose by CLOUD-OVERLAP scoring (not consensus).

    Classic RANSAC scores hypotheses by putative-match consensus — which
    is exactly what a structured outlier clique (floor alias) maximizes.
    Scoring by overlap of the verification clouds (xv vs yv) breaks that
    circularity: only the true pose aligns geometry OFF the repeated
    structure. At a 10-15% inlier rate, 512 3-point samples contain a
    clean triple with p ≈ 0.4-0.8; cost is H/chunk (chunkKv, Vv)
    distance matmuls — MXU work, trivially small next to the UNet.
    """
    from mvreg.core.procrustes import kabsch
    from mvreg.core.ransac import _sample_indices

    idx = _sample_indices(key, corr_mask, num_hypotheses, 3)
    xs, ys = x[idx], y[idx]
    R_h, t_h = kabsch(xs, ys, jnp.ones(idx.shape, x.dtype))

    nv = jnp.maximum(jnp.sum(xv_mask.astype(jnp.float32)), 1.0)
    y2 = jnp.sum(yv * yv, axis=-1)

    def score_chunk(args):
        R_c, t_c = args  # (C, 3, 3), (C, 3)
        moved = jnp.einsum("cij,nj->cni", R_c, xv) + t_c[:, None, :]
        m2 = jnp.sum(moved * moved, axis=-1)  # (C, Kv)
        d2 = (
            m2[..., None]
            + y2[None, None, :]
            - 2.0
            * jnp.einsum(
                "cni,vi->cnv", moved, yv,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
        d2 = jnp.where(yv_mask[None, None, :], d2, jnp.inf)
        # HARD count here, unlike the soft final-selection score: a
        # 3-point hypothesis from noisy true inliers is sloppy (~2 deg,
        # cm-dm residuals) — the hard count still credits it for
        # covering the whole cloud loosely, where a soft precision
        # score would prefer an EXACT structured alias (floor-to-floor
        # lattice alignment). Winners get ICP-polished before the soft
        # selection ranks them.
        close = (jnp.min(d2, axis=-1) < tau * tau) & xv_mask[None, :]
        return jnp.sum(close.astype(jnp.float32), axis=-1) / nv

    H = num_hypotheses
    # chunk never exceeds H (H < 64 configs previously hit a 0-chunk
    # reshape), and must divide it
    chunk = min(chunk, H)
    while H % chunk:
        chunk -= 1
    R_ch = R_h.reshape(H // chunk, chunk, 3, 3)
    t_ch = t_h.reshape(H // chunk, chunk, 3)
    scores = jax.lax.map(score_chunk, (R_ch, t_ch)).reshape(H)
    best = jnp.argmax(scores)
    return R_h[best], t_h[best]


def select_best_pose(
    candidates_R: Array,
    candidates_t: Array,
    x: Array,
    x_mask: Array,
    y: Array,
    y_mask: Array,
    tau: float = 0.1,
) -> tuple[Array, Array, Array]:
    """Pick the candidate (H, 3, 3)/(H, 3) maximizing overlap score.

    Returns (R, t, scores (H,)).
    """
    scores = jax.vmap(
        lambda R, t: overlap_score(R, t, x, x_mask, y, y_mask, tau)
    )(candidates_R, candidates_t)
    k = jnp.argmax(scores)
    return candidates_R[k], candidates_t[k], scores
