"""Correspondence filtering network: PointCN + Order-Aware blocks.

TPU-native counterpart of the reference's "RegBlock" filtering net
(`ref:lib/pairwise.py`, vendoring OANet's PointCN / diff_pool /
diff_unpool / OAFilter blocks; SURVEY.md C4, paper §3.2): a per-pair
classifier over the N×6 putative-correspondence set producing an inlier
weight per correspondence.

This is dense 1×1-conv math (Dense over the channel dim + set-wise
normalizations + small matmuls) — pure XLA territory, `vmap`ed over the
edge batch; no custom kernel needed (SURVEY.md C4 "TPU build"). All set
reductions (context norm, pooling softmaxes) are mask-aware.

Structure (OANet, Zhang et al. ICCV 2019):
  PointCN  : residual [Dense -> CN -> BN -> ReLU] ×2 blocks on (N, C)
  diff_pool: learned soft assignment S = softmax_N(logits) -> (m, C)
  OAFilter : PointCN-style blocks on clusters + "spatial correlation"
             mixing across the m (cluster) dim — an MLP over clusters
  diff_unpool: per-point recombination S' X_cluster -> (N, C)
  head     : Dense -> logit o_i; weight w_i = tanh(relu(o_i))
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvreg.models.layers import MaskedBatchNorm, context_norm

Array = jax.Array


class PointCNBlock(nn.Module):
    """Residual context-normalized 1x1-conv block on a masked set."""

    features: int

    @nn.compact
    def __call__(self, x: Array, mask: Array, train: bool) -> Array:
        h = nn.Dense(self.features)(x)
        h = context_norm(h, mask)
        h = MaskedBatchNorm()(h, mask, train)
        h = nn.relu(h)
        h = nn.Dense(self.features)(h)
        h = context_norm(h, mask)
        h = MaskedBatchNorm()(h, mask, train)
        h = nn.relu(h)
        if x.shape[-1] != self.features:
            x = nn.Dense(self.features, use_bias=False)(x)
        return (x + h) * mask[..., None]


class OAFilterBlock(nn.Module):
    """Order-aware block on the (m, C) cluster set.

    The 'spatial correlation layer': mix information across the cluster
    dimension with a Dense over m (clusters have a canonical learned
    order, unlike points).
    """

    features: int

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        m = x.shape[-2]
        ones = jnp.ones(x.shape[:-1], dtype=bool)
        h = nn.Dense(self.features)(x)
        h = context_norm(h, ones)
        h = MaskedBatchNorm()(h, ones, train)
        h = nn.relu(h)
        # Spatial correlation: transpose -> Dense over clusters -> back.
        ht = jnp.swapaxes(h, -1, -2)  # (..., C, m)
        ht = nn.Dense(m)(ht)
        h2 = jnp.swapaxes(ht, -1, -2)
        h2 = MaskedBatchNorm()(h2, ones, train)
        h2 = nn.relu(h2)
        h2 = nn.Dense(self.features)(h2)
        h2 = context_norm(h2, ones)
        h2 = MaskedBatchNorm()(h2, ones, train)
        h2 = nn.relu(h2)
        if x.shape[-1] != self.features:
            x = nn.Dense(self.features, use_bias=False)(x)
        return x + h2


class FilteringNet(nn.Module):
    """OANet-style correspondence classifier.

    Input:  corr (..., N, D) putative correspondences ([x ‖ y] and
            optionally extra channels), mask (..., N).
    Output: logits (..., N) and weights (..., N) = tanh(relu(logits)).
    """

    channels: int = 128
    num_clusters: int = 500
    blocks_before: int = 3
    blocks_cluster: int = 3
    blocks_after: int = 3

    @nn.compact
    def __call__(
        self, corr: Array, mask: Array, train: bool = False
    ) -> tuple[Array, Array]:
        h = corr * mask[..., None]
        for _ in range(self.blocks_before):
            h = PointCNBlock(self.channels)(h, mask, train)

        # diff_pool: soft cluster assignment over the set dim.
        logits_s = nn.Dense(self.num_clusters)(h)  # (..., N, m)
        neg = jnp.asarray(-1e9, h.dtype)
        logits_s = jnp.where(mask[..., None], logits_s, neg)
        S = jax.nn.softmax(logits_s, axis=-2)  # normalize over N per cluster
        clusters = jnp.einsum("...nm,...nc->...mc", S, h)

        for _ in range(self.blocks_cluster):
            clusters = OAFilterBlock(self.channels)(clusters, train)

        # diff_unpool: per-point soft recombination of cluster features
        # (attention over clusters, computed from the *pre-pool* features).
        logits_u = nn.Dense(self.num_clusters)(h)
        U = jax.nn.softmax(logits_u, axis=-1)  # over clusters, per point
        up = jnp.einsum("...nm,...mc->...nc", U, clusters)

        h = jnp.concatenate([h, up], axis=-1)
        for _ in range(self.blocks_after):
            h = PointCNBlock(self.channels)(h, mask, train)

        out_logits = nn.Dense(1)(h)[..., 0]
        out_logits = jnp.where(mask, out_logits, -1e9)
        weights = jnp.tanh(nn.relu(out_logits)) * mask
        return out_logits, weights


class ConfidenceNet(nn.Module):
    """Per-edge registration confidence head (SURVEY.md C6, paper §3).

    Consumes permutation-invariant statistics of the filtering output and
    the residuals of the estimated transform, and predicts the probability
    that the pairwise registration succeeded. Used to prune the pose graph
    and to initialize IRLS weights.
    """

    hidden: int = 64

    @nn.compact
    def __call__(self, stats: Array, train: bool = False) -> Array:
        h = nn.Dense(self.hidden)(stats)
        h = nn.relu(h)
        h = nn.Dense(self.hidden)(h)
        h = nn.relu(h)
        return nn.sigmoid(nn.Dense(1)(h)[..., 0])


def edge_statistics(
    weights: Array, mask: Array, residuals: Array
) -> Array:
    """Permutation-invariant per-edge features for the confidence head.

    weights, residuals: (..., N); mask: (..., N). Returns (..., 8):
    [mean_w, std_w, frac(w>0.5), sum_w/N, wmean_r, wmedian-ish_r,
     mean_r, frac(r < 0.1)], all mask-aware.
    """
    m = mask.astype(weights.dtype)
    n = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    mean_w = jnp.sum(weights * m, axis=-1) / n
    var_w = jnp.sum(m * (weights - mean_w[..., None]) ** 2, axis=-1) / n
    frac_in = jnp.sum((weights > 0.5) * m, axis=-1) / n
    sum_w = jnp.sum(weights * m, axis=-1) / weights.shape[-1]
    wsum = jnp.maximum(jnp.sum(weights * m, axis=-1), 1e-6)
    wmean_r = jnp.sum(weights * m * residuals, axis=-1) / wsum
    # soft median proxy: mean of residuals below the weighted mean
    below = (residuals <= wmean_r[..., None]).astype(m.dtype) * m
    soft_med = jnp.sum(below * residuals, axis=-1) / jnp.maximum(
        jnp.sum(below, axis=-1), 1.0
    )
    mean_r = jnp.sum(residuals * m, axis=-1) / n
    frac_close = jnp.sum((residuals < 0.1) * m, axis=-1) / n
    return jnp.stack(
        [mean_w, jnp.sqrt(var_w + 1e-12), frac_in, sum_w, wmean_r,
         soft_med, mean_r, frac_close],
        axis=-1,
    )
