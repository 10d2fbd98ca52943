"""Shared mask-aware layers.

Padding discipline is the central TPU idiom of this framework: every set
(voxels, correspondences, clusters) is a fixed-capacity array + mask, and
every normalization must exclude pad rows from its statistics
(SURVEY.md §7 hard-part 4).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (batch, set) dims with padding excluded from stats.

    Mirrors MinkowskiBatchNorm / torch BN semantics on sparse sets.
    """

    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, mask: Array, train: bool) -> Array:
        C = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if train:
            w = mask.astype(jnp.float32)[..., None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x * w, axis=reduce_axes) / n
            var = jnp.sum(w * (x - mean) ** 2, axis=reduce_axes) / n
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y * mask[..., None]


def context_norm(x: Array, mask: Array, eps: float = 1e-5) -> Array:
    """Context Normalization (Yi et al. / PointCN): per-instance, per-channel
    normalization over the *set* dimension, mask-aware.

    x: (..., N, C); mask: (..., N). The classic silent-accuracy killer is
    letting pad rows shift the set statistics — excluded here by
    construction (SURVEY.md §7 hard-part 4).
    """
    w = mask.astype(x.dtype)[..., None]
    n = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(x * w, axis=-2, keepdims=True) / n
    var = jnp.sum(w * (x - mean) ** 2, axis=-2, keepdims=True) / n
    return (x - mean) * jax.lax.rsqrt(var + eps) * w
