"""PointNet-style local-patch descriptor — the second descriptor family.

The driver's north star names "sparse FCGF/PointNet-style descriptor
extraction" [B:north_star]; this is the PointNet half: instead of sparse
convolutions, each keypoint's descriptor comes from a shared MLP +
max-pool over its local neighborhood (PointNet applied per patch, as in
PPFNet/3DSmoothNet-family methods). Useful as a lighter, conv-free
backbone: no kernel maps at all, just one k-NN gather — and a natural
A/B against FCGF on the same pipeline (same Descriptors contract).

Invariances: patches are centered on the keypoint (translation) and
scaled by the patch radius; rotation invariance is learned via
augmentation, as with FCGF.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvreg.ops.knn import pairwise_sqdist

Array = jax.Array


def knn_patches(
    centers: Array, mask: Array, k: int, radius: float
) -> tuple[Array, Array]:
    """For each point: indices of its k nearest neighbors within radius.

    centers (V, 3), mask (V,) -> idx (V, k) int32, valid (V, k) bool.
    One V×V distance GEMM + top-k (V is the voxel/keypoint capacity).
    """
    d2 = pairwise_sqdist(centers, centers)
    d2 = jnp.where(mask[None, :] > 0, d2, 1e30)
    neg, idx = jax.lax.top_k(-d2, k)  # ascending distances
    valid = (-neg <= radius * radius) & (mask[:, None] > 0)
    return idx.astype(jnp.int32), valid


class PointNetDescriptor(nn.Module):
    """Per-patch PointNet: center, scale, shared MLP, masked max-pool."""

    channels: Sequence[int] = (64, 128, 256)
    out_dim: int = 32
    k_neighbors: int = 32
    patch_radius: float = 0.3

    @nn.compact
    def __call__(
        self, centers: Array, mask: Array, train: bool = False
    ) -> Array:
        """centers (B, V, 3), mask (B, V) -> descriptors (B, V, out_dim)."""

        def one(centers1, mask1):
            idx, valid = knn_patches(
                centers1, mask1, self.k_neighbors, self.patch_radius
            )
            # (V, k, 3) local coordinates, radius-normalized
            rel = (centers1[idx] - centers1[:, None, :]) / self.patch_radius
            return rel, valid

        rel, valid = jax.vmap(one)(centers, mask)
        h = rel
        for c in self.channels:
            h = nn.Dense(c)(h)
            h = nn.LayerNorm()(h)
            h = nn.relu(h)
        # masked max-pool over the patch
        h = jnp.where(valid[..., None], h, -1e9)
        h = jnp.max(h, axis=-2)
        h = nn.Dense(self.channels[-1])(h)
        h = nn.relu(h)
        out = nn.Dense(self.out_dim)(h)
        out = out * jax.lax.rsqrt(
            jnp.sum(out * out, axis=-1, keepdims=True) + 1e-12
        )
        return out * mask[..., None]
