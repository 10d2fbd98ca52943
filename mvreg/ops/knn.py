"""Descriptor matching: masked brute-force NN and soft-argmax, MXU-shaped.

TPU-native counterpart of the reference's putative-correspondence search
(`ref:lib/utils.py` matching helpers — SciPy cKDTree / torch.cdist+argmin;
SURVEY.md C3, §2.3). A KD-tree is a pointer-chasing structure that maps
terribly to TPU; with 32-D descriptors the brute-force distance matrix is
one (Na, C) @ (C, Nb) MXU GEMM, so we tile that and never materialize more
than a row-chunk of it. A Pallas streaming-argmin kernel with the same
contract lives in ops/pallas/match_argmin.py for large problems.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

BIG = 1e30


def pairwise_sqdist(fa: Array, fb: Array) -> Array:
    """Squared L2 distances (Na, Nb) = |a|² + |b|² - 2 a·bᵀ (one GEMM).

    Precision.HIGHEST: TPU default precision multiplies in bf16 —
    ~0.4% relative noise on the Gram terms flips NN argmins between
    close descriptors and was part of the round-2 chip-vs-CPU accuracy
    gap. The 6-pass f32 GEMM costs ~6x on a stage that is <10% of the
    pipeline (runs/results/r2_stage_mfu.json).
    """
    a2 = jnp.sum(fa * fa, axis=-1, keepdims=True)
    b2 = jnp.sum(fb * fb, axis=-1, keepdims=True)
    ab = jnp.dot(fa, fb.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2 - 2.0 * ab + b2.T, 0.0)


def nn_match(
    fa: Array,
    mask_a: Array,
    fb: Array,
    mask_b: Array,
    chunk: int = 1024,
) -> tuple[Array, Array]:
    """For each row of fa, index+sqdist of its nearest neighbor in fb.

    Masked: invalid fb columns never win; invalid fa rows get idx 0 and
    BIG distance. Row-chunked scan keeps peak memory at (chunk, Nb).
    """
    Na = fa.shape[0]
    pad = (-Na) % chunk
    fa_p = jnp.pad(fa, ((0, pad), (0, 0)))
    ma_p = jnp.pad(mask_a, (0, pad))
    col_bad = ~mask_b.astype(bool)

    def body(chunk_feats):
        d2 = pairwise_sqdist(chunk_feats, fb)
        d2 = jnp.where(col_bad[None, :], BIG, d2)
        idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)
        return idx, jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0]

    n_chunks = fa_p.shape[0] // chunk
    idx, d2 = jax.lax.map(body, fa_p.reshape(n_chunks, chunk, -1))
    idx = idx.reshape(-1)[:Na]
    d2 = d2.reshape(-1)[:Na]
    idx = jnp.where(ma_p[:Na], idx, 0)
    d2 = jnp.where(ma_p[:Na], d2, BIG)
    return idx, d2


def mutual_match(
    fa: Array, mask_a: Array, fb: Array, mask_b: Array, chunk: int = 1024
) -> tuple[Array, Array, Array]:
    """NN match a->b plus the mutual-consistency flag (b's NN maps back).

    Returns (idx_ab, sqdist_ab, mutual) with mutual (Na,) bool.
    """
    idx_ab, d2_ab = nn_match(fa, mask_a, fb, mask_b, chunk)
    idx_ba, _ = nn_match(fb, mask_b, fa, mask_a, chunk)
    mutual = (idx_ba[idx_ab] == jnp.arange(fa.shape[0], dtype=jnp.int32)) & (
        mask_a.astype(bool)
    )
    return idx_ab, d2_ab, mutual


def soft_match(
    fa: Array,
    mask_a: Array,
    fb: Array,
    mask_b: Array,
    points_b: Array,
    temperature: float = 0.02,
    chunk: int = 1024,
) -> Array:
    """Differentiable soft correspondence positions (Na, 3).

    y_i = Σ_j softmax_j(-d²(f_i, f_j)/τ) · p_j — the soft-argmax matching
    named by the driver's north star [B:north_star]; lets gradients reach
    the descriptor network through the matching stage.
    """
    Na = fa.shape[0]
    pad = (-Na) % chunk
    fa_p = jnp.pad(fa, ((0, pad), (0, 0)))
    col_bad = ~mask_b.astype(bool)

    def body(chunk_feats):
        d2 = pairwise_sqdist(chunk_feats, fb)
        logits = jnp.where(col_bad[None, :], -BIG, -d2 / temperature)
        w = jax.nn.softmax(logits, axis=-1)
        return jnp.dot(w, points_b, preferred_element_type=jnp.float32)

    n_chunks = fa_p.shape[0] // chunk
    y = jax.lax.map(body, fa_p.reshape(n_chunks, chunk, -1))
    y = y.reshape(-1, 3)[:Na]
    return y * mask_a[:, None]
