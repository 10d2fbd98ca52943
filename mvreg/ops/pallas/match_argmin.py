"""Pallas TPU kernel: streaming masked nearest-neighbor (argmin) matching.

The matching stage's distance matrix (Na, Nb) never fits usefully in
VMEM at fragment scale; this kernel streams column tiles of B through
the MXU and keeps only a running (min, argmin) per row — the
flash-attention pattern applied to NN search (SURVEY.md C3: replaces
cKDTree / torch.cdist+argmin; [B:north_star] "Pallas kernels for
voxel/KNN feature ops").

Contract matches mvreg.ops.knn.nn_match: masked columns never win; the
caller handles row masking. Distances returned are exact squared L2.

Grid: (row_tiles, col_tiles), rows parallel, cols sequential; the output
row block stays resident in VMEM across the column sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BIG = jnp.float32(1e30)


def _argmin_kernel(
    a_ref, b_ref, bbias_ref, min_ref, idx_ref, *, tn: int, precision
):
    j = pl.program_id(1)
    a = a_ref[:]  # (TM, D)
    b = b_ref[:]  # (TN, D)
    # scores = ||a||^2 - 2 a.b + ||b||^2; drop the row-constant ||a||^2
    # (doesn't change the argmin; the true sqdist is reconstructed by the
    # wrapper). bbias carries ||b||^2 + BIG * (1 - valid).
    # precision: MXU pass count. DEFAULT truncates f32 to bf16 (one
    # pass) — measured 0.7% argmin flips vs the HIGHEST-precision XLA
    # path on near-tie descriptors (r3_matchmb2_chip.json); HIGHEST
    # matches it bit-for-bit at ~6x MXU passes on <10% of kernel time.
    scores = -2.0 * jnp.dot(
        a, b.T, preferred_element_type=jnp.float32, precision=precision
    ) + bbias_ref[:]  # (TM, TN) + (1, TN) broadcast
    # Row-tile outputs live as (1, TM/128, 128) blocks: Mosaic requires
    # the last two block dims to be (sublane, lane) tile-able — a flat
    # (1, TM) block is not (measured on-chip failure, r3_matchmb_chip).
    shp = min_ref.shape  # (1, TM // 128, 128)
    tile_min = jnp.min(scores, axis=1).reshape(shp)
    tile_arg = (
        jnp.argmin(scores, axis=1).astype(jnp.int32) + j * tn
    ).reshape(shp)

    @pl.when(j == 0)
    def _():
        min_ref[:] = tile_min
        idx_ref[:] = tile_arg

    @pl.when(j > 0)
    def _():
        cur = min_ref[:]
        take = tile_min < cur
        min_ref[:] = jnp.where(take, tile_min, cur)
        idx_ref[:] = jnp.where(take, tile_arg, idx_ref[:])


def _pad_to(x: Array, n: int, axis: int, value=0) -> Array:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("tile_m", "tile_n", "interpret", "precision")
)
def nn_match_pallas(
    fa: Array,
    mask_a: Array,
    fb: Array,
    mask_b: Array,
    tile_m: int = 256,
    tile_n: int = 2048,
    interpret: bool = False,
    precision: str = "highest",
) -> tuple[Array, Array]:
    """Masked NN match a->b. Returns (idx (Na,), sqdist (Na,)).

    Same contract as ops.knn.nn_match (rows with ~mask_a get idx 0 and
    BIG distance).
    """
    Na, D = fa.shape
    Nb = fb.shape[0]
    assert tile_m % 128 == 0, "tile_m must be a multiple of 128 (lanes)"
    R = pl.cdiv(Na, tile_m)
    C = pl.cdiv(Nb, tile_n)
    TML = tile_m // 128
    fa_p = _pad_to(fa.astype(jnp.float32), R * tile_m, 0)
    fb_p = _pad_to(fb.astype(jnp.float32), C * tile_n, 0)
    b2 = jnp.sum(fb * fb, axis=-1).astype(jnp.float32)
    bbias = jnp.where(mask_b.astype(bool), b2, BIG)
    bbias = _pad_to(bbias, C * tile_n, 0, value=BIG)[None, :]  # (1, NbP)

    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    grid = (R, C)
    out_min, out_idx = pl.pallas_call(
        functools.partial(_argmin_kernel, tn=tile_n, precision=prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_m, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_n, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, TML, 128), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TML, 128), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, TML, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, TML, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(fa_p, fb_p, bbias)

    min_flat = out_min.reshape(-1)[:Na]
    idx_flat = out_idx.reshape(-1)[:Na]
    # Reconstruct true sqdist: add back ||a||^2, clamp tiny negatives.
    a2 = jnp.sum(fa * fa, axis=-1).astype(jnp.float32)
    d2 = jnp.maximum(min_flat + a2, 0.0)
    ma = mask_a.astype(bool)
    idx_flat = jnp.where(ma, jnp.minimum(idx_flat, Nb - 1), 0)
    d2 = jnp.where(ma, d2, BIG)
    return idx_flat, d2


def mutual_match_pallas(
    fa: Array, mask_a: Array, fb: Array, mask_b: Array, **kw
) -> tuple[Array, Array, Array]:
    """Mutual-consistency match using the streaming kernel both ways."""
    idx_ab, d2_ab = nn_match_pallas(fa, mask_a, fb, mask_b, **kw)
    idx_ba, _ = nn_match_pallas(fb, mask_b, fa, mask_a, **kw)
    mutual = (idx_ba[idx_ab] == jnp.arange(fa.shape[0], dtype=jnp.int32)) & (
        mask_a.astype(bool)
    )
    return idx_ab, d2_ab, mutual


def _argmin_fused_kernel(
    a_ref, b_ref, bbias_ref, abias_ref,
    amin_ref, aidx_ref, bmin_ref, bidx_ref,
    *, tm: int, tn: int, precision,
):
    """One Gram tile serves BOTH match directions.

    a-side (rows): running (min, argmin) accumulated across the j sweep
    exactly like _argmin_kernel (the pattern proven on chip). b-side
    (columns): per-(i, j) PARTIAL tile minima written to distinct output
    blocks — every b-side block is visited exactly once, so there is no
    cross-sweep output revisiting for Mosaic to mishandle; the cheap
    final min-over-row-tiles reduction happens in XLA outside.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    a = a_ref[:]  # (TM, D)
    b = b_ref[:]  # (TN, D)
    g = -2.0 * jnp.dot(
        a, b.T, preferred_element_type=jnp.float32, precision=precision
    )  # (TM, TN)
    # a-side scores: + ||b||^2 (+BIG on masked b columns)
    sa = g + bbias_ref[:]
    shp_a = amin_ref.shape  # (1, TM // 128, 128)
    tile_min = jnp.min(sa, axis=1).reshape(shp_a)
    tile_arg = (
        jnp.argmin(sa, axis=1).astype(jnp.int32) + j * tn
    ).reshape(shp_a)

    @pl.when(j == 0)
    def _():
        amin_ref[:] = tile_min
        aidx_ref[:] = tile_arg

    @pl.when(j > 0)
    def _():
        cur = amin_ref[:]
        take = tile_min < cur
        amin_ref[:] = jnp.where(take, tile_min, cur)
        aidx_ref[:] = jnp.where(take, tile_arg, aidx_ref[:])

    # b-side scores: + ||a||^2 (+BIG on masked a rows), column-wise min
    sb = g + abias_ref[:].reshape(tm, 1)
    shp_b = bmin_ref.shape  # (1, TN // 128, 128)
    bmin_ref[:] = jnp.min(sb, axis=0).reshape(shp_b)
    bidx_ref[:] = (
        jnp.argmin(sb, axis=0).astype(jnp.int32) + i * tm
    ).reshape(shp_b)


@functools.partial(
    jax.jit, static_argnames=("tile_m", "tile_n", "interpret", "precision")
)
def mutual_match_pallas_fused(
    fa: Array,
    mask_a: Array,
    fb: Array,
    mask_b: Array,
    tile_m: int = 256,
    tile_n: int = 2048,
    interpret: bool = False,
    precision: str = "highest",
) -> tuple[Array, Array, Array]:
    """Mutual match with ONE kernel: each A·Bᵀ Gram tile feeds both the
    a→b and the b→a argmin, halving the MXU work and the kernel count of
    the surrounding program vs mutual_match_pallas (round-4 VERDICT: the
    bench-context fault bisect exonerated the kernel in isolation, so
    change its program context). Same contract as mutual_match_pallas /
    ops.knn.mutual_match.
    """
    Na, D = fa.shape
    Nb = fb.shape[0]
    assert tile_m % 128 == 0, "tile_m must be a multiple of 128 (lanes)"
    assert tile_n % 128 == 0, "tile_n must be a multiple of 128 (lanes)"
    R = pl.cdiv(Na, tile_m)
    C = pl.cdiv(Nb, tile_n)
    TML = tile_m // 128
    TNL = tile_n // 128
    fa_p = _pad_to(fa.astype(jnp.float32), R * tile_m, 0)
    fb_p = _pad_to(fb.astype(jnp.float32), C * tile_n, 0)
    b2 = jnp.sum(fb * fb, axis=-1).astype(jnp.float32)
    bbias = jnp.where(mask_b.astype(bool), b2, BIG)
    bbias = _pad_to(bbias, C * tile_n, 0, value=BIG)[None, :]
    a2 = jnp.sum(fa * fa, axis=-1).astype(jnp.float32)
    abias = jnp.where(mask_a.astype(bool), a2, BIG)
    abias = _pad_to(abias, R * tile_m, 0, value=BIG)[None, :]

    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    grid = (R, C)
    amin, aidx, bmin_p, bidx_p = pl.pallas_call(
        functools.partial(
            _argmin_fused_kernel, tm=tile_m, tn=tile_n, precision=prec
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_m, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_n, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_m), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, TML, 128), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TML, 128), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # partial b-side tiles: one distinct block per (i, j)
            pl.BlockSpec(
                (1, 1, TNL, 128), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, TNL, 128), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, TML, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, TML, 128), jnp.int32),
            jax.ShapeDtypeStruct((R, C, TNL, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, C, TNL, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # both dims sequential: the a-side accumulates across j and
            # the single v5e TensorCore gains nothing from `parallel`
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(fa_p, fb_p, bbias, abias)

    # a-side finalize (identical to nn_match_pallas)
    min_flat = amin.reshape(-1)[:Na]
    idx_ab = aidx.reshape(-1)[:Na]
    d2_ab = jnp.maximum(min_flat + a2, 0.0)
    ma = mask_a.astype(bool)
    idx_ab = jnp.where(ma, jnp.minimum(idx_ab, Nb - 1), 0)
    d2_ab = jnp.where(ma, d2_ab, BIG)

    # b-side finalize: min over the R partial row tiles (tiny XLA reduce:
    # R x Nb rows), then the same contract as nn_match_pallas(b->a)
    bmin = bmin_p.reshape(R, -1)[:, :Nb]  # (R, Nb)
    bidx = bidx_p.reshape(R, -1)[:, :Nb]
    best = jnp.argmin(bmin, axis=0)  # (Nb,)
    idx_ba = jnp.take_along_axis(bidx, best[None, :], axis=0)[0]
    mb = mask_b.astype(bool)
    idx_ba = jnp.where(mb, jnp.minimum(idx_ba, Na - 1), 0)

    mutual = (idx_ba[idx_ab] == jnp.arange(Na, dtype=jnp.int32)) & ma
    return idx_ab, d2_ab, mutual
