"""Pallas TPU kernel: streaming masked soft-argmax matching.

Differentiable correspondence positions y_i = Σ_j softmax_j(-d²_ij/τ)·p_j
([B:north_star] "Pallas kernels for ... soft-argmax matching"; XLA
reference implementation: mvreg.ops.knn.soft_match). The (Na, Nb) logit
matrix never materializes: column tiles of B stream through the MXU and
an online-softmax accumulator (running max m, denominator l, weighted
position sum) stays resident in VMEM across the sweep — the
flash-attention recurrence with voxel centers as the "values".

Forward runs the kernel; backward (jax.custom_vjp) recomputes through
the chunked XLA reference, so gradients reach the descriptor network
exactly as with ops.knn.soft_match.

Position "values" ride in a 128-lane buffer (first 3 lanes real) to keep
the accumulator MXU/VPU tile-aligned; the extra lanes are zeros and cost
one wider GEMM per tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvreg.ops import knn as _knn

Array = jax.Array

BIG = jnp.float32(1e30)
VLANES = 128  # padded value width (positions use lanes 0..2)


def _soft_kernel(a_ref, b_ref, bbias_ref, pos_ref, m_ref, l_ref, acc_ref,
                 *, inv_tau: float):
    j = pl.program_id(1)
    a = a_ref[:]  # (TM, D)
    b = b_ref[:]  # (TN, D)
    # logits = -(||a||² - 2a·b + ||b||²)/τ; the row-constant ||a||² shifts
    # every logit of a row equally — softmax-invariant, dropped. bbias
    # carries ||b||² + BIG·(1-valid) so masked columns underflow to 0.
    s = (
        2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        - bbias_ref[:]
    ) * inv_tau  # (TM, TN)
    tile_max = jnp.max(s, axis=1)  # (TM,)
    # m/l row accumulators live as (1, TM/128, 128) blocks (Mosaic's
    # (sublane, lane) tiling rule — a flat (1, TM) block fails to lower
    # on chip, r3_matchmb_chip) and are reshaped to (TM,) for compute.
    shp = m_ref.shape

    @pl.when(j == 0)
    def _():
        m_ref[:] = tile_max.reshape(shp)
        p = jnp.exp(s - tile_max[:, None])
        l_ref[:] = jnp.sum(p, axis=1).reshape(shp)
        acc_ref[:] = jnp.dot(
            p, pos_ref[:], preferred_element_type=jnp.float32
        )

    @pl.when(j > 0)
    def _():
        m_old = m_ref[:].reshape(-1)  # (TM,)
        m_new = jnp.maximum(m_old, tile_max)
        alpha = jnp.exp(m_old - m_new)  # (TM,)
        p = jnp.exp(s - m_new[:, None])  # (TM, TN)
        m_ref[:] = m_new.reshape(shp)
        l_ref[:] = (
            l_ref[:].reshape(-1) * alpha + jnp.sum(p, axis=1)
        ).reshape(shp)
        acc_ref[:] = acc_ref[:] * alpha[:, None] + jnp.dot(
            p, pos_ref[:], preferred_element_type=jnp.float32
        )


def _pad_to(x: Array, n: int, axis: int, value=0) -> Array:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=("temperature", "tile_m", "tile_n", "interpret"),
)
def _soft_match_fwd_impl(
    fa, mask_a, fb, mask_b, points_b, temperature,
    tile_m: int, tile_n: int, interpret: bool,
):
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
    bbias = _pad_to(bbias, C * tile_n, 0, value=BIG)[None, :]
    pos = _pad_to(
        _pad_to(points_b.astype(jnp.float32), C * tile_n, 0), VLANES, 1
    )

    inv_tau = 1.0 / float(temperature)
    grid = (R, C)
    m, l, acc = pl.pallas_call(
        functools.partial(_soft_kernel, inv_tau=inv_tau),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, VLANES), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TML, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TML, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, VLANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, TML, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, TML, 128), jnp.float32),
            jax.ShapeDtypeStruct((R * tile_m, VLANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(fa_p, fb_p, bbias, pos)

    denom = l.reshape(-1)[:Na]
    y = acc[:Na, :3] / jnp.maximum(denom, 1e-30)[:, None]
    return y * mask_a.astype(y.dtype)[:, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _soft_match_core(fa, mask_a, fb, mask_b, points_b,
                     temperature, tile_m, tile_n, interpret):
    # masks arrive as float32 (public wrapper casts) so their cotangents
    # are plain zeros rather than bool/float0 special cases.
    return _soft_match_fwd_impl(
        fa, mask_a > 0.5, fb, mask_b > 0.5, points_b, temperature,
        tile_m, tile_n, interpret,
    )


def _fwd(fa, mask_a, fb, mask_b, points_b, temperature, tm, tn, interp):
    y = _soft_match_core(
        fa, mask_a, fb, mask_b, points_b, temperature, tm, tn, interp
    )
    return y, (fa, mask_a, fb, mask_b, points_b)


def _bwd(temperature, tm, tn, interp, res, g):
    fa, mask_a, fb, mask_b, points_b = res
    # Recompute through the chunked XLA reference: same math, standard AD.
    _, vjp = jax.vjp(
        lambda fa_, fb_, pb_: _knn.soft_match(
            fa_, mask_a > 0.5, fb_, mask_b > 0.5, pb_, temperature
        ),
        fa, fb, points_b,
    )
    dfa, dfb, dpb = vjp(g)
    return dfa, jnp.zeros_like(mask_a), dfb, jnp.zeros_like(mask_b), dpb


_soft_match_core.defvjp(_fwd, _bwd)


def soft_match_pallas(
    fa: Array,
    mask_a: Array,
    fb: Array,
    mask_b: Array,
    points_b: Array,
    temperature: float = 0.02,
    tile_m: int = 256,
    tile_n: int = 512,
    interpret: bool = False,
) -> Array:
    """Soft correspondence positions (Na, 3); contract of knn.soft_match.

    Differentiable w.r.t. fa, fb, points_b (Pallas forward, XLA-recompute
    backward).
    """
    return _soft_match_core(
        fa, mask_a.astype(jnp.float32), fb, mask_b.astype(jnp.float32),
        points_b, float(temperature), tile_m, tile_n, interpret,
    )
