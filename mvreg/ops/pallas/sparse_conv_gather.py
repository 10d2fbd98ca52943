"""Pallas TPU kernel: fused gather-GEMM sparse convolution.

The XLA schedules in ops/sparse_conv.py ("fused"/"taps"/"einsum") all
materialize the gathered neighbor features in HBM between the gather and
the GEMM — K=27x the feature bytes per layer, which makes the descriptor
UNet bandwidth-bound (SURVEY.md §3.4: ~90% of reference inference
compute; conv_microbench shows the relayout/gather traffic dominating).

This kernel keeps the whole feature table VMEM-resident (static voxel
capacities are <= 8192x32 / 1024x256 = 0.5 MB per level, far under the
~16 MB VMEM budget) and sweeps the K kernel taps as a sequential grid
dimension: per tap, a Mosaic ``dynamic_gather`` (the one gather shape
TPU supports: take_along_axis with indices broadcast across lanes)
pulls the neighbor rows, and the MXU contracts them against that tap's
(Cin, Cout) weight into a resident accumulator. HBM traffic per conv
drops from ~3*K*V*Cin words to V*Cin + K*V (indices) + out.

Contract identical to ops.sparse_conv.sparse_conv (kmap (K, V) int32
with -1 = invalid neighbor; rows with ~out_mask zeroed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _conv_kernel(kmap_ref, feats_ref, w_ref, out_ref, *, accum_dtype):
    # The whole (K, V) kmap stays VMEM-resident (block == full array, so
    # Mosaic's (8, 128) tiling rule is satisfied; a (1, V) row block is
    # not lowerable — its sublane dim is neither 8-aligned nor full) and
    # row k is sliced here instead of via the BlockSpec index map.
    k = pl.program_id(0)
    idx = kmap_ref[k, :]  # (V,) int32, -1 = invalid
    valid = idx >= 0
    feats = feats_ref[:]  # (V, Cin), resident across the K sweep
    idxm = jnp.broadcast_to(
        jnp.maximum(idx, 0)[:, None], feats.shape
    )  # (V, Cin)
    g = jnp.take_along_axis(feats, idxm, axis=0, mode="promise_in_bounds")
    g = jnp.where(valid[:, None], g, jnp.zeros_like(g))
    part = jnp.dot(g, w_ref[0], preferred_element_type=accum_dtype)

    @pl.when(k == 0)
    def _():
        out_ref[:] = part

    @pl.when(k > 0)
    def _():
        out_ref[:] = out_ref[:] + part


@functools.partial(jax.jit, static_argnames=("interpret", "accum_dtype"))
def sparse_conv_pallas(
    feats: Array,
    kmap: Array,
    weights: Array,
    out_mask: Array,
    interpret: bool = False,
    accum_dtype=jnp.float32,
) -> Array:
    """Fused-gather sparse conv: feats (V, Cin), kmap (K, V),
    weights (K, Cin, Cout) -> (V, Cout).

    out[v] = sum_k W[k]^T feats[kmap[k, v]] over valid neighbors; rows
    with ~out_mask zeroed. Matches ops.sparse_conv.sparse_conv.
    """
    K, V = kmap.shape
    Cin = feats.shape[-1]
    Cout = weights.shape[-1]
    out = pl.pallas_call(
        functools.partial(_conv_kernel, accum_dtype=accum_dtype),
        grid=(K,),
        in_specs=[
            pl.BlockSpec((K, V), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, Cin), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, Cin, Cout), lambda k: (k, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (V, Cout), lambda k: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((V, Cout), accum_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(kmap, feats.astype(weights.dtype), weights)
    return (out * out_mask[:, None]).astype(feats.dtype)
