"""Pallas TPU kernel: transposed lane-gather sparse convolution.

Second-generation Pallas conv schedule. The first (sparse_conv_gather)
gathers feature ROWS with take_along_axis along the sublane axis — a
construct this toolchain's Mosaic cannot lower (crashes
tpu_compile_helper; bisected in runs/results/r3_mosaic_probe.log:
sublane-gather crashes, 1D gather is rejected "Only 2D gather is
supported", lane-direction gather is the supported form).

This kernel therefore keeps the feature table TRANSPOSED as (Cin, V):
channels on sublanes, voxels on lanes. Per kernel tap k,

    g[c, v] = featsT[c, kmap[k, v]]

is one lane-direction take_along_axis (the index vector broadcast
across sublanes — Mosaic's dynamic_gather), and the MXU contracts the
sublane axis directly: out[v, o] = sum_c g[c, v] * W[k][c, o], i.e. a
dot_general with the LHS contracting dim 0 — a layout the MXU consumes
natively, no transpose materialized.

Why it should beat the XLA schedules: the gathered operand never
round-trips to HBM (taps/fused re-materialize K x V x Cin words per
conv), and the gather itself runs as VREG shuffles instead of XLA's
scalar-loop lowering (measured 60x off pure-bandwidth on chip,
r3_stages_taps.json: UNet 1.05% MFU).

Contract identical to ops.sparse_conv.sparse_conv (kmap (K, V) int32,
-1 = invalid neighbor; rows with ~out_mask zeroed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _conv_kernel(kmap_ref, featsT_ref, w_ref, out_ref):
    k = pl.program_id(0)
    idx = kmap_ref[k, :]  # (V,) int32, -1 = invalid
    xT = featsT_ref[:]  # (Cin, V), resident across the K sweep
    idxm = jnp.broadcast_to(
        jnp.maximum(idx, 0)[None, :], xT.shape
    )  # (Cin, V)
    g = jnp.take_along_axis(xT, idxm, axis=1, mode="promise_in_bounds")
    g = jnp.where((idx >= 0)[None, :], g, 0.0)
    # out[v, o] = sum_c g[c, v] W[c, o]  (LHS contracts its sublane dim)
    part = jax.lax.dot_general(
        g, w_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == 0)
    def _():
        out_ref[:] = part

    @pl.when(k > 0)
    def _():
        out_ref[:] = out_ref[:] + part


@functools.partial(jax.jit, static_argnames=("interpret",))
def sparse_conv_lane(
    feats: Array,
    kmap: Array,
    weights: Array,
    out_mask: Array,
    interpret: bool = False,
) -> Array:
    """Lane-gather sparse conv: feats (V, Cin), kmap (K, V),
    weights (K, Cin, Cout) -> (V, Cout).

    out[v] = sum_k W[k]^T feats[kmap[k, v]] over valid neighbors; rows
    with ~out_mask zeroed. Matches ops.sparse_conv.sparse_conv.
    """
    K, V = kmap.shape
    Cin = feats.shape[-1]
    Cout = weights.shape[-1]
    cdt = weights.dtype
    featsT = feats.astype(cdt).T  # (Cin, V): channels->sublanes
    out = pl.pallas_call(
        _conv_kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((K, V), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (Cin, V), lambda k: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, Cin, Cout), lambda k: (k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (V, Cout), lambda k: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((V, Cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(kmap, featsT, weights)
    return (out * out_mask[:, None]).astype(feats.dtype)
