"""Sparse voxel convolution as gather → GEMM on the MXU.

TPU-native replacement for MinkowskiEngine's gather-GEMM-scatter sparse
convolution (SURVEY.md C2, §3.4 — where ~90% of reference inference
compute lives). Design:

  * A kernel map (K, V) of neighbor indices (built once per fragment by
    ops/voxel.kernel_map) turns the sparse 3³ conv into K gathers feeding
    one fused (V, K·Cin) @ (K·Cin, Cout) GEMM — a single large
    MXU-friendly contraction instead of 27 small ones, with XLA free to
    tile it. Invalid neighbors contribute zeros via masking, which is
    exactly the "no contribution" semantics of sparse convolution.
  * Stride-2 down/up sampling uses the octant PoolMap from ops/voxel:
    8 per-octant GEMMs + segment-sum scatter down, gather + per-octant
    GEMMs up (MinkowskiEngine's strided and transposed generative convs).
  * Everything is static-shaped and vmaps over a fragment batch; compute
    dtype is configurable (bfloat16 on the MXU, fp32 accumulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvreg.ops.voxel import PoolMap

Array = jax.Array


def sparse_conv(
    feats: Array,
    kmap: Array,
    weights: Array,
    out_mask: Array,
    *,
    accum_dtype=jnp.float32,
    impl: str = "fused",
) -> Array:
    """Sparse convolution: feats (V, Cin), kmap (K, V), weights (K, Cin, Cout).

    out[v] = Σ_k W[k]ᵀ feats[kmap[k, v]] over valid neighbors; rows with
    ~out_mask are zeroed.

    Three mathematically identical schedules (A/B on hardware with
    benchmarks/conv_microbench.py; HBM traffic, relayouts, and MXU shape
    differ):
      "fused"  gather -> (V, K·Cin) @ (K·Cin, Cout): one big GEMM, but the
               (K,V,C)->(V,K·C) relayout materializes K·V·C in HBM.
      "taps"   fori over K: out += feats[kmap[k]] @ W[k] — no relayout,
               K smaller GEMMs, peak memory V·C.
      "einsum" single kvc,kco->vo contraction — XLA picks the layout.
      "pallas" fused-gather Pallas kernel (ops/pallas/sparse_conv_gather):
               feature table VMEM-resident, per-tap Mosaic dynamic_gather
               + MXU GEMM, no K-expanded intermediate in HBM.
    """
    if impl.startswith("brick"):
        # kmap is a BrickPlan here (plan built with lookup="brick").
        # "brick" = Pallas VMEM assembly (default); "brick_xla"/"brick_xla2"
        # keep the round-3 XLA assembly forms for A/B (ops/brick.py).
        from mvreg.ops.brick import sparse_conv_brick

        assembly = {"brick": "pallas", "brick_xla": "xla",
                    "brick_xla2": "xla2"}[impl]
        return sparse_conv_brick(
            feats, kmap, weights, out_mask, accum_dtype=accum_dtype,
            assembly=assembly,
        )
    K, V = kmap.shape
    Cin = feats.shape[-1]
    if impl == "pallas":
        from mvreg.ops.pallas.sparse_conv_gather import sparse_conv_pallas

        return sparse_conv_pallas(
            feats, kmap, weights, out_mask,
            interpret=jax.default_backend() == "cpu",
            accum_dtype=accum_dtype,
        )
    if impl == "pallas2":
        # Transposed lane-gather schedule — the one whose gather Mosaic
        # can actually lower on this toolchain (see r3_mosaic_probe).
        from mvreg.ops.pallas.sparse_conv_lane import sparse_conv_lane

        return sparse_conv_lane(
            feats, kmap, weights, out_mask,
            interpret=jax.default_backend() == "cpu",
        )
    if impl == "taps":
        def tap(k, acc):
            idx = kmap[k]
            g = jnp.where((idx >= 0)[:, None], feats[jnp.maximum(idx, 0)], 0)
            return acc + jnp.dot(
                g, weights[k], preferred_element_type=accum_dtype
            )
        out = jax.lax.fori_loop(
            0, K, tap,
            jnp.zeros((V, weights.shape[-1]), accum_dtype),
            unroll=True,
        )
        return (out * out_mask[:, None]).astype(feats.dtype)

    valid = (kmap >= 0)[..., None]  # (K, V, 1)
    gathered = jnp.where(valid, feats[jnp.maximum(kmap, 0)], 0)  # (K, V, Cin)
    if impl == "einsum":
        out = jnp.einsum(
            "kvc,kco->vo", gathered, weights.astype(gathered.dtype),
            preferred_element_type=accum_dtype,
        )
        return (out * out_mask[:, None]).astype(feats.dtype)
    lhs = jnp.transpose(gathered, (1, 0, 2)).reshape(V, K * Cin)
    rhs = weights.reshape(K * Cin, -1)
    out = jnp.dot(lhs, rhs, preferred_element_type=accum_dtype)
    return (out * out_mask[:, None]).astype(feats.dtype)


def sparse_conv_down(
    feats: Array,
    pool: PoolMap,
    weights: Array,
    num_coarse: int,
    *,
    accum_dtype=jnp.float32,
) -> Array:
    """Stride-2 'generative' conv: fine (Vf, Cin) -> coarse (Vc, Cout).

    Each fine voxel multiplies by the weight of its octant within the
    parent (weights (8, Cin, Cout)) and scatter-adds into the parent —
    8 dense GEMMs + one segment_sum, no kernel-map search needed.
    """
    m = pool.mask.astype(feats.dtype)[:, None]
    contrib = jnp.zeros(
        (feats.shape[0], weights.shape[-1]), dtype=accum_dtype
    )
    for k in range(8):
        sel = (pool.child_offset == k).astype(feats.dtype)[:, None] * m
        contrib = contrib + jnp.dot(
            feats * sel, weights[k], preferred_element_type=accum_dtype
        )
    out = jax.ops.segment_sum(
        contrib, jnp.where(pool.mask, pool.parent, num_coarse),
        num_segments=num_coarse + 1,
    )[:num_coarse]
    return out.astype(feats.dtype)


def sparse_conv_up(
    feats_coarse: Array,
    pool: PoolMap,
    weights: Array,
    fine_mask: Array,
    *,
    accum_dtype=jnp.float32,
) -> Array:
    """Stride-2 transpose conv: coarse (Vc, Cin) -> fine (Vf, Cout).

    Adjoint of sparse_conv_down: gather the parent feature, apply the
    octant-specific weight (8, Cin, Cout).
    """
    parent_feats = feats_coarse[pool.parent]  # (Vf, Cin)
    out = jnp.zeros((parent_feats.shape[0], weights.shape[-1]), accum_dtype)
    for k in range(8):
        sel = (pool.child_offset == k).astype(parent_feats.dtype)[:, None]
        out = out + jnp.dot(
            parent_feats * sel, weights[k], preferred_element_type=accum_dtype
        )
    m = (pool.mask & fine_mask).astype(out.dtype)[:, None]
    return (out * m).astype(feats_coarse.dtype)


def dense_conv_reference(
    grid_coords: Array,
    grid_mask: Array,
    feats: Array,
    weights: Array,
    kernel_size: int,
    grid_shape: tuple[int, int, int],
) -> Array:
    """Oracle: densify the sparse tensor and run lax.conv (tests only).

    Semantics check for sparse_conv: identical results on any voxel set
    when sparse voxels are scattered into a dense grid, because sparse
    convolution == dense convolution restricted to occupied output sites.
    """
    V, Cin = feats.shape
    dense = jnp.zeros(grid_shape + (Cin,), feats.dtype)
    dense = dense.at[
        grid_coords[:, 0], grid_coords[:, 1], grid_coords[:, 2]
    ].add(feats * grid_mask[:, None])
    # lax.conv wants NCHW-ish: use NHWC-style via conv_general_dilated.
    out = jax.lax.conv_general_dilated(
        dense[None],  # (1, X, Y, Z, Cin)
        weights,  # (kx, ky, kz, Cin, Cout) — caller reshapes
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
    )[0]
    return out[grid_coords[:, 0], grid_coords[:, 1], grid_coords[:, 2]]
