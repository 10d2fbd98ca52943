"""Dense-grid execution helpers for the voxel UNet (`conv_impl="dense"`).

TPU-first alternative schedule for the sparse convolution backbone
(SURVEY.md C2): instead of gather-GEMM over precomputed kernel maps, the
sparse voxel set is scattered once into a static dense (X, Y, Z, C) grid
and the whole UNet runs as `lax.conv_general_dilated` 3-D convolutions
with occupancy masking after every normalization. Rationale (scaling-book
mental model): the MXU has FLOPs to burn while random-row gathers are the
measured bottleneck of the gather-GEMM schedule — at the ~1-3 % occupancy
of indoor fragments, trading a constant-factor FLOP increase for fully
regular memory access wins, and the expensive kernel-map construction
(sort joins per level) disappears entirely.

Semantics are *identical* to the sparse schedule on the same voxel set:
sparse convolution == dense convolution restricted to occupied sites,
stride-2 "generative" downsampling == stride-2 kernel-2 dense conv
(children of an unoccupied parent are all zero), and the transpose conv
mirrors it — verified row-for-row against the gather-GEMM path in
tests/test_dense_unet.py. Reference counterpart: MinkowskiEngine's
C++/CUDA coordinate manager + gather-GEMM-scatter (SURVEY.md §2.3), which
this schedule replaces without any neighbor bookkeeping at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

CONV_DN = ("NXYZC", "XYZIO", "NXYZC")


def in_extent(coords: Array, grid_shape: tuple[int, int, int]) -> Array:
    """(..., 3) int coords -> bool mask of rows inside the static grid."""
    lim = jnp.asarray(grid_shape, coords.dtype)
    return jnp.all((coords >= 0) & (coords < lim), axis=-1)


def scatter_rows(
    feats: Array, coords: Array, mask: Array, grid_shape: tuple[int, int, int]
) -> Array:
    """Scatter (B, V, C) voxel rows into a dense (B, X, Y, Z, C) grid.

    Rows outside `grid_shape` or with ~mask contribute nothing. Distinct
    valid rows never collide (coords are unique per fragment), so `.add`
    is exact.
    """
    ok = mask & in_extent(coords, grid_shape)
    c = jnp.where(ok[..., None], coords, 0)

    def one(f, cc, m):
        g = jnp.zeros(grid_shape + (f.shape[-1],), f.dtype)
        return g.at[cc[:, 0], cc[:, 1], cc[:, 2]].add(f * m[:, None])

    return jax.vmap(one)(feats, c, ok.astype(feats.dtype))


def gather_rows(grid: Array, coords: Array, mask: Array) -> Array:
    """Gather (B, V, C) rows back out of a dense (B, X, Y, Z, C) grid."""
    gs = grid.shape[1:4]
    ok = mask & in_extent(coords, gs)
    c = jnp.where(ok[..., None], coords, 0)

    def one(g, cc, m):
        return g[cc[:, 0], cc[:, 1], cc[:, 2]] * m[:, None]

    return jax.vmap(one)(grid, c, ok.astype(grid.dtype))


def occupancy(
    coords: Array, mask: Array, grid_shape: tuple[int, int, int]
) -> Array:
    """Dense (B, X, Y, Z) float occupancy {0, 1} of the voxel set."""
    ok = mask & in_extent(coords, grid_shape)
    c = jnp.where(ok[..., None], coords, 0)

    def one(cc, m):
        g = jnp.zeros(grid_shape, jnp.float32)
        return g.at[cc[:, 0], cc[:, 1], cc[:, 2]].max(m)

    return jax.vmap(one)(c, ok.astype(jnp.float32))


def coarsen_occupancy(occ: Array) -> Array:
    """Stride-2 occupancy: parent occupied iff any child is — exactly the
    sparse level set produced by `voxel.coarsen` (unique of coords >> 1)."""
    return jax.lax.reduce_window(
        occ, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 2),
        window_strides=(1, 2, 2, 2),
        padding="VALID",
    )


def conv3(x: Array, weights: Array, *, accum_dtype=jnp.float32) -> Array:
    """3-D SAME convolution; weights (K, Cin, Cout) with K = k³ in the
    dx-major order of `voxel.neighbor_offsets` (offset o ↔ tap o + r)."""
    K = weights.shape[0]
    k = round(K ** (1.0 / 3.0))
    w = weights.reshape(k, k, k, weights.shape[1], weights.shape[2])
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=CONV_DN, preferred_element_type=accum_dtype,
    ).astype(x.dtype)


def conv_down2(x: Array, weights: Array, *, accum_dtype=jnp.float32) -> Array:
    """Stride-2 kernel-2 conv; weights (8, Cin, Cout), octant index
    o = 4·ox + 2·oy + oz matching `voxel.PoolMap.child_offset`."""
    w = weights.reshape(2, 2, 2, weights.shape[1], weights.shape[2])
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(2, 2, 2), padding="VALID",
        dimension_numbers=CONV_DN, preferred_element_type=accum_dtype,
    ).astype(x.dtype)


def conv_up2(x: Array, weights: Array, *, accum_dtype=jnp.float32) -> Array:
    """Transpose of conv_down2: fine site f gets W[octant(f)] · coarse[f>>1].

    Implemented as the stride-2 kernel-2 transposed convolution.
    """
    w = weights.reshape(2, 2, 2, weights.shape[1], weights.shape[2])
    # transpose_kernel=True makes this the exact adjoint of conv_down2
    # (out[f] = W[octant(f)] · in[f >> 1]); it expects the kernel with
    # I/O swapped, i.e. shaped as the corresponding forward conv's.
    return jax.lax.conv_transpose(
        x, jnp.swapaxes(w, 3, 4).astype(x.dtype), strides=(2, 2, 2),
        padding="VALID", dimension_numbers=CONV_DN, transpose_kernel=True,
        preferred_element_type=accum_dtype,
    ).astype(x.dtype)
