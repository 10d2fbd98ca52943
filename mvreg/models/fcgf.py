"""FCGF-style sparse ResUNet descriptor network, Flax over mvreg sparse ops.

TPU-native counterpart of the reference's descriptor backbone
(`ref:lib/descriptor/fcgf.py::ResUNetBN2C`, vendored from Choy et al.'s
FCGF; SURVEY.md C2, §3.4): a 4-level sparse U-Net over 2.5 cm voxels
emitting a 32-D L2-normalized descriptor per voxel.

Architecture (channels mirror the reference's CHANNELS=[32,64,128,256] /
TR_CHANNELS=[...,64,64,128]; exact reference hyperparameters are
accuracy-level targets, not weight-level — SURVEY.md §7 hard-part 6):

  stem  conv3 1->32
  enc1  down2 32->64,  res(64)
  enc2  down2 64->128, res(128)
  enc3  down2 128->256, res(256)
  dec2  up2 256->128, cat skip(128), conv3 ->128, res(128)
  dec1  up2 128->64,  cat skip(64),  conv3 ->64,  res(64)
  dec0  up2 64->64,   cat skip(32),  conv3 ->64
  head  linear 64->32, L2 normalize

Key idiom shift vs the reference: coordinate management (kernel maps,
pool maps) is *data*, precomputed once per fragment by `build_unet_plan`
and fed to the net — so the jitted forward is pure GEMMs/gathers with
static shapes, and the same plan is reused by every layer at a level.
Normalization is masked BatchNorm (padding voxels excluded from stats).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvreg.models.layers import MaskedBatchNorm
from mvreg.ops import voxel as vx
from mvreg.ops.sparse_conv import sparse_conv, sparse_conv_down, sparse_conv_up

Array = jax.Array


class UNetPlan(NamedTuple):
    """Batched coordinate plan for one U-Net forward.

    masks:  per level l: (B, V_l) bool
    kmaps:  per level l: (B, K, V_l) int32 (K = kernel_size³)
    pools:  per transition l->l+1: batched PoolMap with (B, V_l) leaves
    counts: per level l: (B,) true voxel counts
    grids:  per level l: batched VoxelGrid (for centers/keys downstream)
    """

    masks: tuple[Array, ...]
    kmaps: tuple[Array, ...]
    pools: tuple[Any, ...]
    counts: tuple[Array, ...]
    grids: tuple[Any, ...]


def resolve_conv_impl(model_cfg, voxel_cfg, backend: str | None = None) -> str:
    """Concrete conv schedule for ``model.conv_impl="auto"``.

    The fused/taps gather-GEMM schedules and the dense-grid schedule are
    math-identical on the same voxel set (shared checkpoints), so the
    choice is purely a per-config performance call. Measured on TPU v5e
    (runs/results/descriptor_ab_scan*.json, bench_{fused,taps}_full.log):
    dense wins ~2x at eval scale (5 cm voxels, 64^3 grid, ~3% occupancy)
    and loses at bench scale (2.5 cm, 112^3, ~0.4% occupancy); at bench
    scale taps beats fused on the full pipeline (44.5 vs 39.7 fr/s — the
    fused (K,V,C)->(V,K*C) relayout is pure HBM traffic); on CPU the
    dense schedule is ~50x slower than the gather schedules at any
    scale, and fused beats taps (one big GEMM amortizes better there).
    Rule: accelerator + small dense grid (<= ~80^3 cells) -> dense;
    accelerator + big grid -> taps; CPU -> fused.
    (`dense_grid` must cover the fragment extent for dense to be exact;
    in_extent() masks out-of-grid voxels otherwise.)
    """
    ci = model_cfg.conv_impl
    if ci != "auto":
        return ci
    if backend is None:
        backend = jax.default_backend()
    cells = 1
    for g in voxel_cfg.dense_grid:
        cells *= int(g)
    if backend == "cpu":
        return "fused"
    if cells <= 600_000:
        return "dense"
    return "taps"


def plan_lookup(model_cfg, voxel_cfg) -> str:
    """Neighbor-lookup backend implied by the configured conv schedule:
    the dense-grid schedule needs no kernel/pool maps at all; the brick
    schedule builds brick tables instead of voxel-level kernel maps."""
    impl = resolve_conv_impl(model_cfg, voxel_cfg)
    if impl == "dense":
        return "dense"
    if impl.startswith("brick"):
        # The brick schedule assembles full 3^3 windows; its weight
        # layout is hard-coded to 27 taps (ops/brick.py
        # sparse_conv_brick) and silently ignoring a sparser support
        # would die with an opaque reshape error at trace time
        # (ADVICE r4). Reject the combination up front.
        kt = tuple(model_cfg.kernel_taps)
        if any(t != 27 for t in kt):
            raise ValueError(
                f"conv_impl={model_cfg.conv_impl!r} (brick schedule) "
                f"requires kernel_taps=(27,27,27,27); got {kt}. Use the "
                "taps/fused/dense schedules for sparse kernel support."
            )
        return "brick"
    return voxel_cfg.lookup


def build_unet_plan(
    points: Array,
    point_mask: Array,
    voxel_size: float,
    capacities: Sequence[int],
    kernel_size: int = 3,
    lookup: str = "sortjoin",
    brick_caps: Sequence[int] | None = None,
    taps: Sequence[int] | None = None,
) -> UNetPlan:
    """Voxelize a batch of fragments and precompute all level maps.

    points: (B, P, 3); point_mask: (B, P). capacities: voxel capacity per
    level (len = number of levels). All outputs are static-shaped.
    `lookup` picks the neighbor-lookup backend: "hash" (scatter-built
    open addressing, ~6 gather rounds) or "searchsorted" (binary search).
    `taps` selects the per-level kernel support (27|19|7 of the 3³
    stencil; see voxel.sparse_offsets) — kmaps[l] then has K=taps[l]
    rows and the model's kernel_taps must match.
    """
    levels = len(capacities)
    if taps is None:
        taps = (kernel_size**3,) * levels
    offs = [vx.sparse_offsets(int(t), kernel_size) for t in taps]
    if lookup == "dense":
        # Dense-grid schedule (ops/dense_grid.py): no kernel maps or pool
        # maps at all — the UNet runs as dense 3-D convs over a static
        # grid, so the plan is just the level-0 voxelization.
        def one_fragment_dense(pts, pm):
            g = vx.voxelize(pts, pm, voxel_size, capacities[0])
            return (g.mask,), (), (), (g.num_voxels,), (g,)

        masks, kmaps, pools, counts, grids = jax.vmap(one_fragment_dense)(
            points, point_mask
        )
        return UNetPlan(masks, kmaps, pools, counts, grids)
    if lookup == "brick":
        # Brick (block-sparse) plan: per-level brick tables replace the
        # voxel-level kernel maps entirely (ops/brick.py).
        from mvreg.ops.brick import build_brick_plan

        def one_fragment_brick(pts, pm):
            grids, pools = [], []
            g = vx.voxelize(pts, pm, voxel_size, capacities[0])
            grids.append(g)
            for l in range(1, levels):
                g, pool = vx.coarsen(g, capacities[l])
                grids.append(g)
                pools.append(pool)
            # Brick capacity: measured occupancy on bench-scale surface
            # fragments is ~V/8 bricks per level ([1004, 266, 67, 15]
            # for caps [8192..1024], r4 brick_microbench) — capacity/5
            # keeps >25% headroom at every level while cutting the dense
            # padding the round-3 //4 heuristic paid for 2-8x.
            bcaps = brick_caps or [
                max(capacities[l] // 5, 32) for l in range(levels)
            ]
            bplans = [
                build_brick_plan(
                    g.keys, g.coords, g.mask, brick_cap=int(bcaps[l])
                )
                for l, g in enumerate(grids)
            ]
            masks = [g.mask for g in grids]
            counts = [g.num_voxels for g in grids]
            return (
                tuple(masks), tuple(bplans), tuple(pools),
                tuple(counts), tuple(grids),
            )

        masks, kmaps, pools, counts, grids = jax.vmap(one_fragment_brick)(
            points, point_mask
        )
        return UNetPlan(masks, kmaps, pools, counts, grids)
    if lookup == "hash":
        from mvreg.ops.hash_table import kernel_map_hashed as kmap_fn
    elif lookup == "symjoin":
        # half the sort-join work via +/- offset symmetry (odd kernels)
        kmap_fn = (
            vx.kernel_map_sym if kernel_size % 2 == 1 else vx.kernel_map
        )
    elif lookup == "searchsorted":
        # genuine binary-search backend (ADVICE r3: was silently
        # aliased to the rank join)
        import functools

        kmap_fn = functools.partial(vx.kernel_map, method="sort")
    elif lookup == "sortjoin":
        kmap_fn = vx.kernel_map
    else:
        raise ValueError(f"unknown lookup backend {lookup}")

    def one_fragment(pts, pm):
        grids, pools = [], []
        g = vx.voxelize(pts, pm, voxel_size, capacities[0])
        grids.append(g)
        for l in range(1, levels):
            g, pool = vx.coarsen(g, capacities[l])
            grids.append(g)
            pools.append(pool)
        kmaps = [
            kmap_fn(g.keys, g.mask, offs[l]) for l, g in enumerate(grids)
        ]
        masks = [g.mask for g in grids]
        counts = [g.num_voxels for g in grids]
        return tuple(masks), tuple(kmaps), tuple(pools), tuple(counts), tuple(grids)

    masks, kmaps, pools, counts, grids = jax.vmap(one_fragment)(
        points, point_mask
    )
    return UNetPlan(masks, kmaps, pools, counts, grids)


class SparseConv(nn.Module):
    """Batched sparse conv layer (shared weights, vmapped over fragments).

    `dtype` is the compute dtype (bfloat16 halves gather bytes and doubles
    MXU rate); parameters and accumulation stay float32.
    """

    features: int
    kernel_volume: int = 27
    dtype: Any = jnp.float32
    impl: str = "fused"

    @nn.compact
    def __call__(self, x: Array, kmap: Array | None, mask: Array) -> Array:
        Cin = x.shape[-1]
        W = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (self.kernel_volume, Cin, self.features),
        )
        Wc = W.astype(self.dtype)
        xc = x.astype(self.dtype)
        if x.ndim == 5:  # dense (B, X, Y, Z, C) grid schedule
            from mvreg.ops.dense_grid import conv3

            if self.kernel_volume != 27:
                # sparse-support kernel: absent taps are zeros in the
                # dense 3^3 weight (identical math to the masked gather)
                idx = jnp.asarray(
                    vx.sparse_offset_indices(self.kernel_volume)
                )
                Wc = (
                    jnp.zeros((27,) + W.shape[1:], Wc.dtype).at[idx].set(Wc)
                )
            return conv3(xc, Wc)
        return jax.vmap(
            lambda f, k, m: sparse_conv(f, k, Wc, m, impl=self.impl)
        )(xc, kmap, mask)


class SparseDown(nn.Module):
    """Stride-2 generative down conv over the octant pool map."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, pool, num_coarse: int) -> Array:
        Cin = x.shape[-1]
        W = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (8, Cin, self.features),
        )
        Wc = W.astype(self.dtype)
        xc = x.astype(self.dtype)
        if x.ndim == 5:  # dense grid schedule: stride-2 kernel-2 conv
            from mvreg.ops.dense_grid import conv_down2

            return conv_down2(xc, Wc)
        return jax.vmap(
            lambda f, p: sparse_conv_down(f, p, Wc, num_coarse)
        )(xc, pool)


class SparseUp(nn.Module):
    """Stride-2 transpose conv over the octant pool map."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, pool, fine_mask: Array) -> Array:
        Cin = x.shape[-1]
        W = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (8, Cin, self.features),
        )
        Wc = W.astype(self.dtype)
        xc = x.astype(self.dtype)
        if x.ndim == 5:  # dense grid schedule: stride-2 transpose conv
            from mvreg.ops.dense_grid import conv_up2

            return conv_up2(xc, Wc)
        return jax.vmap(
            lambda f, p, m: sparse_conv_up(f, p, Wc, m)
        )(xc, pool, fine_mask)


class ResBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32
    impl: str = "fused"
    kernel_volume: int = 27

    @nn.compact
    def __call__(self, x: Array, kmap: Array, mask: Array, train: bool) -> Array:
        h = SparseConv(
            self.features, kernel_volume=self.kernel_volume,
            dtype=self.dtype, impl=self.impl,
        )(x, kmap, mask)
        h = MaskedBatchNorm()(h, mask, train)
        h = nn.relu(h)
        h = SparseConv(
            self.features, kernel_volume=self.kernel_volume,
            dtype=self.dtype, impl=self.impl,
        )(h, kmap, mask)
        h = MaskedBatchNorm()(h, mask, train)
        return nn.relu(h + x)


class FCGF(nn.Module):
    """Sparse ResUNet descriptor: (plan, feats) -> 32-D unit descriptors.

    `compute_dtype="bfloat16"` runs the conv stack in bf16 (f32 params,
    f32 BatchNorm and output head) — the standard TPU mixed-precision
    recipe.
    """

    channels: Sequence[int] = (32, 64, 128, 256)
    out_dim: int = 32
    compute_dtype: str = "float32"
    remat: bool = False  # rematerialize ResBlocks (memory for FLOPs)
    conv_impl: str = "fused"  # schedule: fused|taps|einsum|dense|pallas
    dense_grid: tuple[int, int, int] = (96, 96, 96)  # conv_impl="dense"
    # per-level kernel support (27|19|7); must match the plan's taps
    kernel_taps: Sequence[int] = (27, 27, 27, 27)

    @nn.compact
    def __call__(self, plan: UNetPlan, feats: Array, train: bool = False) -> Array:
        c = self.channels
        dt = jnp.dtype(self.compute_dtype)
        Block = (
            nn.remat(ResBlock, static_argnums=(4,)) if self.remat else ResBlock
        )
        masks, kmaps, pools = plan.masks, plan.kmaps, plan.pools
        caps = [m.shape[-1] for m in masks]
        row_mask = plan.masks[0]
        dense = self.conv_impl == "dense"
        if dense:
            # Dense-grid schedule (ops/dense_grid.py): scatter the level-0
            # voxel rows into a static grid once, run the whole UNet as
            # 3-D convs with per-level occupancy masks (identical math to
            # the gather-GEMM schedule on the same voxel set), gather rows
            # back for the head. No kernel/pool maps needed.
            from mvreg.ops import dense_grid as dg

            coords = plan.grids[0].coords
            row_mask = row_mask & dg.in_extent(coords, self.dense_grid)
            occ = dg.occupancy(coords, row_mask, self.dense_grid)
            occs = [occ]
            for _ in range(len(c) - 1):
                occ = dg.coarsen_occupancy(occ)
                occs.append(occ)
            masks = tuple(o.astype(bool) for o in occs)
            kmaps = (None,) * len(c)
            pools = (None,) * len(c)
            caps = [0] * len(c)
            feats = dg.scatter_rows(feats, coords, row_mask, self.dense_grid)

        # Stem
        ci = self.conv_impl
        kt = tuple(self.kernel_taps)
        h0 = SparseConv(c[0], kernel_volume=kt[0], dtype=dt, impl=ci)(
            feats, kmaps[0], masks[0]
        )
        h0 = MaskedBatchNorm()(h0, masks[0], train)
        h0 = nn.relu(h0)
        h0 = Block(c[0], dtype=dt, impl=ci, kernel_volume=kt[0])(
            h0, kmaps[0], masks[0], train
        )

        # Encoder
        skips = [h0]
        h = h0
        for l in range(1, len(c)):
            h = SparseDown(c[l], dtype=dt)(h, pools[l - 1], caps[l])
            h = MaskedBatchNorm()(h, masks[l], train)
            h = nn.relu(h)
            h = Block(c[l], dtype=dt, impl=ci, kernel_volume=kt[l])(
                h, kmaps[l], masks[l], train
            )
            skips.append(h)

        # Decoder
        for l in range(len(c) - 2, -1, -1):
            tr = max(c[l], 64) if l > 0 else 64
            h = SparseUp(tr, dtype=dt)(h, pools[l], masks[l])
            h = MaskedBatchNorm()(h, masks[l], train)
            h = nn.relu(h)
            h = jnp.concatenate([h, skips[l]], axis=-1)
            h = SparseConv(tr, kernel_volume=kt[l], dtype=dt, impl=ci)(
                h, kmaps[l], masks[l]
            )
            h = MaskedBatchNorm()(h, masks[l], train)
            h = nn.relu(h)
            if l > 0:
                h = Block(tr, dtype=dt, impl=ci, kernel_volume=kt[l])(
                    h, kmaps[l], masks[l], train
                )

        if dense:
            from mvreg.ops import dense_grid as dg

            h = dg.gather_rows(h, plan.grids[0].coords, row_mask)

        # Head: 1x1 linear + L2 normalization (no nonlinearity, as in FCGF).
        # Smooth rsqrt form: finite gradient at the exact-zero padded rows.
        out = nn.Dense(self.out_dim)(h)
        out = out * jax.lax.rsqrt(
            jnp.sum(out * out, axis=-1, keepdims=True) + 1e-12
        )
        return out * row_mask[..., None]
