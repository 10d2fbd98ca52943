"""Voxel quantization and neighbor maps — the sparse-tensor engine core.

TPU-native replacement for MinkowskiEngine's C++/CUDA coordinate manager
(`ME.utils.sparse_quantize`, `ME.CoordsManager`; SURVEY.md C1, §2.3 — the
single largest native dependency of the reference). Design:

  * Static shapes everywhere: every fragment is padded to a fixed voxel
    capacity `V` with an explicit mask; downstream ops thread the mask.
  * Voxel identity is an *injective* int32 packing of grid coordinates
    (10 bits/axis → 1024³ grid, 25.6 m span at 2.5 cm voxels), so
    uniqueness and neighbor lookup are exact — no hash collisions to
    reason about.
  * Unique-voxel extraction is sort-based (keys ascend, ranks by cumsum of
    first-occurrence flags): one `sort` + `segment` pass, all XLA.
  * Neighbor/kernel maps come from binary search over the sorted key table
    (`searchsorted`), giving a (K_offsets, V) index map consumed by the
    gather-GEMM sparse convolution in ops/sparse_conv.py.

Everything jits, vmaps over a fragment batch, and runs on-device; the
reference does this work on host CPU inside DataLoader workers
(SURVEY.md §3.1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

GRID_BITS = 10  # 1024 voxels per axis
GRID_SIZE = 1 << GRID_BITS
SENTINEL = jnp.iinfo(jnp.int32).max  # key for invalid/padded entries


def pack_coords(coords: Array) -> Array:
    """(..., 3) int32 in [0, 1024) -> injective int32 key."""
    return (
        (coords[..., 0] << (2 * GRID_BITS))
        | (coords[..., 1] << GRID_BITS)
        | coords[..., 2]
    )


def unpack_coords(key: Array) -> Array:
    """Inverse of pack_coords -> (..., 3) int32."""
    mask = GRID_SIZE - 1
    x = (key >> (2 * GRID_BITS)) & mask
    y = (key >> GRID_BITS) & mask
    z = key & mask
    return jnp.stack([x, y, z], axis=-1)


class VoxelGrid(NamedTuple):
    """Static-capacity sparse voxel set for one fragment.

    keys:        (V,) int32, sorted ascending, SENTINEL-padded
    coords:      (V, 3) int32 grid coordinates (garbage where ~mask)
    mask:        (V,) bool — valid voxels
    point2voxel: (P,) int32 — voxel slot of each input point (0 where the
                 point is invalid or overflowed capacity; check point_mask)
    point_mask:  (P,) bool — input-point validity after quantization
    origin:      (3,) float — world position of grid coordinate (0,0,0)
    voxel_size:  () float
    num_voxels:  () int32 — true unique count (<= V)
    """

    keys: Array
    coords: Array
    mask: Array
    point2voxel: Array
    point_mask: Array
    origin: Array
    voxel_size: Array
    num_voxels: Array

    @property
    def centers(self) -> Array:
        """World-space voxel centers (V, 3)."""
        return (
            self.origin
            + (self.coords.astype(self.origin.dtype) + 0.5) * self.voxel_size
        )


def voxelize(
    points: Array,
    point_mask: Array,
    voxel_size: float,
    capacity: int,
    origin: Array | None = None,
) -> VoxelGrid:
    """Quantize a point cloud to a static-capacity sparse voxel grid.

    Mirrors `ME.utils.sparse_quantize` at 2.5 cm (SURVEY.md C1) with
    TPU-friendly static shapes. Points outside the 1024³ grid around
    `origin` (default: min corner of the valid points) are dropped via
    point_mask.
    """
    P = points.shape[0]
    pm = point_mask.astype(bool)
    if origin is None:
        big = jnp.array(jnp.inf, points.dtype)
        origin = jnp.min(jnp.where(pm[:, None], points, big), axis=0)
        # Half-voxel margin keeps boundary points strictly inside cell 0;
        # fall back to 0 for an all-masked (empty) input.
        origin = jnp.where(
            jnp.any(pm), origin - 0.5 * voxel_size, jnp.zeros_like(origin)
        )
    coords = jnp.floor((points - origin) / voxel_size).astype(jnp.int32)
    in_grid = jnp.all((coords >= 0) & (coords < GRID_SIZE), axis=-1)
    valid = pm & in_grid
    keys = jnp.where(valid, pack_coords(jnp.clip(coords, 0, GRID_SIZE - 1)),
                     SENTINEL)

    # Sort-only unique extraction: no per-row gathers or scatters
    # anywhere (TPU row ops cost ~7 ns/row where the sort unit moves
    # the same data ~50x faster — r3_chainprof.json). argsort+gather
    # becomes one payload sort; the rank-compaction scatter becomes a
    # second sort (kept keys are ascending, so sorting the masked key
    # array IS the compaction); the route-back-to-point-order scatters
    # become one multi-operand sort on the permutation (sort-based
    # permutation inversion).
    iota_p = jnp.arange(P, dtype=jnp.int32)
    sorted_keys, order = jax.lax.sort([keys, iota_p], num_keys=1,
                                      is_stable=False)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]]
    ) & (sorted_keys != SENTINEL)
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1  # unique rank per point
    num_unique = jnp.where(
        jnp.any(sorted_keys != SENTINEL), rank[-1] + 1, 0
    ).astype(jnp.int32)

    keep = first & (rank < capacity)
    kept = jnp.where(keep, sorted_keys, SENTINEL)
    if P < capacity:
        kept = jnp.concatenate(
            [kept, jnp.full((capacity - P,), SENTINEL, jnp.int32)]
        )
    out_keys = jax.lax.sort(kept)[:capacity]
    vox_mask = out_keys != SENTINEL

    # Per-point voxel slot in original order.
    in_capacity = (sorted_keys != SENTINEL) & (rank < capacity)
    p2v_sorted = jnp.where(in_capacity, jnp.minimum(rank, capacity - 1), 0)
    _, point2voxel, pm_i = jax.lax.sort(
        [order, p2v_sorted, in_capacity.astype(jnp.int32)],
        num_keys=1, is_stable=False,
    )
    final_pm = pm_i.astype(bool)

    return VoxelGrid(
        keys=out_keys,
        coords=unpack_coords(out_keys) * vox_mask[:, None],
        mask=vox_mask,
        point2voxel=point2voxel,
        point_mask=final_pm,
        origin=origin,
        voxel_size=jnp.asarray(voxel_size, points.dtype),
        num_voxels=jnp.minimum(num_unique, capacity),
    )


def voxel_point_counts(grid: VoxelGrid, capacity: int | None = None) -> Array:
    """Number of source points per voxel, (V,) float32 (0 on padding)."""
    V = grid.keys.shape[0] if capacity is None else capacity
    w = grid.point_mask.astype(jnp.float32)
    return jax.ops.segment_sum(w, grid.point2voxel, num_segments=V)


def average_pool_points(
    grid: VoxelGrid, point_feats: Array, capacity: int | None = None
) -> Array:
    """Mean point feature per voxel, (V, C). Padded voxels get zeros."""
    V = grid.keys.shape[0] if capacity is None else capacity
    w = grid.point_mask.astype(point_feats.dtype)
    sums = jax.ops.segment_sum(
        point_feats * w[:, None], grid.point2voxel, num_segments=V
    )
    cnts = jax.ops.segment_sum(w, grid.point2voxel, num_segments=V)
    return sums / jnp.maximum(cnts, 1.0)[:, None]


def lookup(
    keys_sorted: Array, queries: Array, method: str = "rank"
) -> Array:
    """Find indices of `queries` in a sorted, SENTINEL-padded key table.

    Returns int32 indices into the table, or -1 where absent.

    method="rank" (default) is a pure-sort equi-join with ZERO
    per-row gathers or scatters — the round-3 discovery is that TPU
    per-row gather/scatter costs ~7 ns/row while the sort unit moves
    the same rows ~50x faster (runs/results/r3_chainprof.json: the
    raw 16x114k sort is 0.72 ms where the searchsorted-based L0 join
    was ~40 ms). Pipeline: one 2-key sort co-ranks [table; queries];
    a cummax carries the most recent table key forward (arr is
    ascending, so "last table key at or before p" == the candidate
    equality partner); a cumsum of the table-row indicator yields that
    entry's table position; a second sort on the original tags routes
    results back to query order (sort-based permutation inversion —
    never `.at[perm].set`).

    method="sort"/"scan" fall back to jnp.searchsorted lowerings
    (searchsorted's own rank inversion is a P-row scatter, which is
    what made it slow).
    """
    if method != "rank":
        pos = jnp.searchsorted(
            keys_sorted, queries.ravel(), method=method
        ).astype(jnp.int32).reshape(queries.shape)
        pos_c = jnp.minimum(pos, keys_sorted.shape[0] - 1)
        hit = (keys_sorted[pos_c] == queries) & (queries != SENTINEL)
        return jnp.where(hit, pos_c, -1)

    V = keys_sorted.shape[0]
    q = queries.ravel()
    Q = q.shape[0]
    arr = jnp.concatenate([keys_sorted, q])
    tag = jnp.arange(V + Q, dtype=jnp.int32)
    # 2-key sort: ties broken by tag, so each table entry precedes any
    # equal queries (tags [0, V) < query tags).
    arr_s, tag_s = jax.lax.sort([arr, tag], num_keys=2, is_stable=False)
    is_table = tag_s < V
    # Table position of the last table entry at/before p. Table rows
    # appear in ascending key order, so this running count IS that
    # entry's index in keys_sorted.
    tpos = jax.lax.cumsum(is_table.astype(jnp.int32)) - 1
    lo = jnp.iinfo(jnp.int32).min
    last_key = jax.lax.cummax(jnp.where(is_table, arr_s, lo))
    match = (~is_table) & (last_key == arr_s) & (arr_s != SENTINEL)
    res = jnp.where(match, jnp.maximum(tpos, 0), -1)
    # Route each result back to its query slot: sort by original tag
    # (tags are unique, so this is exact permutation inversion).
    _, res_q = jax.lax.sort([tag_s, res], num_keys=1, is_stable=False)
    return res_q[V:].reshape(queries.shape)


def neighbor_offsets(kernel_size: int) -> Array:
    """All (dz-major) integer offsets of a cubic kernel, (k³, 3) int32."""
    r = kernel_size // 2
    rng = range(-r, kernel_size - r)
    return jnp.array(
        [(dx, dy, dz) for dx in rng for dy in rng for dz in rng],
        dtype=jnp.int32,
    )


def sparse_offsets(taps: int, kernel_size: int = 3) -> Array:
    """Sparse-support subsets of the 3³ kernel, (taps, 3) int32.

    TPU design lever (round-4): the sparse conv is gather-ROW-bound
    (~8 ns/row regardless of width, r3_chainprof), so kernel support is
    nearly proportional to conv cost. Subsets keep the dx-major order
    of `neighbor_offsets` filtered in place, so they remain
    negation-symmetric around the center tap (offsets[K-1-k] ==
    -offsets[k]) — `kernel_map_sym` stays valid.

      27: full 3³ (the reference's MinkowskiEngine kernel, SURVEY C2)
      19: corners dropped (|dx|+|dy|+|dz| <= 2)
       7: center + 6 faces (the classic cross/submanifold stencil)

    Stacked cross kernels still grow diagonal receptive field (two
    7-tap convs cover the 13-tap ball), which is why submanifold nets
    get away with it; accuracy is re-verified per checkpoint.
    """
    if kernel_size != 3:
        assert taps == kernel_size**3, "subsets only defined for 3³"
        return neighbor_offsets(kernel_size)
    full = [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ]
    if taps == 27:
        keep = full
    elif taps == 19:
        keep = [o for o in full if sum(map(abs, o)) <= 2]
    elif taps == 7:
        keep = [o for o in full if sum(map(abs, o)) <= 1]
    else:
        raise ValueError(f"unsupported tap count {taps} (27|19|7)")
    return jnp.array(keep, dtype=jnp.int32)


def sparse_offset_indices(taps: int) -> list[int]:
    """Positions of the `taps` subset within the dx-major 27 list
    (for slicing 27-tap weights into sparse-support weights)."""
    import numpy as np

    full = neighbor_offsets(3)
    sub = sparse_offsets(taps)
    fa, sa = np.asarray(full), np.asarray(sub)
    return [int(np.where((fa == s).all(axis=1))[0][0]) for s in sa]


def kernel_map(
    grid_keys: Array, grid_mask: Array, offsets: Array,
    method: str = "rank",
) -> Array:
    """Kernel map (K, V): index of neighbor `coord + offset_k`, or -1.

    TPU-native equivalent of MinkowskiEngine's kernel-map construction
    (SURVEY.md §3.4): for each of the K kernel offsets, one vectorized
    packed-key shift + an equi-join against the sorted voxel table.
    `method` threads through to `lookup` ("rank" = pure-sort join;
    "sort" = jnp.searchsorted) so the config's lookup backends measure
    genuinely different code paths.
    """
    coords = unpack_coords(grid_keys)
    ncoords = coords[None, :, :] + offsets[:, None, :]  # (K, V, 3)
    in_grid = jnp.all((ncoords >= 0) & (ncoords < GRID_SIZE), axis=-1)
    ok = in_grid & grid_mask[None, :]
    nkeys = jnp.where(
        ok, pack_coords(jnp.clip(ncoords, 0, GRID_SIZE - 1)), SENTINEL
    )
    return lookup(grid_keys, nkeys, method=method)


def kernel_map_sym(
    grid_keys: Array, grid_mask: Array, offsets: Array
) -> Array:
    """kernel_map exploiting ± offset symmetry: half the sort work.

    The cubic offset list (neighbor_offsets ordering) satisfies
    offsets[K-1-k] == -offsets[k], and the map for -off is the partial
    inverse permutation of the map for +off (u is v's +off neighbor
    iff v is u's -off neighbor; coords are unique so the inverse is a
    collision-free scatter). So: sort-join only the first K//2 offsets
    (the dominant cost of plan building — the on-chip profile puts
    voxelize+kmaps at 34% of the whole pipeline step,
    r3_stages_taps.json), derive the rest with V-element scatters, and
    the center offset is the identity.
    """
    K = offsets.shape[0]
    half = K // 2
    # Requires a negation-symmetric offset list with the zero offset at
    # the center — true of neighbor_offsets(k) for odd k (the only
    # callers; a value-level assert here would break under jit tracing).
    assert K % 2 == 1, "kernel_map_sym needs an odd offset count"
    V = grid_keys.shape[0]
    coords = unpack_coords(grid_keys)
    ncoords = coords[None, :, :] + offsets[:half, None, :]
    in_grid = jnp.all((ncoords >= 0) & (ncoords < GRID_SIZE), axis=-1)
    ok = in_grid & grid_mask[None, :]
    nkeys = jnp.where(
        ok, pack_coords(jnp.clip(ncoords, 0, GRID_SIZE - 1)), SENTINEL
    )
    fwd = lookup(grid_keys, nkeys)  # (half, V)

    iota = jnp.arange(V, dtype=jnp.int32)

    def inv(km):
        valid = km >= 0
        tgt = jnp.where(valid, km, V)  # invalid rows land in a dump slot
        return (
            jnp.full((V + 1,), -1, jnp.int32)
            .at[tgt].set(jnp.where(valid, iota, -1))[:V]
        )

    bwd = jax.vmap(inv)(fwd)  # maps for -offsets, reversed order
    center = jnp.where(grid_mask, iota, -1)
    return jnp.concatenate(
        [fwd, center[None], bwd[::-1]], axis=0
    )


class PoolMap(NamedTuple):
    """Fine->coarse stride-2 relationship between two voxel levels.

    parent:       (Vf,) int32 — coarse slot of each fine voxel (0 if ~mask)
    child_offset: (Vf,) int32 in [0, 8) — fine voxel's octant in its parent
    mask:         (Vf,) bool
    """

    parent: Array
    child_offset: Array
    mask: Array


def coarsen(grid: VoxelGrid, capacity: int) -> tuple[VoxelGrid, PoolMap]:
    """Build the stride-2 coarser level and its pooling map.

    Stride-2 "generative" downsampling à la MinkowskiEngine stride-2 conv:
    coarse voxel set = unique(fine_coords // 2). The returned PoolMap
    drives both the downsampling conv (scatter-add of per-octant GEMMs) and
    the transpose conv back up (gather), replacing ME's strided kernel maps
    (SURVEY.md C2).
    """
    fine_coords = unpack_coords(grid.keys)
    parent_coords = fine_coords >> 1
    parent_keys = jnp.where(grid.mask, pack_coords(parent_coords), SENTINEL)

    # Sort-only unique extraction + route-back — same zero-row-op
    # pipeline as voxelize (see the comment there).
    Vf = grid.keys.shape[0]
    iota_f = jnp.arange(Vf, dtype=jnp.int32)
    sk, order = jax.lax.sort([parent_keys, iota_f], num_keys=1,
                             is_stable=False)
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]]) & (
        sk != SENTINEL
    )
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_unique = jnp.where(jnp.any(sk != SENTINEL), rank[-1] + 1, 0)

    keep = first & (rank < capacity)
    kept = jnp.where(keep, sk, SENTINEL)
    if Vf < capacity:
        kept = jnp.concatenate(
            [kept, jnp.full((capacity - Vf,), SENTINEL, jnp.int32)]
        )
    out_keys = jax.lax.sort(kept)[:capacity]
    vox_mask = out_keys != SENTINEL

    in_cap = (sk != SENTINEL) & (rank < capacity)
    p_sorted = jnp.where(in_cap, jnp.minimum(rank, capacity - 1), 0)
    _, parent, pm_i = jax.lax.sort(
        [order, p_sorted, in_cap.astype(jnp.int32)],
        num_keys=1, is_stable=False,
    )
    pmask = pm_i.astype(bool)

    oct_ = fine_coords & 1
    child_offset = oct_[:, 0] * 4 + oct_[:, 1] * 2 + oct_[:, 2]

    coarse = VoxelGrid(
        keys=out_keys,
        coords=unpack_coords(out_keys) * vox_mask[:, None],
        mask=vox_mask,
        point2voxel=parent,  # fine-voxel -> coarse-voxel map
        point_mask=pmask,
        origin=grid.origin,
        voxel_size=grid.voxel_size * 2.0,
        num_voxels=jnp.minimum(num_unique, capacity).astype(jnp.int32),
    )
    return coarse, PoolMap(parent=parent, child_offset=child_offset, mask=pmask)
