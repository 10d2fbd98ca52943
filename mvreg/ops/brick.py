"""Brick (block-sparse) execution plan for the sparse voxel conv.

Third conv schedule, designed from the on-chip evidence of rounds 2-3:

  * XLA's row gather is the sparse UNet's bottleneck (~1% MFU,
    r3_stages_taps.json) and Mosaic's dynamic gather is broken on this
    toolchain in both directions (r3_mosaic_probe*.log), so the
    gather-GEMM schedules cannot be fixed with a Pallas kernel here.
  * Gather cost scales with the number of gathered ROWS far more than
    with bytes (r3_gather_probe.log), and the kernel-map sort-joins are
    a third of the whole pipeline step.

The brick plan exploits the geometry: occupied voxels cluster on 2-D
surfaces, so group the voxel grid into 4x4x4 BRICKS and keep the ~V/8
occupied bricks dense. Per 3^3 conv:

    scatter V voxel rows into (Bc, 64, C) brick cells        [V rows]
    gather the 27 neighbor bricks per brick                  [27*Bc rows]
    assemble the 6^3 halo window, one dense batched
      lax.conv_general_dilated (VALID) -> (Bc, 4,4,4, Cout)  [pure MXU]
    gather the V output rows back                            [V rows]

vs the taps schedule's 27*V gathered rows: ~7x fewer rows, paying a
~4-6x dense-FLOP expansion that the idle MXU absorbs. The kernel map
disappears entirely — the plan needs one sort-join over BRICK keys
(28x smaller than the voxel-level join) per level.

Semantics identical to ops.sparse_conv.sparse_conv on the same voxel
set (missing neighbors contribute zeros; ~out_mask rows zeroed), up to
fp summation order. MinkowskiEngine counterpart: SURVEY.md §2.3/C2.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvreg.ops import voxel as vx

Array = jax.Array

BRICK = 4  # voxels per brick edge
CELLS = BRICK**3


class BrickPlan(NamedTuple):
    """Brick decomposition of one voxel level (static capacity Bc).

    voxel_slot: (V,) int32 — brick_slot * 64 + cell_id for valid voxels,
                Bc * 64 (dump row) otherwise.
    neighbors:  (27, Bc) int32 — brick slot of brick_coord + offset_k
                (dx-major order, voxel.neighbor_offsets(3)), or -1.
    brick_mask: (Bc,) bool.
    """

    voxel_slot: Array
    neighbors: Array
    brick_mask: Array


def build_brick_plan(
    keys: Array, coords: Array, mask: Array, brick_cap: int
) -> BrickPlan:
    """Build the brick tables for one voxel level.

    keys (V,) sorted packed voxel keys (SENTINEL-padded), coords (V, 3),
    mask (V,). Voxels in bricks beyond `brick_cap` are dropped (their
    rows land in the dump slot) — size capacity generously (~V/4; real
    fragments occupy 8-16 cells per surface brick).
    """
    V = keys.shape[0]
    bcoords = coords >> 2
    bkeys = jnp.where(mask, vx.pack_coords(bcoords), vx.SENTINEL)

    # unique brick keys with static capacity (the voxelize/coarsen sort
    # pattern: keys are already voxel-sorted so brick keys are sorted
    # too — but argsort anyway to stay robust to any key order).
    order = jnp.argsort(bkeys)
    sk = bkeys[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]]
    ) & (sk != vx.SENTINEL)
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    keep = first & (rank < brick_cap)
    slot = jnp.where(keep, rank, brick_cap)
    brick_keys = jnp.full(
        (brick_cap + 1,), vx.SENTINEL, jnp.int32
    ).at[slot].min(jnp.where(keep, sk, vx.SENTINEL))[:brick_cap]
    brick_mask = brick_keys != vx.SENTINEL

    in_cap = (sk != vx.SENTINEL) & (rank < brick_cap)
    bslot_sorted = jnp.where(in_cap, jnp.minimum(rank, brick_cap - 1), -1)
    bslot = jnp.full((V,), -1, jnp.int32).at[order].set(bslot_sorted)

    cell = coords & (BRICK - 1)
    cell_id = cell[:, 0] * 16 + cell[:, 1] * 4 + cell[:, 2]
    valid = mask & (bslot >= 0)
    voxel_slot = jnp.where(
        valid, bslot * CELLS + cell_id, brick_cap * CELLS
    ).astype(jnp.int32)

    # neighbor bricks: one (symmetric) sort-join over the brick keys —
    # 28x smaller than the voxel-level kernel map it replaces.
    neighbors = vx.kernel_map_sym(
        brick_keys, brick_mask, vx.neighbor_offsets(3)
    )
    return BrickPlan(
        voxel_slot=voxel_slot, neighbors=neighbors, brick_mask=brick_mask
    )


# per-axis (cell_start, size, window_start) of a neighbor brick's
# overlap with the central brick's 6^3 halo window (absolute cube
# coords [3, 9) of the 3-brick 12-cube)
_SLABS = {0: (3, 1, 0), 1: (0, 4, 1), 2: (0, 1, 5)}


def sparse_conv_brick(
    feats: Array,
    plan: BrickPlan,
    weights: Array,
    out_mask: Array,
    *,
    accum_dtype=jnp.float32,
    brick_chunk: int = 512,
    assembly: str = "pallas",
) -> Array:
    """Brick-dense sparse conv: feats (V, Cin) -> (V, Cout).

    weights (27, Cin, Cout) in the dx-major order of
    voxel.neighbor_offsets(3) (the ops.sparse_conv convention).
    brick_chunk bounds the transient halo-window memory: the 6^3
    windows + neighbor gathers materialize per chunk of bricks, not for
    the whole level at once (all-at-once OOM'ed the chip at bench scale
    inside the 16-fragment vmapped UNet, r3_bench_p8_brick.log).
    `assembly` selects the window-assembly backend:
      "pallas" (default) — VMEM piece-table kernel
        (ops/pallas/brick_assemble.py): XLA does only the wide-row
        neighbor-brick gather; assembly + im2col GEMM run in VMEM.
      "xla"  — round-3 form: 27 slab dynamic-update-slices into a 6^3
        halo window + an im2col stack through HBM (measured 1430 ms at
        2% MFU on chip, r3_stages_brick2.json — kept as the oracle).
      "xla2" — window assembly as in "xla" but the contraction as 27
        static strided-slice GEMMs over the window (no im2col
        materialization).
    """
    V, Cin = feats.shape
    Cout = weights.shape[-1]
    Bc = plan.brick_mask.shape[0]
    cdt = weights.dtype

    cells = jnp.zeros((Bc * CELLS + 1, Cin), cdt)
    cells = cells.at[plan.voxel_slot].set(feats.astype(cdt))
    # im2col weight layout: tap-major (k = dx*9+dy*3+dz) then Cin —
    # matches the column stacking below.
    w_flat = weights.astype(cdt).reshape(27 * Cin, Cout)

    nbT = plan.neighbors.T  # (Bc, 27)
    # Balanced chunking: ceil-split Bc into <=brick_chunk chunks, chunk
    # size rounded to a multiple of 16 (Pallas tile divisibility) — a
    # fixed CH=512 padded non-power-of-two capacities by up to 80%.
    def cdiv(a, b):
        return -(-a // b)

    n_chunks = cdiv(Bc, min(brick_chunk, Bc))
    CH = cdiv(cdiv(Bc, n_chunks), 16) * 16
    pad = n_chunks * CH - Bc
    if pad:
        nbT = jnp.concatenate(
            [nbT, jnp.full((pad, 27), -1, nbT.dtype)], axis=0
        )

    if assembly == "pallas":
        from mvreg.ops.pallas.brick_assemble import brick_assemble_conv

        # flat (Bc+1, 64, Cin) cell bricks with a zero brick at index Bc
        # for absent neighbors — the gather stays in XLA (wide rows).
        bricks_z = jnp.concatenate(
            [
                cells[: Bc * CELLS].reshape(Bc, CELLS, Cin),
                jnp.zeros((1, CELLS, Cin), cdt),
            ],
            axis=0,
        )
        interpret = jax.default_backend() == "cpu"

        def one_chunk_pl(nb_c):  # (CH, 27) -> (CH, 64, Cout)
            src = bricks_z[jnp.where(nb_c < 0, Bc, nb_c)]  # (CH,27,64,Cin)
            return brick_assemble_conv(src, w_flat, interpret=interpret)

        out = jax.lax.map(one_chunk_pl, nbT.reshape(n_chunks, CH, 27))
        flat = jnp.concatenate(
            [
                out.reshape((Bc + pad) * CELLS, Cout)[: Bc * CELLS],
                jnp.zeros((1, Cout), out.dtype),
            ],
            axis=0,
        )
        res = flat[plan.voxel_slot]
        return (res * out_mask[:, None]).astype(feats.dtype)

    bricks = cells[: Bc * CELLS].reshape(Bc, BRICK, BRICK, BRICK, Cin)

    def one_chunk(nb_c):  # (CH, 27) -> (CH, 4,4,4, Cout)
        win = jnp.zeros((CH, 6, 6, 6, Cin), cdt)
        for k in range(27):
            dx, dy, dz = k // 9, (k // 3) % 3, k % 3
            nb = nb_c[:, k]
            src = bricks[jnp.maximum(nb, 0)]  # (CH, 4,4,4, Cin)
            src = src * (nb >= 0)[:, None, None, None, None].astype(cdt)
            (cx, sx, wx) = _SLABS[dx]
            (cy, sy, wy) = _SLABS[dy]
            (cz, sz, wz) = _SLABS[dz]
            win = win.at[
                :, wx : wx + sx, wy : wy + sy, wz : wz + sz
            ].set(src[:, cx : cx + sx, cy : cy + sy, cz : cz + sz])
        if assembly == "xla2":
            # contraction as 27 strided-slice GEMMs over the window —
            # skips the 8x im2col cols materialization through HBM.
            acc = jnp.zeros((CH * CELLS, Cout), accum_dtype)
            for k in range(27):
                ox, oy, oz = k // 9, (k // 3) % 3, k % 3
                tap = win[
                    :, ox : ox + 4, oy : oy + 4, oz : oz + 4, :
                ].reshape(CH * CELLS, Cin)
                acc = acc + jnp.dot(
                    tap,
                    w_flat[k * Cin : (k + 1) * Cin],
                    preferred_element_type=accum_dtype,
                )
            return acc.reshape(CH, BRICK, BRICK, BRICK, Cout)
        # im2col + one big GEMM. lax.conv on (CH, 6,6,6, C) windows
        # measured 1.9% MFU on chip (tiny spatial dims defeat the conv
        # tiler — r3_stages_brick.log: UNet 1515 ms); the 27 static
        # window slices + a (CH*64, 27*Cin) @ (27*Cin, Cout) GEMM is
        # the MXU-native form of the same contraction.
        cols = jnp.stack(
            [
                win[:, k // 9 : k // 9 + 4,
                    (k // 3) % 3 : (k // 3) % 3 + 4,
                    k % 3 : k % 3 + 4, :]
                for k in range(27)
            ],
            axis=4,
        )  # (CH, 4, 4, 4, 27, Cin)
        out = jnp.dot(
            cols.reshape(CH * CELLS, 27 * Cin), w_flat,
            preferred_element_type=accum_dtype,
        )
        return out.reshape(CH, BRICK, BRICK, BRICK, Cout)

    out = jax.lax.map(
        one_chunk, nbT.reshape(n_chunks, CH, 27)
    )  # (n_chunks, CH, 4,4,4, Cout)
    flat = jnp.concatenate(
        [out.reshape((Bc + pad) * CELLS, Cout)[: Bc * CELLS],
         jnp.zeros((1, Cout), out.dtype)], axis=0
    )
    res = flat[plan.voxel_slot]
    return (res * out_mask[:, None]).astype(feats.dtype)
