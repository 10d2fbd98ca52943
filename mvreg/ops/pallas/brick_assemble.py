"""Pallas TPU kernel: brick halo assembly + im2col GEMM in VMEM.

The brick (block-sparse) conv schedule (ops/brick.py) lost on chip in
exactly one place: XLA's lowering of the window-assembly data movement
(27 slab dynamic-update-slices + an 8x im2col materialization through
HBM per chunk -> 1430 ms at 2% MFU, r3_stages_brick2.json), while its
PLAN side already beat every kernel-map schedule (184 -> 66 ms). This
kernel moves that assembly where it belongs: VMEM.

Design constraints (from the round-3 toolchain evidence):
  * Mosaic dynamic gather is broken in both directions on this
    toolchain (r3_mosaic_probe{,2}.log), so the kernel contains NO
    dynamic indexing at all. The only dynamic step — fetching the 27
    neighbor bricks per brick — happens in XLA as a wide-row gather
    (64*Cin-byte rows; row-gather cost is per ROW, so brick rows are
    ~64x cheaper per byte than the voxel-row gathers of the taps
    schedule, r3_gather_probe.log).
  * Inside the kernel everything is compile-time static: for tap k the
    output cells split per axis into (main-run, boundary) pieces by
    which neighbor brick the shifted cell lands in; the resulting piece
    table (125 slabs, ~650 contiguous row-run copies) is generated in
    Python at trace time.

Dataflow per grid step (TB bricks):
    src (TB, 27, 64, Cin)  --static copies-->  cols (TB, 64, 27*Cin)
    cols @ w_flat (27*Cin, Cout)  --MXU-->  out (TB, 64, Cout)

Reference counterpart: MinkowskiEngine's gather-GEMM-scatter sparse
conv (SURVEY.md C2/§3.4 — the "single largest build item").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BRICK = 4
CELLS = BRICK**3


def _axis_pieces(d: int):
    """Per-axis piece split of output cells for kernel offset d.

    Returns [(dst_start, dst_stop, neighbor_e, src_start), ...]: output
    cells [dst_start, dst_stop) read their +d neighbor from brick e
    (relative brick coordinate along this axis) starting at src_start.
    """
    if d == -1:
        return [(0, 1, -1, 3), (1, 4, 0, 0)]
    if d == 0:
        return [(0, 4, 0, 0)]
    return [(0, 3, 0, 1), (3, 4, 1, 0)]


@functools.cache
def _copy_table() -> tuple[tuple[int, int, int, int, int], ...]:
    """Static copy list: (tap_k, neighbor_idx, dst_row, src_row, rows).

    Rows are flat cell indices (x*16 + y*4 + z). Runs are merged to the
    longest contiguous span: full-z pieces merge across y (and full-yz
    across nothing further — x stride is 16).
    """
    out = []
    for k in range(27):
        dx, dy, dz = k // 9 - 1, (k // 3) % 3 - 1, k % 3 - 1
        for xs, xe, ex, sx0 in _axis_pieces(dx):
            for ys, ye, ey, sy0 in _axis_pieces(dy):
                for zs, ze, ez, sz0 in _axis_pieces(dz):
                    e = (ex + 1) * 9 + (ey + 1) * 3 + (ez + 1)
                    if ze - zs == BRICK:
                        # full z: rows contiguous across the y span
                        for xi in range(xe - xs):
                            d0 = (xs + xi) * 16 + ys * 4
                            s0 = (sx0 + xi) * 16 + sy0 * 4
                            out.append((k, e, d0, s0, (ye - ys) * 4))
                    else:
                        for xi in range(xe - xs):
                            for yi in range(ye - ys):
                                d0 = (xs + xi) * 16 + (ys + yi) * 4 + zs
                                s0 = (sx0 + xi) * 16 + (sy0 + yi) * 4 + sz0
                                out.append((k, e, d0, s0, ze - zs))
    return tuple(out)


def _assemble_kernel(src_ref, w_ref, out_ref, cols_ref, *, cin: int):
    """src (TB, 27, 64, Cin), w (27, Cin, Cout) -> out (TB, 64, Cout).

    cols scratch is (27, TB, 64, Cin) — one sublane plane per tap — so
    every copy writes full rows at lane offset 0 (lane-offset writes at
    k*Cin for Cin < 128 crashed the remote Mosaic compiler; the
    lane-aligned Cin=128 variant of the same kernel compiled fine).
    The contraction is 27 accumulated (TB*64, Cin) @ (Cin, Cout) MXU
    GEMMs instead of one im2col GEMM — identical math, and the per-tap
    lhs needs no lane concatenation.
    """
    tb = src_ref.shape[0]
    for k, e, d0, s0, n in _copy_table():
        cols_ref[k, :, d0 : d0 + n, :] = src_ref[:, e, s0 : s0 + n, :]
    acc = jnp.zeros((tb * CELLS, w_ref.shape[-1]), jnp.float32)
    for k in range(27):
        acc = acc + jnp.dot(
            cols_ref[k].reshape(tb * CELLS, cin),
            w_ref[k],
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc.reshape(tb, CELLS, -1).astype(out_ref.dtype)


def _pick_tb(ch: int, cin: int, cout: int, dtype) -> int:
    """Largest power-of-two tile with src+cols+out under a VMEM budget.

    Lane padding: Cin < 128 still occupies 128 lanes per row in VMEM, so
    budget with padded widths.
    """
    bpe = jnp.dtype(dtype).itemsize
    lane = 128

    def pad(c):
        return max(lane, -(-c // lane) * lane)

    tb = 16
    while tb > 1:
        src = tb * 27 * CELLS * pad(cin) * bpe
        cols = 27 * tb * CELLS * pad(cin) * bpe
        out = tb * CELLS * pad(cout) * 4
        if src + cols + out <= 10 * 1024 * 1024 and ch % tb == 0:
            return tb
        tb //= 2
    return 1


@functools.partial(
    jax.jit, static_argnames=("interpret",)
)
def brick_assemble_conv(
    src: Array, w_flat: Array, *, interpret: bool = False
) -> Array:
    """Assembled brick conv for one chunk.

    src: (CH, 27, 64, Cin) neighbor-brick features (zeros where the
    neighbor is absent); w_flat: (27*Cin, Cout) tap-major im2col weights.
    Returns (CH, 64, Cout) output cells in the compute dtype of src.
    """
    ch, _, _, cin = src.shape
    cout = w_flat.shape[-1]
    w3 = w_flat.reshape(27, cin, cout)
    tb = _pick_tb(ch, cin, cout, src.dtype)
    grid = (ch // tb,)
    return pl.pallas_call(
        functools.partial(_assemble_kernel, cin=cin),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tb, 27, CELLS, cin),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (27, cin, cout), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tb, CELLS, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ch, CELLS, cout), src.dtype),
        scratch_shapes=[
            pltpu.VMEM((27, tb, CELLS, cin), src.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(src, w3)
