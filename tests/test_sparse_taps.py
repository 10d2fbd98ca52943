"""Sparse kernel support (27/19/7-tap) correctness.

The tap subsets are a TPU perf lever (gather rows scale with K); these
tests pin (a) the subset algebra kernel_map_sym depends on, (b) exact
parity between the gather schedule and the dense-conv oracle under
sparse support, and (c) checkpoint slicing semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvreg.ops import voxel as vx
from mvreg.ops.sparse_conv import sparse_conv, dense_conv_reference


@pytest.mark.parametrize("taps", [7, 19, 27])
def test_sparse_offsets_negation_symmetric(taps):
    off = np.asarray(vx.sparse_offsets(taps))
    assert off.shape == (taps, 3)
    assert len({tuple(o) for o in off}) == taps
    # reversed-negation symmetry with the center tap in the middle —
    # the property kernel_map_sym requires
    assert (off[::-1] == -off).all()
    assert (off[taps // 2] == 0).all()


@pytest.mark.parametrize("taps", [7, 19])
def test_sparse_tap_conv_matches_dense_oracle(taps):
    rng = np.random.default_rng(0)
    P, V, C = 512, 256, 8
    pts = rng.uniform(0, 0.9, (P, 3)).astype(np.float32)
    g = vx.voxelize(jnp.asarray(pts), jnp.ones(P, bool), 0.1, V)
    offs = vx.sparse_offsets(taps)
    kmap = vx.kernel_map(g.keys, g.mask, offs)
    feats = jnp.asarray(rng.normal(size=(V, C)), jnp.float32)
    feats = feats * g.mask[:, None]
    W = jnp.asarray(rng.normal(size=(taps, C, C)) * 0.1, jnp.float32)
    out = sparse_conv(feats, kmap, W, g.mask, impl="taps")

    # dense oracle: scatter the sparse taps into the full 3^3 kernel
    idx = jnp.asarray(vx.sparse_offset_indices(taps))
    W27 = jnp.zeros((27, C, C)).at[idx].set(W)
    Wd = W27.reshape(3, 3, 3, C, C)
    ref = dense_conv_reference(
        g.coords, g.mask, feats, Wd, 3, (16, 16, 16)
    )
    ref = ref * g.mask[:, None]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4
    )


def test_seven_tap_unet_forward_and_symjoin_parity():
    from mvreg.models.fcgf import FCGF, build_unet_plan

    rng = np.random.default_rng(1)
    caps = [256, 128, 64, 32]
    taps = (7, 19, 27, 27)
    pts = jnp.asarray(rng.uniform(0, 1.2, (2, 1024, 3)), jnp.float32)
    pm = jnp.ones((2, 1024), bool)
    plan = build_unet_plan(pts, pm, 0.08, caps, taps=taps)
    plan_sym = build_unet_plan(
        pts, pm, 0.08, caps, lookup="symjoin", taps=taps
    )
    for a, b in zip(plan.kmaps, plan_sym.kmaps):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    net = FCGF(
        channels=(4, 8, 8, 16), out_dim=8, conv_impl="taps",
        kernel_taps=taps,
    )
    feats = jnp.ones((2, caps[0], 1))
    vars_ = net.init(jax.random.PRNGKey(0), plan, feats, train=False)
    k0 = vars_["params"]["SparseConv_0"]["kernel"]
    assert k0.shape[0] == 7
    out = net.apply(vars_, plan, feats, train=False)
    assert np.isfinite(np.asarray(out)).all()
    n = np.linalg.norm(np.asarray(out[0][np.asarray(plan.masks[0][0])]), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-3)


def test_slice_taps_preserves_kept_rows():
    idx = vx.sparse_offset_indices(19)
    W = np.random.default_rng(2).normal(size=(27, 4, 4))
    sliced = W[np.asarray(idx)]
    off27 = np.asarray(vx.neighbor_offsets(3))
    off19 = np.asarray(vx.sparse_offsets(19))
    for k in range(19):
        np.testing.assert_array_equal(off27[idx[k]], off19[k])
        np.testing.assert_array_equal(sliced[k], W[idx[k]])
