"""Brick (block-sparse) conv plan: parity with the gather-GEMM conv."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvreg.ops import voxel as vx
from mvreg.ops.brick import BrickPlan, build_brick_plan, sparse_conv_brick
from mvreg.ops.sparse_conv import sparse_conv


def _grid(seed, n=800, cap=512, vs=0.05):
    key = jax.random.PRNGKey(seed)
    pts = jax.random.uniform(key, (n, 3), minval=0.0, maxval=1.0)
    pm = jax.random.uniform(jax.random.PRNGKey(seed + 7), (n,)) < 0.9
    return vx.voxelize(pts, pm, vs, cap)


def test_brick_conv_matches_gather_gemm():
    for seed in (0, 1):
        g = _grid(seed)
        V = g.keys.shape[0]
        Cin, Cout = 24, 40
        rng = np.random.default_rng(seed)
        feats = jnp.asarray(
            rng.normal(size=(V, Cin)) * g.mask[:, None], jnp.float32
        )
        W = jnp.asarray(rng.normal(size=(27, Cin, Cout)) * 0.1, jnp.float32)
        kmap = vx.kernel_map(g.keys, g.mask, vx.neighbor_offsets(3))
        ref = sparse_conv(feats, kmap, W, g.mask, impl="fused")

        plan = build_brick_plan(g.keys, g.coords, g.mask, brick_cap=256)
        # xla assembly here (interpret-mode Pallas is ~30x slower on
        # CPU; the Pallas assembly has its own dedicated parity test)
        for assembly in ("xla", "xla2"):
            out = sparse_conv_brick(
                feats, plan, W, g.mask, assembly=assembly
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
            )


def test_brick_conv_vmap_and_jit():
    g0, g1 = _grid(2), _grid(3)
    V = g0.keys.shape[0]
    Cin, Cout = 8, 16
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, V, Cin)), jnp.float32)
    feats = feats * jnp.stack([g0.mask, g1.mask])[..., None]
    W = jnp.asarray(rng.normal(size=(27, Cin, Cout)) * 0.1, jnp.float32)

    plans = jax.vmap(
        lambda k, c, m: build_brick_plan(k, c, m, brick_cap=256)
    )(
        jnp.stack([g0.keys, g1.keys]),
        jnp.stack([g0.coords, g1.coords]),
        jnp.stack([g0.mask, g1.mask]),
    )
    f = jax.jit(
        jax.vmap(
            lambda x, p, m: sparse_conv_brick(x, p, W, m, assembly="xla")
        )
    )
    out = f(feats, plans, jnp.stack([g0.mask, g1.mask]))
    for b, g in enumerate((g0, g1)):
        kmap = vx.kernel_map(g.keys, g.mask, vx.neighbor_offsets(3))
        ref = sparse_conv(feats[b], kmap, W, g.mask, impl="fused")
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def test_brick_capacity_overflow_drops_not_corrupts():
    """Bricks beyond capacity drop their voxels (zeros out), never alias."""
    g = _grid(4)
    V = g.keys.shape[0]
    Cin = 8
    feats = jnp.ones((V, Cin)) * g.mask[:, None]
    W = jnp.tile(jnp.eye(Cin)[None], (27, 1, 1)) / 27.0
    plan = build_brick_plan(g.keys, g.coords, g.mask, brick_cap=8)
    out = sparse_conv_brick(feats, plan, W, g.mask, assembly="xla")
    assert np.isfinite(np.asarray(out)).all()
    # kept voxels produce bounded outputs; dropped ones zero
    kept = np.asarray(plan.voxel_slot) < 8 * 64
    assert np.asarray(out)[~kept & np.asarray(g.mask)].sum() == 0


def test_brick_pallas_assembly_matches_xla():
    """The VMEM piece-table kernel (interpret mode on CPU) == the XLA
    assembly on one small grid — the dedicated (and bounded-cost)
    parity check for ops/pallas/brick_assemble.py."""
    g = _grid(5, n=400, cap=256)
    V = g.keys.shape[0]
    Cin, Cout = 8, 8
    rng = np.random.default_rng(5)
    feats = jnp.asarray(
        rng.normal(size=(V, Cin)) * g.mask[:, None], jnp.float32
    )
    W = jnp.asarray(rng.normal(size=(27, Cin, Cout)) * 0.1, jnp.float32)
    plan = build_brick_plan(g.keys, g.coords, g.mask, brick_cap=128)
    ref = sparse_conv_brick(feats, plan, W, g.mask, assembly="xla")
    out = sparse_conv_brick(feats, plan, W, g.mask, assembly="pallas")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow  # op-level parity stays in the default tier
def test_fcgf_brick_matches_fused_end_to_end():
    """Full UNet forward: conv_impl=brick == conv_impl=fused row-for-row
    (same checkpoint format, alternative execution schedule)."""
    from mvreg.models.fcgf import FCGF, build_unet_plan

    pts = jax.random.uniform(jax.random.PRNGKey(11), (2, 1500, 3))
    pm = jnp.ones((2, 1500), bool)
    caps = (512, 256, 128, 64)
    plan_f = build_unet_plan(pts, pm, 0.05, caps, 3, "sortjoin")
    plan_b = build_unet_plan(pts, pm, 0.05, caps, 3, "brick")
    feats = jnp.ones((2, caps[0], 1)) * plan_f.masks[0][..., None]

    net_f = FCGF(channels=(8, 16, 16, 32), out_dim=16, conv_impl="fused")
    net_b = FCGF(channels=(8, 16, 16, 32), out_dim=16, conv_impl="brick")
    vs = net_f.init(jax.random.PRNGKey(0), plan_f, feats, train=False)
    out_f = net_f.apply(vs, plan_f, feats, train=False)
    out_b = net_b.apply(vs, plan_b, feats, train=False)
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_f), rtol=3e-4, atol=3e-4
    )


def test_brick_rejects_sparse_kernel_taps():
    """brick schedules hard-code the full 3^3 window assembly; a sparse
    kernel_taps config must be rejected up front with a clear error, not
    die in an opaque reshape at trace time (ADVICE r4)."""
    import pytest

    from mvreg.config.schema import PipelineConfig, override
    from mvreg.models.fcgf import plan_lookup

    cfg = override(
        PipelineConfig(),
        **{"model.conv_impl": "brick", "model.kernel_taps": [19] * 4},
    )
    with pytest.raises(ValueError, match="kernel_taps"):
        plan_lookup(cfg.model, cfg.voxel)
    cfg27 = override(PipelineConfig(), **{"model.conv_impl": "brick"})
    assert plan_lookup(cfg27.model, cfg27.voxel) == "brick"
