"""Dense-grid conv schedule (`conv_impl="dense"`) vs the gather-GEMM path.

The dense schedule must be *mathematically identical* to the sparse
schedule on the same voxel set (sparse conv == dense conv restricted to
occupied sites; SURVEY.md C2). These tests pin that equivalence at the
op level (down/up convs vs their PoolMap counterparts) and end-to-end
(whole FCGF forward, same params, both schedules).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvreg.models.fcgf import FCGF, build_unet_plan
from mvreg.ops import dense_grid as dg
from mvreg.ops import voxel as vx
from mvreg.ops.sparse_conv import (
    sparse_conv,
    sparse_conv_down,
    sparse_conv_up,
)

CAPS = (512, 256, 128, 64)
GRID = (16, 16, 16)


def _cloud(seed, n=256):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0.05, 1.3, size=(n, 3)).astype(np.float32)
    mask = np.ones((n,), bool)
    mask[-17:] = False
    return jnp.asarray(pts), jnp.asarray(mask)


def _grid_and_rows(seed, cin=8):
    pts, pm = _cloud(seed)
    g = vx.voxelize(pts, pm, 0.1, CAPS[0])
    rng = np.random.default_rng(seed + 1)
    feats = jnp.asarray(
        rng.normal(size=(CAPS[0], cin)).astype(np.float32)
    ) * g.mask[:, None]
    return g, feats


def test_conv3_matches_sparse_conv():
    g, feats = _grid_and_rows(0)
    offs = vx.neighbor_offsets(3)
    kmap = vx.kernel_map(g.keys, g.mask, offs)
    W = jnp.asarray(
        np.random.default_rng(2).normal(size=(27, 8, 5)).astype(np.float32)
    )
    want = sparse_conv(feats, kmap, W, g.mask)

    grid = dg.scatter_rows(feats[None], g.coords[None], g.mask[None], GRID)
    got = dg.gather_rows(dg.conv3(grid, W), g.coords[None], g.mask[None])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_conv_down2_matches_pool_map():
    g, feats = _grid_and_rows(3)
    coarse, pool = vx.coarsen(g, CAPS[1])
    W = jnp.asarray(
        np.random.default_rng(4).normal(size=(8, 8, 6)).astype(np.float32)
    )
    want = sparse_conv_down(feats, pool, W, CAPS[1])

    grid = dg.scatter_rows(feats[None], g.coords[None], g.mask[None], GRID)
    down = dg.conv_down2(grid, W)
    got = dg.gather_rows(down, coarse.coords[None], coarse.mask[None])[0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want)[: coarse.mask.shape[0]], atol=1e-4
    )


def test_conv_up2_matches_pool_map():
    g, _ = _grid_and_rows(5)
    coarse, pool = vx.coarsen(g, CAPS[1])
    rng = np.random.default_rng(6)
    cf = jnp.asarray(
        rng.normal(size=(CAPS[1], 6)).astype(np.float32)
    ) * coarse.mask[:, None]
    W = jnp.asarray(rng.normal(size=(8, 6, 4)).astype(np.float32))
    want = sparse_conv_up(cf, pool, W, g.mask)

    half = tuple(s // 2 for s in GRID)
    cgrid = dg.scatter_rows(
        cf[None], coarse.coords[None], coarse.mask[None], half
    )
    up = dg.conv_up2(cgrid, W)
    got = dg.gather_rows(up, g.coords[None], g.mask[None])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_coarsen_occupancy_matches_sparse_level():
    g, _ = _grid_and_rows(7)
    coarse, _ = vx.coarsen(g, CAPS[1])
    occ = dg.occupancy(g.coords[None], g.mask[None], GRID)
    occ2 = dg.coarsen_occupancy(occ)[0]
    want = np.zeros(tuple(s // 2 for s in GRID), np.float32)
    cc = np.asarray(coarse.coords)[np.asarray(coarse.mask)]
    want[cc[:, 0], cc[:, 1], cc[:, 2]] = 1.0
    np.testing.assert_array_equal(np.asarray(occ2), want)


@pytest.mark.parametrize("train", [False, True])
def test_fcgf_dense_matches_sparse(train):
    pts, pm = _cloud(11, n=384)
    pts, pm = pts[None], pm[None]
    plan_s = build_unet_plan(pts, pm, 0.1, CAPS)
    plan_d = build_unet_plan(pts, pm, 0.1, CAPS, lookup="dense")
    feats = jnp.ones((1, CAPS[0], 1)) * plan_s.masks[0][..., None]

    net_s = FCGF(channels=(8, 16, 32, 64), out_dim=16)
    net_d = FCGF(channels=(8, 16, 32, 64), out_dim=16, conv_impl="dense",
                 dense_grid=GRID)
    variables = net_s.init(jax.random.PRNGKey(0), plan_s, feats, train=False)

    if train:
        out_s, upd_s = net_s.apply(
            variables, plan_s, feats, train=True, mutable=["batch_stats"]
        )
        out_d, upd_d = net_d.apply(
            variables, plan_d, feats, train=True, mutable=["batch_stats"]
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            ),
            upd_s["batch_stats"], upd_d["batch_stats"],
        )
    else:
        out_s = net_s.apply(variables, plan_s, feats, train=False)
        out_d = net_d.apply(variables, plan_d, feats, train=False)
    m = np.asarray(plan_s.masks[0][0])
    np.testing.assert_allclose(
        np.asarray(out_d)[0][m], np.asarray(out_s)[0][m], atol=2e-3
    )


def test_pipeline_dense_jits():
    from mvreg.config.schema import PipelineConfig, override
    from mvreg.pipeline import extract_descriptors, init_params

    cfg = override(
        PipelineConfig(),
        **{
            "voxel.capacities": [512, 256, 128, 64],
            "voxel.voxel_size": 0.1,
            "voxel.dense_grid": [16, 16, 16],
            "model.channels": [8, 16, 32, 64],
            "model.descriptor_dim": 16,
            "model.conv_impl": "dense",
            "match.num_corr": 64,
        },
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    pts, pm = _cloud(13)
    fn = jax.jit(lambda p, m: extract_descriptors(params, cfg, p, m))
    d = fn(pts[None], pm[None])
    assert d.feats.shape == (1, 512, 16)
    assert bool(jnp.all(jnp.isfinite(d.feats)))
    norms = jnp.linalg.norm(d.feats[0], axis=-1)[np.asarray(d.mask[0])]
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-3)
