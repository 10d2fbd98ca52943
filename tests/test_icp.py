"""ICP pose refinement (ops/icp.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvreg.core.metrics import rotation_error_deg, translation_error
from mvreg.core.transforms import apply_transform, random_rigid
from mvreg.ops.icp import icp_refine


def _perturb(R, t, deg, dt):
    ang = np.radians(deg)
    Rz = jnp.asarray(
        np.array(
            [
                [np.cos(ang), -np.sin(ang), 0],
                [np.sin(ang), np.cos(ang), 0],
                [0, 0, 1.0],
            ],
            np.float32,
        )
    )
    return Rz @ R, t + jnp.asarray(np.array([dt, -dt, dt / 2], np.float32))


def test_icp_recovers_from_coarse_init():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, size=(1024, 3)).astype(np.float32))
    R, t = random_rigid(jax.random.PRNGKey(0), ())
    y = apply_transform(R, t, x)
    # 6 deg + 8 cm off
    R0, t0 = _perturb(R, t, 6.0, 0.08)
    xm = jnp.ones(1024, bool)
    ym = jnp.ones(1024, bool)
    R1, t1 = jax.jit(
        lambda *a: icp_refine(*a, num_iters=4, scale=0.05)
    )(R0, t0, x, xm, y, ym)
    assert float(rotation_error_deg(R0, R)) > 5.0
    assert float(rotation_error_deg(R1, R)) < 0.5
    assert float(translation_error(t1, t)) < 0.01


def test_icp_partial_overlap_and_noise():
    rng = np.random.default_rng(1)
    world = rng.uniform(-1.5, 1.5, size=(4096, 3)).astype(np.float32)
    x_np = world[:2048] + 0.005 * rng.normal(size=(2048, 3))
    y_src = world[1024:3072]  # 50% overlap with x
    R, t = random_rigid(jax.random.PRNGKey(1), ())
    y = apply_transform(R, t, jnp.asarray(
        (y_src + 0.005 * rng.normal(size=y_src.shape)).astype(np.float32)
    ))
    R0, t0 = _perturb(R, t, 5.0, 0.05)
    R1, t1 = icp_refine(
        R0, t0, jnp.asarray(x_np.astype(np.float32)),
        jnp.ones(2048, bool), y, jnp.ones(2048, bool),
        num_iters=4,
    )
    assert float(rotation_error_deg(R1, R)) < float(
        rotation_error_deg(R0, R)
    )
    assert float(rotation_error_deg(R1, R)) < 1.5


def test_icp_junk_pair_keeps_pose():
    """Disjoint clouds: the inlier gate must keep the original pose."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, size=(512, 3)).astype(np.float32))
    y = jnp.asarray(
        (rng.uniform(0, 1, size=(512, 3)) + 10.0).astype(np.float32)
    )
    R0, t0 = random_rigid(jax.random.PRNGKey(3), ())
    R1, t1 = icp_refine(
        R0, t0, x, jnp.ones(512, bool), y, jnp.ones(512, bool),
        num_iters=3,
    )
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), atol=1e-6)


def test_icp_masked_and_vmapped():
    rng = np.random.default_rng(3)
    B, K, V = 3, 256, 512
    x = jnp.asarray(rng.uniform(-1, 1, size=(B, K, 3)).astype(np.float32))
    R, t = random_rigid(jax.random.PRNGKey(4), (B,))
    y_full = apply_transform(R, t, x)
    y = jnp.concatenate(
        [y_full, jnp.zeros((B, V - K, 3), jnp.float32)], axis=1
    )
    ym = jnp.arange(V)[None, :] < K
    ym = jnp.broadcast_to(ym, (B, V))
    xm = jnp.ones((B, K), bool)
    R0, t0 = R, t + 0.05
    Rr, tr = jax.vmap(
        lambda *a: icp_refine(*a, num_iters=3)
    )(R0, t0, x, xm, y, ym)
    assert Rr.shape == (B, 3, 3)
    err = np.asarray(rotation_error_deg(Rr, R))
    assert err.max() < 0.5
    assert float(np.max(np.asarray(translation_error(tr, t)))) < 0.01


@pytest.mark.slow  # 80 s; ICP-on path is exercised by the scene
# integration test and every eval harness run
def test_pipeline_icp_toggle_runs():
    """register_pair with match.icp_iters>0 stays finite end-to-end."""
    from mvreg.config.schema import PipelineConfig, override
    from mvreg.data.synthetic import make_pair
    from mvreg.pipeline import extract_descriptors, init_params, register_pair

    cfg = override(
        PipelineConfig(),
        **{
            "voxel.capacities": [1024, 512, 256, 128],
            "voxel.voxel_size": 0.06,
            "model.channels": [8, 16, 16, 32],
            "model.descriptor_dim": 16,
            "match.num_corr": 256,
            "match.icp_iters": 2,
            "filter.channels": 32,
            "filter.num_clusters": 16,
            "filter.blocks_before": 1,
            "filter.blocks_cluster": 1,
            "filter.blocks_after": 1,
        },
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    scene = make_pair(seed=0, points_per_fragment=1024)
    desc = extract_descriptors(
        params, cfg, jnp.asarray(scene.points), jnp.asarray(scene.mask)
    )
    di = jax.tree_util.tree_map(lambda a: a[0], desc)
    dj = jax.tree_util.tree_map(lambda a: a[1], desc)
    out = register_pair(params, cfg, di, dj)
    assert np.isfinite(np.asarray(out.R)).all()
    assert abs(float(jnp.linalg.det(out.R)) - 1.0) < 1e-3


def test_icp_plane_stage_junk_pair_reverts_to_p2p_pose():
    """Plane-stage contract (ADVICE r4): when the FINAL plane-association
    count is below min_inliers, the result is exactly the p2p-validated
    pose — the per-step guard alone only freezes the current iterate."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, size=(256, 3)).astype(np.float32))
    R, t = random_rigid(jax.random.PRNGKey(9), ())
    y = apply_transform(R, t, x)
    xm = jnp.ones(256, bool)
    ym = jnp.ones(256, bool)
    R0, t0 = _perturb(R, t, 3.0, 0.04)
    normals = jnp.tile(
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (256, 1)
    )
    # nweight below the 0.1 planarity gate everywhere: every plane step
    # counts zero inliers, so the final gate must return the p2p result
    # bit-for-bit (and the p2p stage itself must have converged).
    nw = jnp.full((256,), 0.05, jnp.float32)
    R_p2p, t_p2p = icp_refine(
        R0, t0, x, xm, y, ym, num_iters=3, plane_iters=0
    )
    R_pl, t_pl = icp_refine(
        R0, t0, x, xm, y, ym, num_iters=3,
        y_normals=normals, y_nweight=nw, plane_iters=3,
    )
    np.testing.assert_array_equal(np.asarray(R_pl), np.asarray(R_p2p))
    np.testing.assert_array_equal(np.asarray(t_pl), np.asarray(t_p2p))
    assert float(rotation_error_deg(R_p2p, R)) < 0.5
