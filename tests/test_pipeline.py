"""End-to-end pipeline integration tests (SURVEY.md §4.2).

Descriptor *quality* needs training; to test every downstream stage
end-to-end we use oracle descriptors — a fixed random projection of the
WORLD-frame coordinates (computable only with GT poses, so they match
across fragments by construction). With those, match → filter(untrained)
→ Procrustes → confidence → sync must recover the GT poses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvreg.config.schema import PipelineConfig, override
from mvreg.core import transforms as tf
from mvreg.core.metrics import rotation_error_deg, translation_error
from mvreg.data.synthetic import make_pair, make_scene
from mvreg.pipeline import (
    Descriptors,
    all_pairs,
    extract_descriptors,
    init_params,
    register_pair,
    register_scene,
)



def tiny_cfg():
    cfg = PipelineConfig()
    return override(
        cfg,
        **{
            "voxel.capacities": [2048, 1024, 512, 256],
            "voxel.voxel_size": 0.05,
            "model.channels": [8, 16, 16, 32],
            "model.descriptor_dim": 16,
            "match.num_corr": 512,
            "filter.channels": 32,
            "filter.num_clusters": 32,
            "filter.blocks_before": 1,
            "filter.blocks_cluster": 1,
            "filter.blocks_after": 1,
            # Smoke-scale robust stack: hypothesis counts are a pure
            # work multiplier (512 is the eval default), not a code
            # path — 64 exercises the identical program ~6x faster on
            # the CPU backend these tests run on.
            "match.overlap_ransac_hypotheses": 64,
            "match.ransac_hypotheses": 64,
        },
    )


def oracle_descriptors(scene, cfg, seed=0):
    """Unit descriptors from a sin/cos positional encoding of WORLD coords:
    quasi-injective (only nearby world points get similar descriptors), so
    mutual matching yields >95% inliers on the overlap region."""
    from mvreg.models.fcgf import build_unet_plan

    pts = jnp.asarray(scene.points)
    mask = jnp.asarray(scene.mask)
    plan = build_unet_plan(
        pts, mask, cfg.voxel.voxel_size, cfg.voxel.capacities
    )
    # sub-voxel centroids, same as the product path (grid-quantized
    # centers make ICP lattice-lock two rotated grids against each
    # other — a fixture artifact, not a pipeline behavior)
    from mvreg.pipeline import voxel_positions

    centers = voxel_positions(cfg, plan, pts)
    R = jnp.asarray(scene.R_gt)
    t = jnp.asarray(scene.t_gt)
    world = jnp.einsum("bij,bvj->bvi", R, centers) + t[:, None, :]
    freqs = jnp.array([2.0, 5.0, 11.0])
    enc = jnp.concatenate(
        [jnp.sin(world[..., None] * freqs), jnp.cos(world[..., None] * freqs)],
        axis=-1,
    ).reshape(world.shape[0], world.shape[1], -1)
    feats = enc * jax.lax.rsqrt(
        jnp.sum(enc**2, axis=-1, keepdims=True) + 1e-12
    )
    vmask = plan.masks[0]
    return Descriptors(
        feats=feats * vmask[..., None],
        centers=centers * vmask[..., None],
        mask=vmask,
    )


@pytest.fixture(scope="module")
def cfg():
    return tiny_cfg()


@pytest.fixture(scope="module")
def params(cfg):
    return init_params(jax.random.PRNGKey(0), cfg)


def test_register_pair_oracle_descriptors(cfg, params):
    scene = make_pair(seed=1, points_per_fragment=2048, noise=0.002)
    desc = oracle_descriptors(scene, cfg)
    di = jax.tree_util.tree_map(lambda a: a[0], desc)
    dj = jax.tree_util.tree_map(lambda a: a[1], desc)
    out = register_pair(params, cfg, di, dj, use_filter=False)
    R_gt, t_gt = tf.relative(
        jnp.asarray(scene.R_gt[0]), jnp.asarray(scene.t_gt[0]),
        jnp.asarray(scene.R_gt[1]), jnp.asarray(scene.t_gt[1]),
    )
    rot_err = float(rotation_error_deg(out.R, R_gt))
    tr_err = float(translation_error(out.t, t_gt))
    # 2.0-deg bound: with match.icp_iters on by default, the polish
    # associates against these oracle fixtures' coarse voxel clouds and
    # can nudge an already-tight pose by ~0.5 deg; the precision limits
    # of ICP itself are covered by tests/test_icp.py on clean clouds.
    assert rot_err < 2.0, rot_err
    assert tr_err < 0.05, tr_err
    assert np.isfinite(float(out.confidence))


def test_register_pair_jits(cfg, params):
    scene = make_pair(seed=2, points_per_fragment=1024)
    desc = oracle_descriptors(scene, cfg)
    di = jax.tree_util.tree_map(lambda a: a[0], desc)
    dj = jax.tree_util.tree_map(lambda a: a[1], desc)
    f = jax.jit(
        lambda p, a, b: register_pair(p, cfg, a, b, use_filter=False)
    )
    out = f(params, di, dj)
    assert out.R.shape == (3, 3)
    assert np.isfinite(np.asarray(out.R)).all()


def test_register_scene_oracle(cfg, params):
    scene = make_scene(seed=3, num_fragments=5, points_per_fragment=2048,
                       noise=0.002)
    desc = oracle_descriptors(scene, cfg)

    # register_scene recomputes descriptors via FCGF; patch in the oracle
    # path by registering pairs manually + sync (mirrors register_scene).
    from mvreg.sync.irls import synchronize

    N = 5
    edge_idx = all_pairs(N)

    def one_edge(e):
        di = jax.tree_util.tree_map(lambda a: a[e[0]], desc)
        dj = jax.tree_util.tree_map(lambda a: a[e[1]], desc)
        return register_pair(params, cfg, di, dj, use_filter=False)

    pairs = jax.lax.map(one_edge, edge_idx)
    # Untrained confidence net -> seed sync with the mutual-match inlier
    # fraction (non-overlapping pairs get garbage edges; Cauchy IRLS must
    # reject them from there).
    c = pairs.corr_mask.sum(-1) / cfg.match.num_corr
    sync = synchronize(
        edge_idx, pairs.R, pairs.t, c, n_nodes=N, num_iters=8, cauchy_b=0.15
    )
    # gauge-invariant relative-pose errors vs GT
    i, j = edge_idx[:, 0], edge_idx[:, 1]
    Re, te = tf.relative(sync.R[i], sync.t[i], sync.R[j], sync.t[j])
    Rg, tg = tf.relative(
        jnp.asarray(scene.R_gt)[i], jnp.asarray(scene.t_gt)[i],
        jnp.asarray(scene.R_gt)[j], jnp.asarray(scene.t_gt)[j],
    )
    rot_err = np.asarray(rotation_error_deg(Re, Rg))
    tr_err = np.asarray(translation_error(te, tg))
    assert np.median(rot_err) < 1.5, rot_err
    assert np.median(tr_err) < 0.08, tr_err


def test_register_scene_full_path_runs(cfg, params):
    """The real (learned-descriptor) scene path: shapes + finiteness only
    (untrained weights can't give accuracy)."""
    scene = make_scene(seed=4, num_fragments=3, points_per_fragment=512)
    out = register_scene(
        params, cfg, jnp.asarray(scene.points), jnp.asarray(scene.mask)
    )
    E = 3
    assert out.pairs.R.shape == (E, 3, 3)
    assert out.sync.R.shape == (3, 3, 3)
    assert np.isfinite(np.asarray(out.sync.R)).all()
    assert np.isfinite(np.asarray(out.sync.t)).all()
    dets = np.linalg.det(np.asarray(out.sync.R))
    np.testing.assert_allclose(dets, 1.0, atol=1e-3)


def test_extract_descriptors_shapes(cfg, params):
    scene = make_pair(seed=5, points_per_fragment=512)
    desc = extract_descriptors(
        params, cfg, jnp.asarray(scene.points), jnp.asarray(scene.mask)
    )
    B, V = 2, cfg.voxel.capacities[0]
    assert desc.feats.shape == (B, V, cfg.model.descriptor_dim)
    assert desc.centers.shape == (B, V, 3)
    norms = np.linalg.norm(np.asarray(desc.feats), axis=-1)
    m = np.asarray(desc.mask)
    np.testing.assert_allclose(norms[m], 1.0, atol=1e-3)


@pytest.mark.slow  # 65 s quality A/B (not a correctness gate)
def test_subvoxel_centers_beat_grid_centers():
    """voxel.subvoxel_centers: per-voxel point centroids are rigid-
    equivariant, so a noiseless transformed pair matched by GT voxel
    identity solves Kabsch to ~0 error; grid centers carry ~voxel/sqrt(12)
    quantization noise."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvreg.config.schema import PipelineConfig, override
    from mvreg.core.metrics import rotation_error_deg
    from mvreg.core.procrustes import kabsch
    from mvreg.core.transforms import apply_transform, random_rigid
    from mvreg.models.fcgf import build_unet_plan
    from mvreg.pipeline import voxel_positions

    base = {
        "voxel.capacities": [1024, 512, 256, 128],
        "voxel.voxel_size": 0.08,
    }
    cfg_sub = override(PipelineConfig(), **base)
    cfg_grid = override(
        PipelineConfig(), **{**base, "voxel.subvoxel_centers": False}
    )
    rng = np.random.default_rng(0)
    pts_a = jnp.asarray(rng.uniform(0, 1.5, size=(1, 2048, 3)).astype(np.float32))
    mask = jnp.ones((1, 2048), bool)
    R, t = random_rigid(jax.random.PRNGKey(1), ())
    pts_b = apply_transform(R, t, pts_a)

    def positions(cfg, pts):
        plan = build_unet_plan(
            pts, mask, cfg.voxel.voxel_size, cfg.voxel.capacities,
            cfg.voxel.kernel_size, "sortjoin",
        )
        return voxel_positions(cfg, plan, pts), plan.masks[0]

    errs = {}
    for name, cfg in (("sub", cfg_sub), ("grid", cfg_grid)):
        ca, ma = positions(cfg, pts_a)
        cb, mb = positions(cfg, pts_b)
        # same point set, same voxelization order? voxel keys sort by
        # packed coords of DIFFERENT frames — so match voxels by their
        # source points instead: use each voxel centroid of A mapped by
        # the GT transform against the B voxelization of those points.
        # Simplest exact pairing: voxelize B's plan but take positions
        # of the SAME points — apply GT to A-centroids and re-solve.
        w = ma[0].astype(jnp.float32)
        y_gt = apply_transform(R, t, ca[0])
        # add the quantization noise of the B-frame voxelization by
        # quantizing y through B's grid params
        Re, te = kabsch(ca[0], y_gt, w)
        errs[name] = float(rotation_error_deg(Re, R))
    # both exact in this construction; now the real check: grid centers
    # of the SAME voxel set are quantized, so solving A-centers vs
    # GT-transformed A-SUBVOXEL positions shows the gap.
    ca_sub, ma2 = positions(cfg_sub, pts_a)
    ca_grid, _ = positions(cfg_grid, pts_a)
    w = ma2[0].astype(jnp.float32)
    y = apply_transform(R, t, ca_sub[0])
    R_sub, _ = kabsch(ca_sub[0], y, w)
    R_grid, _ = kabsch(ca_grid[0], y, w)
    e_sub = float(rotation_error_deg(R_sub, R))
    e_grid = float(rotation_error_deg(R_grid, R))
    assert e_sub < 0.01, e_sub
    assert e_grid > 5 * e_sub, (e_sub, e_grid)
    # centroids stay inside their voxel cell
    import mvreg.ops.voxel as vx
    plan = build_unet_plan(
        pts_a, mask, 0.08, (1024, 512, 256, 128), 3, "sortjoin",
    )
    g = jax.tree_util.tree_map(lambda a: a[0], plan.grids[0])
    lo = g.origin + g.coords.astype(jnp.float32) * g.voxel_size
    hi = lo + g.voxel_size
    c = ca_sub[0]
    m = ma2[0]
    inside = jnp.all((c >= lo - 1e-5) & (c <= hi + 1e-5), axis=-1) | ~m
    assert bool(jnp.all(inside))


def test_plane_only_scene_polish_not_gated_on_p2p_rounds(
    cfg, params, monkeypatch
):
    """scene_icp_rounds=0 + scene_icp_plane_rounds>0 is a legal config:
    the plane polish must still run (ADVICE r4 — it was silently gated
    behind the point-to-point rounds while extract_descriptors still
    paid the normals cost)."""
    import mvreg.sync.refine as refine_mod

    calls = {}
    real = refine_mod.scene_icp_refine

    def spy(*a, **kw):
        calls["plane_rounds"] = kw.get("plane_rounds")
        calls["rounds"] = kw.get("rounds")
        return real(*a, **kw)

    monkeypatch.setattr(refine_mod, "scene_icp_refine", spy)
    cfg_p = override(
        cfg,
        **{
            "sync.scene_icp_rounds": 0,
            "sync.scene_icp_plane_rounds": 1,
            "match.icp_plane_iters": 1,
        },
    )
    scene = make_scene(seed=6, num_fragments=3, points_per_fragment=512)
    out = register_scene(
        params, cfg_p, jnp.asarray(scene.points), jnp.asarray(scene.mask)
    )
    assert calls.get("plane_rounds") == 1
    assert calls.get("rounds") == 0
    assert np.isfinite(np.asarray(out.sync.R)).all()
