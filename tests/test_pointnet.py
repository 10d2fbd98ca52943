import jax
import jax.numpy as jnp
import numpy as np

from mvreg.config.schema import PipelineConfig, override
from mvreg.models.pointnet import PointNetDescriptor, knn_patches
from mvreg.pipeline import extract_descriptors, init_params, register_pair


def pn_cfg():
    return override(
        PipelineConfig(),
        **{
            "model.family": "pointnet",
            "model.channels": [16, 32, 32, 32],
            "model.descriptor_dim": 16,
            "voxel.capacities": [512, 256, 128, 64],
            "voxel.voxel_size": 0.08,
            "match.num_corr": 128,
            "filter.channels": 16,
            "filter.num_clusters": 8,
            "filter.blocks_before": 1,
            "filter.blocks_cluster": 1,
            "filter.blocks_after": 1,
        },
    )


def test_knn_patches():
    centers = jnp.array([[0.0, 0, 0], [0.1, 0, 0], [5.0, 0, 0], [0, 0.1, 0]])
    mask = jnp.ones(4)
    idx, valid = knn_patches(centers, mask, k=3, radius=0.5)
    # point 0's neighbors within 0.5: itself, 1, 3 (not the far point 2)
    assert set(np.asarray(idx[0]).tolist()) == {0, 1, 3}
    assert bool(valid[0].all())
    # far point: only itself within radius
    assert int(valid[2].sum()) == 1


def test_pointnet_forward_properties():
    model = PointNetDescriptor(channels=(16, 32), out_dim=8,
                               k_neighbors=8, patch_radius=0.4)
    key = jax.random.PRNGKey(0)
    centers = jax.random.uniform(key, (2, 128, 3))
    mask = jnp.ones((2, 128)).at[:, 100:].set(0.0)
    v = model.init(jax.random.PRNGKey(1), centers, mask, train=False)
    out = model.apply(v, centers, mask, train=False)
    assert out.shape == (2, 128, 8)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    m = np.asarray(mask) > 0
    np.testing.assert_allclose(norms[m], 1.0, atol=1e-4)
    assert not norms[~m].any()
    # translation invariance: shifting the whole cloud changes nothing
    out2 = model.apply(v, centers + 5.0, mask, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)


def test_pointnet_pipeline_end_to_end():
    from mvreg.data.synthetic import make_pair

    cfg = pn_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    scene = make_pair(seed=1, points_per_fragment=512)
    desc = extract_descriptors(
        params, cfg, jnp.asarray(scene.points), jnp.asarray(scene.mask)
    )
    assert desc.feats.shape[-1] == 16
    di = jax.tree_util.tree_map(lambda a: a[0], desc)
    dj = jax.tree_util.tree_map(lambda a: a[1], desc)
    out = register_pair(params, cfg, di, dj, use_filter=False)
    assert np.isfinite(np.asarray(out.R)).all()


def test_pointnet_trains():
    from mvreg.data.batching import synthetic_pair_batch
    from mvreg.train.loop import make_train_step
    from mvreg.train.state import create_train_state

    cfg = pn_cfg()
    batch = synthetic_pair_batch(0, 2, points_per_fragment=384)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, stage="descriptor")
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss_contrastive"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
