"""Streaming Pallas soft-argmax matching vs the chunked XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

from mvreg.ops.knn import soft_match
from mvreg.ops.pallas.soft_match import soft_match_pallas


def _problem(seed, na=300, nb=700, d=32):
    rng = np.random.default_rng(seed)
    fa = jnp.asarray(rng.normal(size=(na, d)).astype(np.float32))
    fb = jnp.asarray(rng.normal(size=(nb, d)).astype(np.float32))
    pb = jnp.asarray(rng.uniform(-2, 2, size=(nb, 3)).astype(np.float32))
    ma = jnp.asarray(rng.random(na) > 0.1)
    mb = jnp.asarray(rng.random(nb) > 0.15)
    return fa, ma, fb, mb, pb


def test_matches_xla_reference():
    fa, ma, fb, mb, pb = _problem(0)
    want = soft_match(fa, ma, fb, mb, pb, 0.5)
    got = soft_match_pallas(fa, ma, fb, mb, pb, 0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)


def test_sharp_temperature_hits_nn():
    # tau -> 0 recovers hard NN positions of valid targets.
    rng = np.random.default_rng(3)
    fb = jnp.asarray(rng.normal(size=(256, 16)).astype(np.float32))
    pb = jnp.asarray(rng.uniform(size=(256, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 256, size=(64,)))
    fa = fb[idx] + 1e-4
    y = soft_match_pallas(
        fa, jnp.ones(64, bool), fb, jnp.ones(256, bool), pb, 1e-3,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(pb[idx]),
                               atol=1e-3)


def test_all_masked_targets_give_zero():
    fa, ma, fb, _, pb = _problem(5, na=64, nb=128)
    y = soft_match_pallas(
        fa, ma, fb, jnp.zeros(128, bool), pb, 0.1, interpret=True
    )
    assert bool(jnp.all(jnp.isfinite(y)))
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)


def test_gradients_match_reference():
    fa, ma, fb, mb, pb = _problem(7, na=96, nb=160)

    def loss_p(f):
        y = soft_match_pallas(f, ma, fb, mb, pb, 0.3, interpret=True)
        return jnp.sum(y ** 2)

    def loss_x(f):
        y = soft_match(f, ma, fb, mb, pb, 0.3)
        return jnp.sum(y ** 2)

    gp = jax.grad(loss_p)(fa)
    gx = jax.grad(loss_x)(fa)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-3, atol=1e-4)


def test_pipeline_soft_pallas_path():
    from mvreg.config.schema import PipelineConfig, override
    from mvreg.data.synthetic import make_pair
    from mvreg.pipeline import extract_descriptors, init_params, register_pair

    cfg = override(
        PipelineConfig(),
        **{
            "voxel.voxel_size": 0.1,
            "voxel.capacities": [512, 256, 128, 64],
            "model.channels": [8, 16, 32, 64],
            "model.descriptor_dim": 16,
            "match.num_corr": 128,
            "match.overlap_ransac_hypotheses": 64,
            "match.backend": "pallas",
        },
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    scene = make_pair(seed=0, points_per_fragment=1024)
    pts, msk = jnp.asarray(scene.points), jnp.asarray(scene.mask)
    d = extract_descriptors(params, cfg, pts, msk)
    di = jax.tree_util.tree_map(lambda a: a[0], d)
    dj = jax.tree_util.tree_map(lambda a: a[1], d)
    out = register_pair(params, cfg, di, dj, use_soft_match=True,
                        use_filter=False)
    assert bool(jnp.all(jnp.isfinite(out.R)))
    assert abs(float(jnp.linalg.det(out.R)) - 1) < 1e-3
