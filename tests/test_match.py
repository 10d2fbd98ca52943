import jax
import jax.numpy as jnp
import numpy as np

from mvreg.ops.knn import mutual_match, nn_match, pairwise_sqdist, soft_match


def test_nn_match_matches_numpy():
    ka, kb = jax.random.split(jax.random.PRNGKey(0))
    fa = jax.random.normal(ka, (300, 32))
    fb = jax.random.normal(kb, (450, 32))
    ma = jnp.ones(300, bool)
    mb = jnp.ones(450, bool)
    idx, d2 = nn_match(fa, ma, fb, mb, chunk=128)
    D = ((np.asarray(fa)[:, None] - np.asarray(fb)[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), D.argmin(1))
    np.testing.assert_allclose(np.asarray(d2), D.min(1), rtol=1e-4, atol=1e-4)


def test_nn_match_masking():
    fa = jnp.eye(4, 8)
    fb = jnp.concatenate([jnp.eye(4, 8) * 0.9, jnp.eye(4, 8)], axis=0)
    mb = jnp.arange(8) < 4  # the exact matches (rows 4..7) are masked out
    idx, d2 = nn_match(fa, jnp.ones(4, bool), fb, mb)
    assert (np.asarray(idx) < 4).all()
    ma = jnp.array([True, False, True, False])
    idx, d2 = nn_match(fa, ma, fb, mb)
    assert np.asarray(d2)[1] > 1e29  # masked rows get BIG


def test_mutual_match_known_correspondence():
    key = jax.random.PRNGKey(1)
    fb = jax.random.normal(key, (200, 16))
    perm = jax.random.permutation(jax.random.PRNGKey(2), 200)
    fa = fb[perm] + 1e-4  # fa[i] corresponds to fb[perm[i]]
    idx, d2, mutual = mutual_match(
        fa, jnp.ones(200, bool), fb, jnp.ones(200, bool)
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(perm))
    assert bool(mutual.all())


def test_soft_match_recovers_positions():
    key = jax.random.PRNGKey(3)
    fb = jax.random.normal(key, (100, 32))
    pb = jax.random.normal(jax.random.PRNGKey(4), (100, 3))
    fa = fb[:40]  # exact feature matches
    y = soft_match(fa, jnp.ones(40, bool), fb, jnp.ones(100, bool), pb,
                   temperature=1e-3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(pb[:40]), atol=1e-3)


def test_soft_match_differentiable():
    key = jax.random.PRNGKey(5)
    fa = jax.random.normal(key, (30, 8))
    fb = jax.random.normal(jax.random.PRNGKey(6), (50, 8))
    pb = jax.random.normal(jax.random.PRNGKey(7), (50, 3))

    def loss(fa):
        y = soft_match(fa, jnp.ones(30, bool), fb, jnp.ones(50, bool), pb)
        return jnp.sum(y**2)

    g = jax.grad(loss)(fa)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_match_chunking_invariance():
    fa = jax.random.normal(jax.random.PRNGKey(8), (257, 16))
    fb = jax.random.normal(jax.random.PRNGKey(9), (123, 16))
    ma, mb = jnp.ones(257, bool), jnp.ones(123, bool)
    i1, d1 = nn_match(fa, ma, fb, mb, chunk=64)
    i2, d2 = nn_match(fa, ma, fb, mb, chunk=257)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)
