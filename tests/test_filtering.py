import jax
import jax.numpy as jnp
import numpy as np

from mvreg.models.filtering import (
    ConfidenceNet,
    FilteringNet,
    edge_statistics,
)

SMALL = dict(channels=16, num_clusters=8, blocks_before=1,
             blocks_cluster=1, blocks_after=1)


def _data(key, B=2, N=64, D=6):
    corr = jax.random.normal(key, (B, N, D))
    mask = jnp.ones((B, N)).at[:, N // 2:].set(0.0)
    return corr, mask


def test_filtering_shapes_and_mask():
    corr, mask = _data(jax.random.PRNGKey(0))
    model = FilteringNet(**SMALL)
    variables = model.init(jax.random.PRNGKey(1), corr, mask, train=False)
    logits, w = model.apply(variables, corr, mask, train=False)
    assert logits.shape == w.shape == (2, 64)
    m = np.asarray(mask) > 0
    w_np = np.asarray(w)
    assert (w_np[~m] == 0).all()
    assert (w_np >= 0).all() and (w_np <= 1).all()


def test_filtering_padding_invariance():
    corr, mask = _data(jax.random.PRNGKey(2), B=1)
    model = FilteringNet(**SMALL)
    variables = model.init(jax.random.PRNGKey(3), corr, mask, train=False)
    _, w1 = model.apply(variables, corr, mask, train=False)
    poisoned = jnp.where(mask[..., None] > 0, corr, 77.0)
    _, w2 = model.apply(variables, poisoned, mask, train=False)
    m = np.asarray(mask[0]) > 0
    np.testing.assert_allclose(
        np.asarray(w1[0])[m], np.asarray(w2[0])[m], atol=1e-5
    )


def test_filtering_permutation_equivariance():
    """Permuting valid correspondences must permute the weights."""
    corr, _ = _data(jax.random.PRNGKey(4), B=1, N=32)
    mask = jnp.ones((1, 32))
    model = FilteringNet(**SMALL)
    variables = model.init(jax.random.PRNGKey(5), corr, mask, train=False)
    _, w1 = model.apply(variables, corr, mask, train=False)
    perm = jax.random.permutation(jax.random.PRNGKey(6), 32)
    _, w2 = model.apply(variables, corr[:, perm], mask, train=False)
    np.testing.assert_allclose(
        np.asarray(w1[0, perm]), np.asarray(w2[0]), atol=1e-4
    )


def test_filtering_trains():
    """Overfit a linearly-separable inlier pattern in a few steps."""
    import optax

    key = jax.random.PRNGKey(7)
    N = 128
    corr = jax.random.normal(key, (4, N, 6))
    labels = (corr[..., 0] > 0).astype(jnp.float32)  # "inlier" iff x0 > 0
    mask = jnp.ones((4, N))
    model = FilteringNet(**SMALL)
    variables = model.init(jax.random.PRNGKey(8), corr, mask, train=True)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            (logits, _), updates = model.apply(
                {"params": p, "batch_stats": stats}, corr, mask,
                train=True, mutable=["batch_stats"],
            )
            loss = optax.sigmoid_binary_cross_entropy(logits, labels).mean()
            return loss, updates["batch_stats"]

        (loss, new_stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, upd), new_stats, opt_state, loss

    losses = []
    for _ in range(60):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert losses[-1] < 0.25 * losses[0], losses[::10]


def test_edge_statistics_and_confidence():
    key = jax.random.PRNGKey(9)
    w = jax.random.uniform(key, (5, 40))
    r = jax.random.uniform(jax.random.PRNGKey(10), (5, 40))
    mask = jnp.ones((5, 40)).at[:, 30:].set(0.0)
    stats = edge_statistics(w, mask, r)
    assert stats.shape == (5, 8)
    assert np.isfinite(np.asarray(stats)).all()
    # pad rows must not influence stats
    stats2 = edge_statistics(
        jnp.where(mask > 0, w, 99.0), mask, jnp.where(mask > 0, r, -50.0)
    )
    np.testing.assert_allclose(np.asarray(stats), np.asarray(stats2), atol=1e-5)

    model = ConfidenceNet(hidden=16)
    variables = model.init(jax.random.PRNGKey(11), stats)
    c = model.apply(variables, stats)
    assert c.shape == (5,)
    assert ((np.asarray(c) >= 0) & (np.asarray(c) <= 1)).all()
