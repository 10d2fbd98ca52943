import jax
import jax.numpy as jnp
import numpy as np

from mvreg.core import transforms as tf
from mvreg.core.metrics import rotation_error_deg, translation_error
from mvreg.sync.irls import (
    rotation_sync,
    synchronize,
    translation_sync,
)


def make_graph(key, n=10, edge_frac=1.0, noise_rot=0.0, noise_tr=0.0,
               outlier_frac=0.0):
    """Synthetic pose graph with GT absolute poses and (noisy) edges."""
    kp, ke, kn1, kn2, ko = jax.random.split(key, 5)
    R_gt, t_gt = tf.random_rigid(kp, (n,), max_translation=2.0)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    edge_idx = jnp.array(pairs, dtype=jnp.int32)
    E = edge_idx.shape[0]
    i, j = edge_idx[:, 0], edge_idx[:, 1]
    R_ij, t_ij = tf.relative(R_gt[i], t_gt[i], R_gt[j], t_gt[j])
    if noise_rot:
        dR = tf.so3_exp(noise_rot * jax.random.normal(kn1, (E, 3)))
        R_ij = R_ij @ dR
    if noise_tr:
        t_ij = t_ij + noise_tr * jax.random.normal(kn2, (E, 3))
    c = jnp.ones(E)
    n_out = int(E * outlier_frac)
    out_idx = jnp.arange(E)[:1]  # placeholder when n_out == 0
    if n_out:
        # Scatter outliers across the graph (corrupting a contiguous prefix
        # would wipe out *all* edges of node 0, an unrecoverable graph).
        out_idx = jax.random.permutation(ko, E)[:n_out]
        R_bad, t_bad = tf.random_rigid(
            jax.random.fold_in(ko, 1), (n_out,), max_translation=3.0
        )
        R_ij = R_ij.at[out_idx].set(R_bad)
        t_ij = t_ij.at[out_idx].set(t_bad)
    if edge_frac < 1.0:
        keep = int(E * edge_frac)
        c = c.at[keep:].set(0.0)
    return edge_idx, R_ij, t_ij, c, R_gt, t_gt, out_idx


def gauge_align(R_est, t_est, R_gt, t_gt):
    """Apply the global transform aligning estimated pose 0 with GT pose 0."""
    Ra, ta = tf.compose(*(R_gt[0], t_gt[0]), *tf.inverse(R_est[0], t_est[0]))
    return Ra @ R_est, tf.apply_transform(Ra, ta, t_est[None])[0]


def pairwise_errors(R_est, t_est, R_gt, t_gt):
    """Gauge-invariant relative-pose errors over all pairs (ScanNet style)."""
    n = R_est.shape[0]
    pairs = jnp.array(
        [(i, j) for i in range(n) for j in range(i + 1, n)], dtype=jnp.int32
    )
    i, j = pairs[:, 0], pairs[:, 1]
    Re, te = tf.relative(R_est[i], t_est[i], R_est[j], t_est[j])
    Rg, tg = tf.relative(R_gt[i], t_gt[i], R_gt[j], t_gt[j])
    return rotation_error_deg(Re, Rg), translation_error(te, tg)


def test_rotation_sync_exact():
    edge_idx, R_ij, t_ij, c, R_gt, t_gt, _ = make_graph(jax.random.PRNGKey(0))
    R_est = rotation_sync(edge_idx, R_ij, c, 10)
    # gauge-invariant check via relative rotations
    rot_err, _ = pairwise_errors(R_est, jnp.zeros((10, 3)), R_gt, t_gt * 0)
    assert float(rot_err.max()) < 0.1


def test_translation_sync_exact():
    edge_idx, R_ij, t_ij, c, R_gt, t_gt, _ = make_graph(jax.random.PRNGKey(1))
    t_est = translation_sync(edge_idx, R_gt, t_ij, c, 10)
    _, tr_err = pairwise_errors(R_gt, t_est, R_gt, t_gt)
    assert float(tr_err.max()) < 1e-3


def test_synchronize_exact_graph():
    edge_idx, R_ij, t_ij, c, R_gt, t_gt, _ = make_graph(jax.random.PRNGKey(2), n=12)
    out = jax.jit(
        lambda *a: synchronize(*a, n_nodes=12, num_iters=4)
    )(edge_idx, R_ij, t_ij, c)
    rot_err, tr_err = pairwise_errors(out.R, out.t, R_gt, t_gt)
    assert float(rot_err.max()) < 0.1
    assert float(tr_err.max()) < 1e-3


def test_synchronize_noisy_graph():
    edge_idx, R_ij, t_ij, c, R_gt, t_gt, _ = make_graph(
        jax.random.PRNGKey(3), n=15, noise_rot=0.02, noise_tr=0.02
    )
    out = synchronize(edge_idx, R_ij, t_ij, c, n_nodes=15)
    rot_err, tr_err = pairwise_errors(out.R, out.t, R_gt, t_gt)
    # Averaging over the full graph should beat single-edge noise (~1.6 deg).
    assert float(rot_err.mean()) < 1.0
    assert float(tr_err.mean()) < 0.05


def test_synchronize_rejects_outlier_edges():
    edge_idx, R_ij, t_ij, c, R_gt, t_gt, out_idx = make_graph(
        jax.random.PRNGKey(4), n=12, noise_rot=0.01, noise_tr=0.01,
        outlier_frac=0.2,
    )
    out = synchronize(edge_idx, R_ij, t_ij, c, n_nodes=12, num_iters=6)
    rot_err, tr_err = pairwise_errors(out.R, out.t, R_gt, t_gt)
    assert float(rot_err.mean()) < 1.5
    assert float(tr_err.mean()) < 0.08
    # IRLS weights on the corrupted edges must collapse.
    E = edge_idx.shape[0]
    inlier = jnp.ones(E, bool).at[out_idx].set(False)
    assert float(out.weights[out_idx].mean()) < 0.3 * float(
        out.weights[inlier].mean()
    )


def test_synchronize_ignores_padded_edges():
    edge_idx, R_ij, t_ij, c, R_gt, t_gt, _ = make_graph(jax.random.PRNGKey(5), n=8)
    out_full = synchronize(edge_idx, R_ij, t_ij, c, n_nodes=8)
    # Append garbage edges with zero weight — result must be unchanged.
    pad_idx = jnp.tile(jnp.array([[0, 1]], dtype=jnp.int32), (5, 1))
    Rpad = jnp.broadcast_to(jnp.eye(3), (5, 3, 3)) * -1.0
    out_pad = synchronize(
        jnp.concatenate([edge_idx, pad_idx]),
        jnp.concatenate([R_ij, Rpad]),
        jnp.concatenate([t_ij, jnp.full((5, 3), 99.0)]),
        jnp.concatenate([c, jnp.zeros(5)]),
        n_nodes=8,
    )
    np.testing.assert_allclose(out_pad.R, out_full.R, atol=1e-4)
    np.testing.assert_allclose(out_pad.t, out_full.t, atol=1e-4)


def test_synchronize_differentiable():
    edge_idx, R_ij, t_ij, c, R_gt, t_gt, _ = make_graph(
        jax.random.PRNGKey(6), n=8, noise_rot=0.05, noise_tr=0.05
    )

    def loss(c):
        out = synchronize(edge_idx, R_ij, t_ij, c, n_nodes=8, num_iters=2)
        rot_err, tr_err = pairwise_errors(out.R, out.t, R_gt, t_gt)
        return jnp.mean(rot_err) + jnp.mean(tr_err)

    g = jax.grad(loss)(c)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


def test_synchronize_vmap_over_scenes():
    graphs = [make_graph(jax.random.PRNGKey(s), n=6) for s in (7, 8)]
    edge_idx = graphs[0][0]
    R_ij = jnp.stack([g[1] for g in graphs])
    t_ij = jnp.stack([g[2] for g in graphs])
    c = jnp.stack([g[3] for g in graphs])
    out = jax.vmap(
        lambda R, t, cc: synchronize(edge_idx, R, t, cc, n_nodes=6)
    )(R_ij, t_ij, c)
    for s in range(2):
        rot_err, _ = pairwise_errors(
            out.R[s], out.t[s], graphs[s][4], graphs[s][5]
        )
        assert float(rot_err.max()) < 0.1
