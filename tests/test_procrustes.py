import jax
import jax.numpy as jnp
import numpy as np

from mvreg.core import transforms as tf
from mvreg.core.metrics import rotation_error_deg, translation_error
from mvreg.core.procrustes import kabsch, so3_project, wahba_quaternion


def _make_problem(key, batch=8, n=100, noise=0.0, outlier_frac=0.0):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (batch, n, 3))
    R, t = tf.random_rigid(k2, (batch,))
    y = tf.apply_transform(R, t, x)
    if noise:
        y = y + noise * jax.random.normal(k3, y.shape)
    w = jnp.ones((batch, n))
    if outlier_frac:
        n_out = int(n * outlier_frac)
        y = y.at[:, :n_out].set(jax.random.normal(k4, (batch, n_out, 3)) * 5)
        w = w.at[:, :n_out].set(0.0)  # oracle weights down-weight outliers
    return x, y, w, R, t


def test_kabsch_exact_recovery():
    x, y, w, R, t = _make_problem(jax.random.PRNGKey(0))
    R_est, t_est = kabsch(x, y, w)
    assert rotation_error_deg(R_est, R).max() < 0.05  # fp32 arccos floor
    assert translation_error(t_est, t).max() < 1e-5


def test_kabsch_weighted_ignores_outliers():
    x, y, w, R, t = _make_problem(jax.random.PRNGKey(1), outlier_frac=0.3)
    R_est, t_est = kabsch(x, y, w)
    assert rotation_error_deg(R_est, R).max() < 0.05  # fp32 arccos floor
    assert translation_error(t_est, t).max() < 1e-5


def test_kabsch_noise_tolerance():
    x, y, w, R, t = _make_problem(jax.random.PRNGKey(2), n=500, noise=0.01)
    R_est, t_est = kabsch(x, y, w)
    assert rotation_error_deg(R_est, R).max() < 0.5
    assert translation_error(t_est, t).max() < 0.01


def test_kabsch_always_proper_rotation():
    # Near-planar clouds with heavy noise — SVD-based Kabsch needs a det
    # branch here; the quaternion solve must return det +1 unconditionally.
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (16, 40, 3)) * jnp.array([1.0, 1.0, 1e-4])
    y = jax.random.normal(jax.random.fold_in(key, 1), (16, 40, 3))
    R_est, _ = kabsch(x, y, jnp.ones((16, 40)))
    np.testing.assert_allclose(jnp.linalg.det(R_est), np.ones(16), atol=1e-4)
    np.testing.assert_allclose(
        jnp.einsum("bij,bkj->bik", R_est, R_est),
        np.broadcast_to(np.eye(3), (16, 3, 3)),
        atol=1e-4,
    )


def test_kabsch_min_points():
    # 3 non-collinear points determine the transform exactly.
    x, y, w, R, t = _make_problem(jax.random.PRNGKey(4), batch=4, n=3)
    R_est, t_est = kabsch(x, y, w)
    assert rotation_error_deg(R_est, R).max() < 0.05


def test_kabsch_gradients_finite_and_correct():
    x, y, w, R, t = _make_problem(jax.random.PRNGKey(5), batch=2, n=30, noise=0.05)

    def loss(w):
        # Smooth surrogate (Frobenius + L2) — arccos-based angular error is
        # too ill-conditioned in fp32 for finite-difference checking.
        R_est, t_est = kabsch(x, y, w)
        return jnp.sum((R_est - R) ** 2) + jnp.sum((t_est - t) ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    # Finite-difference check on a handful of weights.
    eps = 1e-3
    for idx in [(0, 0), (1, 7), (0, 29)]:
        wp = w.at[idx].add(eps)
        wm = w.at[idx].add(-eps)
        fd = (loss(wp) - loss(wm)) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=0.05, atol=1e-3)


def test_kabsch_grad_isotropic_stable():
    # Perfectly isotropic exact correspondence: classic SVD backward blows
    # up (equal singular values); ours must stay finite.
    x, y, w, R, t = _make_problem(jax.random.PRNGKey(6), batch=4, n=200)

    def loss(params):
        x_, w_ = params
        R_est, t_est = kabsch(x_, y, w_)
        return jnp.sum(R_est) + jnp.sum(t_est)

    g = jax.grad(loss)((x, w))
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()


def test_so3_project():
    key = jax.random.PRNGKey(7)
    R = tf.random_rotation(key, (32,))
    noise = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (32, 3, 3))
    M = R + noise
    R_proj = so3_project(M)
    np.testing.assert_allclose(jnp.linalg.det(R_proj), np.ones(32), atol=1e-4)
    # Should beat (or match) any other rotation in Frobenius distance; check
    # against scipy-style polar projection via numpy SVD with det fix.
    U, _, Vt = np.linalg.svd(np.asarray(M))
    D = np.zeros((32, 3, 3))
    D[:, 0, 0] = 1
    D[:, 1, 1] = 1
    D[:, 2, 2] = np.linalg.det(U @ Vt)
    R_ref = U @ D @ Vt
    np.testing.assert_allclose(np.asarray(R_proj), R_ref, atol=1e-4)


def test_so3_project_exact_rotation_identity():
    R = tf.random_rotation(jax.random.PRNGKey(8), (8,))
    np.testing.assert_allclose(np.asarray(so3_project(R)), np.asarray(R), atol=1e-5)


def test_wahba_under_jit_scan():
    # Must be traceable inside scan (used by the IRLS sync loop).
    H = jax.random.normal(jax.random.PRNGKey(9), (5, 3, 3))

    def step(carry, h):
        q = wahba_quaternion(h)
        return carry + jnp.sum(q), None

    total, _ = jax.jit(lambda H: jax.lax.scan(step, 0.0, H))(H)
    assert np.isfinite(float(total))
