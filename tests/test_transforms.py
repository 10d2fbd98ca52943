import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvreg.core import transforms as tf


def test_compose_inverse_roundtrip():
    key = jax.random.PRNGKey(0)
    R, t = tf.random_rigid(key, (7,))
    Ri, ti = tf.inverse(R, t)
    Rc, tc = tf.compose(R, t, Ri, ti)
    np.testing.assert_allclose(Rc, np.broadcast_to(np.eye(3), (7, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(tc, np.zeros((7, 3)), atol=1e-5)


def test_apply_transform_matches_matrix():
    key = jax.random.PRNGKey(1)
    R, t = tf.random_rigid(key, (4,))
    pts = jax.random.normal(jax.random.PRNGKey(2), (4, 11, 3))
    y = tf.apply_transform(R, t, pts)
    T = tf.to_matrix(R, t)
    hom = jnp.concatenate([pts, jnp.ones((4, 11, 1))], axis=-1)
    y2 = jnp.einsum("bij,bnj->bni", T, hom)[..., :3]
    np.testing.assert_allclose(y, y2, atol=1e-5)
    R2, t2 = tf.from_matrix(T)
    np.testing.assert_allclose(R2, R, atol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-6)


def test_relative_pose():
    key = jax.random.PRNGKey(3)
    Ri, ti = tf.random_rigid(key, ())
    Rj, tj = tf.random_rigid(jax.random.PRNGKey(4), ())
    Rij, tij = tf.relative(Ri, ti, Rj, tj)
    # points in frame i mapped by T_ij should equal world->j of world points
    x = jax.random.normal(jax.random.PRNGKey(5), (6, 3))
    world = tf.apply_transform(Ri, ti, x)
    in_j = tf.apply_transform(*tf.inverse(Rj, tj), world)
    np.testing.assert_allclose(tf.apply_transform(Rij, tij, x), in_j, atol=1e-5)


def test_quat_rotmat_roundtrip():
    key = jax.random.PRNGKey(6)
    R = tf.random_rotation(key, (64,))
    q = tf.rotmat_to_quat(R)
    R2 = tf.quat_to_rotmat(q)
    np.testing.assert_allclose(R2, R, atol=1e-5)
    # unit norm, canonical sign
    np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), np.ones(64), atol=1e-6)
    assert (q[:, 0] >= -1e-7).all()


@pytest.mark.parametrize("angle", [1e-9, 1e-5, 0.3, 3.1])
def test_so3_exp(angle):
    axis = jnp.array([0.3, -0.5, 0.81])
    axis = axis / jnp.linalg.norm(axis)
    R = tf.so3_exp(axis * angle)
    # orthogonality + rotation angle
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    tr = jnp.clip((jnp.trace(R) - 1) / 2, -1, 1)
    np.testing.assert_allclose(jnp.arccos(tr), angle, atol=1e-4)


def test_random_rotation_is_rotation():
    R = tf.random_rotation(jax.random.PRNGKey(7), (32,))
    np.testing.assert_allclose(
        jnp.einsum("bij,bkj->bik", R, R), np.broadcast_to(np.eye(3), (32, 3, 3)),
        atol=1e-5,
    )
    np.testing.assert_allclose(jnp.linalg.det(R), np.ones(32), atol=1e-5)
