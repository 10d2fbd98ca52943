import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvreg.ops.svd3 import eigh3x3, svd3


def _random_sym(key, n):
    A = jax.random.normal(key, (n, 3, 3))
    return 0.5 * (A + jnp.swapaxes(A, -1, -2))


def test_eigh3x3_matches_lapack():
    B = _random_sym(jax.random.PRNGKey(0), 128)
    w, V = eigh3x3(B)
    w_ref = np.sort(np.linalg.eigvalsh(np.asarray(B)), axis=-1)[:, ::-1]
    np.testing.assert_allclose(w, w_ref, atol=1e-4)
    # reconstruction + orthogonality
    recon = jnp.einsum("bij,bj,bkj->bik", V, w, V)
    np.testing.assert_allclose(recon, B, atol=1e-4)
    np.testing.assert_allclose(
        jnp.einsum("bij,bik->bjk", V, V),
        np.broadcast_to(np.eye(3), (128, 3, 3)),
        atol=1e-4,
    )


def _check_svd(A, atol=1e-4):
    U, s, Vt = svd3(A)
    A = np.asarray(A)
    n = A.shape[0]
    recon = np.einsum("bij,bj,bjk->bik", np.asarray(U), np.asarray(s), np.asarray(Vt))
    np.testing.assert_allclose(recon, A, atol=atol)
    np.testing.assert_allclose(
        np.einsum("bij,bik->bjk", np.asarray(U), np.asarray(U)),
        np.broadcast_to(np.eye(3), (n, 3, 3)), atol=atol)
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", np.asarray(Vt), np.asarray(Vt)),
        np.broadcast_to(np.eye(3), (n, 3, 3)), atol=atol)
    s_ref = np.linalg.svd(A, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_ref, atol=atol)
    assert (np.diff(np.asarray(s), axis=-1) <= 1e-5).all(), "descending order"


def test_svd3_random():
    A = jax.random.normal(jax.random.PRNGKey(1), (256, 3, 3))
    _check_svd(A)


def test_svd3_reflections():
    # Matrices with negative determinant: sign must land in U, s stays >= 0.
    A = jax.random.normal(jax.random.PRNGKey(2), (64, 3, 3))
    A = A.at[:, :, 0].multiply(-1.0)
    _check_svd(A)
    _, s, _ = svd3(A)
    assert (np.asarray(s) >= -1e-6).all()


@pytest.mark.parametrize(
    "build",
    [
        lambda k: jnp.zeros((8, 3, 3)),  # zero matrix
        lambda k: jnp.einsum(  # rank 1
            "bi,bj->bij",
            jax.random.normal(k, (8, 3)),
            jax.random.normal(jax.random.fold_in(k, 1), (8, 3)),
        ),
        lambda k: jax.random.normal(k, (8, 3, 3)).at[:, :, 2].set(0.0) @ jnp.eye(3),
        lambda k: jnp.broadcast_to(jnp.eye(3), (8, 3, 3)) * 2.5,  # isotropic
    ],
)
def test_svd3_degenerate(build):
    A = build(jax.random.PRNGKey(3))
    # AᵀA-based SVD has an inherent sqrt(eps)·‖A‖ floor on tiny singular
    # values in fp32 — irrelevant for registration, so tolerate it here.
    _check_svd(A, atol=2e-3)


def test_svd3_scales():
    # Very small and large magnitudes.
    A = jax.random.normal(jax.random.PRNGKey(4), (16, 3, 3))
    for scale in [1e-6, 1e6]:
        U, s, Vt = svd3(A * scale)
        s_ref = np.linalg.svd(np.asarray(A) * scale, compute_uv=False)
        np.testing.assert_allclose(
            np.asarray(s), s_ref, rtol=1e-4, atol=1e-6 * scale
        )


def test_svd3_jit_vmap_grad():
    A = jax.random.normal(jax.random.PRNGKey(5), (32, 3, 3))

    @jax.jit
    def loss(A):
        _, s, _ = svd3(A)
        return jnp.sum(s)

    g = jax.grad(loss)(A)
    assert np.isfinite(np.asarray(g)).all()
    # d(sum s)/dA for distinct singular values equals U @ Vt.
    U, s, Vt = svd3(A)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(U @ Vt), atol=1e-2
    )
