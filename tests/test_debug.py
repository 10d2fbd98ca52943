"""checkify NaN/OOB tripwires (SURVEY.md §5.2 sanitizer analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvreg.utils.debug import assert_finite_tree, checked, check_finite


def test_checked_catches_nan():
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    f = checked(jax.jit(bad))
    assert np.isfinite(float(f(jnp.array(2.0))))
    with pytest.raises(Exception, match="nan"):
        f(jnp.array(-1.0))


def test_checked_passes_clean_pipeline():
    """The registration core under full float checks: no NaNs anywhere."""
    from mvreg.core.procrustes import irls_kabsch

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    y = x[:, [1, 0, 2]] * jnp.array([1.0, -1.0, 1.0]) + 0.3
    w = jnp.ones(64)
    f = checked(jax.jit(lambda x, y, w: irls_kabsch(x, y, w)))
    R, t, wf = f(x, y, w)
    assert np.all(np.isfinite(np.asarray(R)))


def test_check_finite_user_check():
    def g(x):
        y = x / x.sum()
        check_finite(y, "normalized")
        return y

    f = checked(jax.jit(g))
    f(jnp.ones(4))  # fine
    with pytest.raises(Exception, match="normalized"):
        f(jnp.zeros(4))  # 0/0 -> NaN; user check fires


def test_assert_finite_tree():
    good = {"a": jnp.ones(3), "b": (jnp.zeros(2), jnp.array(1.0))}
    assert_finite_tree(good)
    bad = {"a": jnp.array([1.0, np.nan])}
    with pytest.raises(FloatingPointError, match="a"):
        assert_finite_tree(bad, "params")
