"""Numerical-safety checks: checkify wrappers and NaN tripwires.

SURVEY.md §5.2: the reference has no sanitizers (Python + vendor CUDA
kernels); JAX's functional model removes in-program data races, and this
module supplies the remaining piece — functionalized runtime checks for
NaN/Inf and out-of-bounds indexing inside jitted programs, plus a host
tripwire for output pytrees. Zero overhead unless enabled (the checkify
transform is opt-in per call site).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify

Array = jax.Array

# float_checks: every primitive output checked for NaN/Inf.
# index_checks: every gather/scatter checked for OOB (padding bugs).
FULL_CHECKS = checkify.float_checks | checkify.index_checks | checkify.user_checks


def checked(fn: Callable, errors=FULL_CHECKS) -> Callable:
    """Wrap `fn` so every call raises on NaN/Inf/OOB inside jit.

    The checkify transform functionalizes the checks (TPU-compatible: no
    host callbacks in the hot path); the wrapper throws the first error
    on the host after the step completes.

        step = checked(train_step)   # debug runs
        state, metrics = step(state, batch)
    """
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def check_finite(x: Array, name: str = "value") -> None:
    """In-graph assertion (active only under `checked`): x is finite."""
    checkify.check(
        jnp.all(jnp.isfinite(x)), f"non-finite {name} detected"
    )


def assert_finite_tree(tree: Any, name: str = "output") -> None:
    """Host-side tripwire: raise if any leaf has NaN/Inf (pulls to host).

    For test/debug use after a step; not for the hot path.
    """
    import numpy as np

    bad = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            a = np.asarray(leaf)
            if not np.all(np.isfinite(a)):
                bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(
            f"non-finite leaves in {name}: {', '.join(bad[:8])}"
        )
