"""Persistent XLA compilation cache for mvreg entry points.

The reference amortizes nothing across runs (every eval script pays the
full CUDA autotune/compile each invocation); on TPU the equivalent tax
is XLA compilation — a 30-fragment scene program costs ~30 s to compile
through the remote-compile relay but milliseconds to rerun. JAX's
persistent compilation cache removes that tax across processes: every
mvreg CLI (train/benchmark/diagnose/bench.py) and the Registrar API
call :func:`enable_compile_cache` once before tracing.

Opt out with ``MVREG_COMPILE_CACHE=0`` (or point it at a directory).
Backends whose executables cannot be serialized simply skip the cache —
enabling it is always safe.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "mvreg", "xla_cache"
)

_enabled = False


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Returns the cache directory in use, or None if disabled via
    ``MVREG_COMPILE_CACHE=0``.
    """
    global _enabled
    env = os.environ.get("MVREG_COMPILE_CACHE", "")
    if env in ("0", "off", "false"):
        return None
    if cache_dir is None:
        cache_dir = env if env not in ("", "1", "on", "true") else _DEFAULT_DIR
    if _enabled:
        return cache_dir
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that takes meaningful compile time; the relay
    # round trip alone is ~0.3 s, so even small programs benefit.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return cache_dir
