import os

import jax

from mvreg.utils.compile_cache import enable_compile_cache


def test_enable_compile_cache(tmp_path, monkeypatch):
    import mvreg.utils.compile_cache as cc

    monkeypatch.delenv("MVREG_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(cc, "_enabled", False)  # suite tests may have
    # enabled it already (Registrar does)
    prior_dir = jax.config.jax_compilation_cache_dir
    try:
        d = str(tmp_path / "xla")
        got = enable_compile_cache(d)
        assert got == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
        # idempotent
        assert enable_compile_cache(d) == d
    finally:
        # Restore the suite's prior cache dir: monkeypatch restores
        # _enabled, so later enable_compile_cache() calls no-op and the
        # dir must be left consistent with that state (not tmp_path,
        # not unconditionally None).
        jax.config.update("jax_compilation_cache_dir", prior_dir)


def test_compile_cache_opt_out(monkeypatch):
    monkeypatch.setenv("MVREG_COMPILE_CACHE", "0")
    assert enable_compile_cache() is None
