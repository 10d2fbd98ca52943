import os

import jax

from mvreg.utils.compile_cache import enable_compile_cache


def test_enable_compile_cache(tmp_path, monkeypatch):
    import mvreg.utils.compile_cache as cc

    monkeypatch.delenv("MVREG_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(cc, "_enabled", False)  # suite tests may have
    # enabled it already (Registrar does)
    d = str(tmp_path / "xla")
    got = enable_compile_cache(d)
    assert got == d
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # idempotent
    assert enable_compile_cache(d) == d
    # don't leave the suite's later compiles pointed at tmp_path
    jax.config.update("jax_compilation_cache_dir", None)


def test_compile_cache_opt_out(monkeypatch):
    monkeypatch.setenv("MVREG_COMPILE_CACHE", "0")
    assert enable_compile_cache() is None
