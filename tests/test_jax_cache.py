"""Persistent-compilation-cache plumbing (qpnet_tpu/utils/jax_cache.py)."""

import importlib
import os

import jax


def _fresh(monkeypatch, **env):
    from qpnet_tpu.utils import jax_cache
    importlib.reload(jax_cache)
    for k, v in env.items():
        if v is None:
            monkeypatch.delenv(k, raising=False)
        else:
            monkeypatch.setenv(k, v)
    return jax_cache


def test_cache_dir_configured(tmp_path, monkeypatch):
    cache_dir = str(tmp_path / "xla")
    jc = _fresh(monkeypatch, QPNET_COMPILE_CACHE=cache_dir)
    jc.enable_compile_cache()
    assert jax.config.jax_compilation_cache_dir == cache_dir
    assert os.path.isdir(cache_dir)
    # idempotent
    jc.enable_compile_cache()
    assert jax.config.jax_compilation_cache_dir == cache_dir


def test_cache_opt_out(tmp_path, monkeypatch):
    jc = _fresh(monkeypatch, QPNET_COMPILE_CACHE="off")
    before = jax.config.jax_compilation_cache_dir
    jc.enable_compile_cache()
    assert jax.config.jax_compilation_cache_dir == before
    assert not jc._ENABLED
