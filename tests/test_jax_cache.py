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


def test_default_dir_keyed_by_config(tmp_path, monkeypatch):
    """The default cache dir embeds a config fingerprint so AOT entries
    never load under a different XLA host-feature detection."""
    jc = _fresh(monkeypatch, QPNET_COMPILE_CACHE=None, HOME=str(tmp_path))
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    a = jc._config_fingerprint()
    monkeypatch.setenv("XLA_FLAGS", "")
    b = jc._config_fingerprint()
    assert a != b
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    assert jc._config_fingerprint() == a    # deterministic

    jc.enable_compile_cache()
    cfg = jax.config.jax_compilation_cache_dir
    assert cfg.startswith(str(tmp_path))
    assert os.path.basename(cfg) == a
