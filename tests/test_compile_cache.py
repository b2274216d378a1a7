"""Persistent compilation cache knob (utils/compile_cache.py)."""

import os

import jax


def test_enable_sets_jax_config(tmp_path, monkeypatch):
    from msr3d_tpu.utils import compile_cache

    monkeypatch.delenv("MSR3D_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(compile_cache, "_enabled_dir", None)
    d = tmp_path / "xla"
    got = compile_cache.enable_compile_cache(d)
    assert got == str(d)
    assert d.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(d)
    assert jax.config.jax_persistent_cache_min_entry_size_bytes == 0
    # idempotent
    assert compile_cache.enable_compile_cache(d) == str(d)


def test_env_toggle_disables(tmp_path, monkeypatch):
    from msr3d_tpu.utils import compile_cache

    monkeypatch.setenv("MSR3D_COMPILE_CACHE", "0")
    monkeypatch.setattr(compile_cache, "_enabled_dir", None)
    assert compile_cache.enable_compile_cache(tmp_path / "x") is None
    assert not (tmp_path / "x").exists()


def test_default_dir_env_override(monkeypatch):
    from msr3d_tpu.utils import compile_cache

    monkeypatch.setenv("MSR3D_COMPILE_CACHE_DIR", "/tmp/somewhere")
    assert compile_cache.default_cache_dir() == "/tmp/somewhere"
