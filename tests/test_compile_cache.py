"""Persistent-compilation-cache helper (utils/compile_cache.py): the
serving CLIs enable it by default so 8B cold-start compiles (5-15 min)
happen once per machine, not once per process."""

import os

import jax
import pytest

from lavida_mod_tpu.utils import compile_cache


@pytest.fixture(autouse=True)
def _restore_jax_cache_config():
    """Tests mutate global jax config; leaking a tmp_path cache dir into
    the rest of the suite would persist every >3s CPU-mesh compile."""
    before = (jax.config.jax_compilation_cache_dir,
              jax.config.jax_persistent_cache_min_compile_time_secs)
    yield
    jax.config.update("jax_compilation_cache_dir", before[0])
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      before[1])


def test_enable_sets_config(tmp_path, monkeypatch):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    d = str(tmp_path / "xla")
    got = compile_cache.enable(d, min_compile_secs=3.0)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 3.0


def test_unwritable_dir_degrades_to_uncached(tmp_path, monkeypatch):
    """A read-only HOME (serving containers) must not crash CLI startup
    — enable() returns None and leaves jax config untouched."""
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    before = jax.config.jax_compilation_cache_dir
    blocked = tmp_path / "blocked"
    blocked.write_text("a file, not a dir")  # makedirs -> OSError
    assert compile_cache.enable(str(blocked / "xla")) is None
    assert jax.config.jax_compilation_cache_dir == before


def test_user_env_wins(tmp_path, monkeypatch):
    """An explicit JAX_COMPILATION_CACHE_DIR is the user's configuration
    — enable() must not override it with the default dir."""
    before = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    assert compile_cache.enable() == str(tmp_path)
    # config untouched (jax reads the env var natively)
    assert jax.config.jax_compilation_cache_dir == before


def test_explicit_path_beats_env(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "env"))
    d = str(tmp_path / "explicit")
    assert compile_cache.enable(d) == d
    assert jax.config.jax_compilation_cache_dir == d
