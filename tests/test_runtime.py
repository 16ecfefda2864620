"""utils/runtime.py — persistent-compile-cache wiring."""

import os

import jax
import jax.numpy as jnp
import pytest

from shapley_vit_tpu.utils import runtime


@pytest.fixture(autouse=True)
def _restore_cache_config():
    """enable_compile_cache mutates process-global jax config; restore it so
    the rest of the suite doesn't persist every sub-second compile into a
    dead tmp_path dir."""
    before = (
        jax.config.jax_compilation_cache_dir,
        jax.config.jax_persistent_cache_min_compile_time_secs,
    )
    yield
    jax.config.update("jax_compilation_cache_dir", before[0])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", before[1])


def test_noop_when_unset(monkeypatch):
    monkeypatch.delenv("SVT_COMPILE_CACHE", raising=False)
    assert runtime.enable_compile_cache(None) is None


def test_env_var_fallback(monkeypatch, tmp_path):
    monkeypatch.setenv("SVT_COMPILE_CACHE", str(tmp_path / "envcache"))
    got = runtime.enable_compile_cache(None)
    assert got == str(tmp_path / "envcache")
    assert os.path.isdir(got)


def test_cache_populated_after_compile(tmp_path):
    cache = runtime.enable_compile_cache(
        str(tmp_path / "cache"), min_compile_secs=0.0
    )
    assert cache is not None and os.path.isdir(cache)

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    f(jnp.ones((16, 16))).block_until_ready()
    entries = [
        os.path.join(r, fn) for r, _, fns in os.walk(cache) for fn in fns
    ]
    assert entries, "persistent cache wrote no entries"


def test_config_threads_env(monkeypatch, tmp_path):
    from shapley_vit_tpu.config import Config

    monkeypatch.setenv("SVT_COMPILE_CACHE", str(tmp_path / "cfgcache"))
    cfg = Config.from_env(env_file=str(tmp_path / "missing.env"))
    assert cfg.paths.compile_cache_dir == str(tmp_path / "cfgcache")
