"""Persistent compilation cache wiring (alignn_tpu/compile_cache.py).

Runs on the CPU mesh; asserts the cache dir actually receives entries
after a jit compile and that the env opt-outs are honored.  The cache
only affects compile time (entries key on exact HLO + compiler
version), so no numeric assertions are needed beyond a smoke value.
"""

import jax
import jax.numpy as jnp
import pytest

from alignn_tpu.compile_cache import enable_persistent_cache


@pytest.fixture(autouse=True)
def _restore_cache_config():
    """jax.config is process-global: un-point the cache dir afterwards
    so the rest of the suite doesn't write entries into a test tmpdir."""
    prev = jax.config.jax_compilation_cache_dir
    try:
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_cache_populates(tmp_path, monkeypatch):
    monkeypatch.delenv("ALIGNN_TPU_NO_COMPILE_CACHE", raising=False)
    cache = tmp_path / "xla_cache"
    got = enable_persistent_cache(str(cache), min_compile_secs=0.0)
    assert got == str(cache)

    @jax.jit
    def f(x):
        return jnp.sin(x) @ jnp.cos(x).T + x.sum()

    x = jnp.arange(64.0, dtype=jnp.float32).reshape(8, 8)
    out = float(f(x).sum())
    assert out == out  # finite smoke value, not NaN
    entries = list(cache.rglob("*")) if cache.exists() else []
    assert any(p.is_file() for p in entries), (
        "persistent cache dir received no entries after a jit compile")


def test_cache_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("ALIGNN_TPU_NO_COMPILE_CACHE", "1")
    assert enable_persistent_cache(str(tmp_path / "nope")) is None
    assert not (tmp_path / "nope").exists()


def test_cache_env_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("ALIGNN_TPU_NO_COMPILE_CACHE", raising=False)
    env_dir = tmp_path / "from_env"
    monkeypatch.setenv("ALIGNN_TPU_COMPILE_CACHE", str(env_dir))
    assert enable_persistent_cache() == str(env_dir)
    assert env_dir.exists()
