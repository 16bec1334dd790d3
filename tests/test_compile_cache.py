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
    """jax.config is process-global: restore ALL three cache knobs
    afterwards so nothing (dir, min-time, min-size) leaks into the rest
    of the suite (ADVICE r3 low)."""
    keys = ("jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes")
    prev = {k: getattr(jax.config, k) for k in keys}
    try:
        yield
    finally:
        for k, v in prev.items():
            jax.config.update(k, v)


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


def test_default_path_never_inits_backend(monkeypatch):
    """ADVICE r3: the CPU-vs-TPU decision must not call
    jax.default_backend() (full backend init; hangs on a wedged tunnel
    and caches failed inits).  Prove it by making init explosive."""
    monkeypatch.delenv("ALIGNN_TPU_NO_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("ALIGNN_TPU_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(jax, "default_backend",
                        lambda: (_ for _ in ()).throw(
                            RuntimeError("backend init attempted")))
    # Suite runs with JAX_PLATFORMS=cpu (conftest) -> default path is a
    # no-op decided from config alone.
    assert enable_persistent_cache() is None


def test_axon_env_counts_as_tpu(tmp_path, monkeypatch):
    """With no platform configured, an armed axon plugin env is the
    positive non-CPU signal (still no backend init)."""
    from alignn_tpu import compile_cache

    monkeypatch.delenv("ALIGNN_TPU_NO_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("ALIGNN_TPU_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    class _NoPlats:
        jax_platforms = ""

        @staticmethod
        def update(*a, **k):
            pass

    fake = type("J", (), {"config": _NoPlats,
                          "default_backend": staticmethod(
                              lambda: (_ for _ in ()).throw(
                                  RuntimeError("init attempted")))})
    assert compile_cache._non_cpu_platform_configured(fake)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not compile_cache._non_cpu_platform_configured(fake)
