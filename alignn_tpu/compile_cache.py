"""Persistent XLA compilation cache for the CLIs and bench.

Under the axon remote-compile tunnel a cold jit of the 4+4 train step
costs 20s on an idle tunnel and minutes under load (CLAUDE.md tunnel
notes); every CLI invocation — a training restart, an FF task, a
serving boot — re-pays it from scratch.  JAX's persistent cache keys
entries on the serialized HLO + compile options + backend/compiler
version, so hits are exact-module matches and correctness is
unaffected; a version bump simply misses and recompiles.

The reference has no counterpart (torch eager never AOT-compiles);
this is TPU-native runtime infra, same spirit as jit caching guidance
in the JAX docs.  Opt-out via ALIGNN_TPU_NO_COMPILE_CACHE=1; relocate
via ALIGNN_TPU_COMPILE_CACHE=/path.
"""

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/alignn_tpu/xla")


def enable_persistent_cache(path=None, min_compile_secs=1.0):
    """Point JAX's persistent compilation cache at a writable dir.

    Call before the first jit dispatch (safe after too — only
    subsequent compiles are cached).  Returns the cache dir, or None
    when disabled/unavailable.  ``min_compile_secs`` filters trivial
    compiles so the cache holds the expensive train/forward modules,
    not every 1-op helper.
    """
    if os.environ.get("ALIGNN_TPU_NO_COMPILE_CACHE"):
        return None
    explicit = path or os.environ.get("ALIGNN_TPU_COMPILE_CACHE")
    path = explicit or DEFAULT_DIR
    import jax

    if not explicit and not _non_cpu_platform_configured(jax):
        # Default-path enabling targets the remote-compile tunnel; on
        # CPU the XLA:CPU AOT loader logs machine-feature mismatch
        # warnings on every hit and compiles are cheap anyway.  An
        # explicit path/env is an opt-in that wins.  Decided WITHOUT
        # jax.default_backend(): that initializes the backend, which
        # under a wedged tunnel hangs unboundedly and caches a failed
        # init (ADVICE r3) — config/env inspection is free.
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - old jax / read-only fs
        return None
    return path


def _non_cpu_platform_configured(jax):
    """True when a non-CPU backend is configured, without backend init.

    Positive-evidence rules (each checkable without initializing any
    backend): the first entry of jax_platforms (config or JAX_PLATFORMS
    env) names a non-cpu platform; the axon TPU plugin is armed
    (PALLAS_AXON_POOL_IPS — it wins platform discovery when set,
    CLAUDE.md tunnel notes); a standard TPU VM's runtime is present
    (libtpu importable or /dev/accel* device nodes — jax would
    auto-discover it, and those hosts are exactly where the cache saves
    minutes of compile).  Unknown => False, so a bare CPU run never
    pays cache-dir setup by default.
    """
    plats = (getattr(jax.config, "jax_platforms", None)
             or os.environ.get("JAX_PLATFORMS") or "")
    first = plats.split(",")[0].strip().lower()
    if first:
        return first != "cpu"
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True
    import glob
    import importlib.util

    # /dev/accel* is TPU-specific; bare /dev/vfio/* is generic device
    # passthrough (GPUs, NICs) and was a false TPU signal on CPU-only
    # hosts (ADVICE r4 #4) — require it alongside a TPU runtime below
    if glob.glob("/dev/accel*"):
        return True
    return importlib.util.find_spec("libtpu") is not None
