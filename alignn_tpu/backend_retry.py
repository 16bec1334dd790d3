"""Retry helper for transient TPU-backend init failures.

The axon remote TPU backend can fail its first contact with a transient
``UNAVAILABLE: TPU backend setup/compile error`` (observed round 2:
BENCH_r02.json rc=1 — one such failure cost the round its driver-verified
perf record).  JAX caches backend-init *failures*, so a bare retry in the
same process re-raises from cache; between attempts the cached backends
must be cleared.

Usage::

    from alignn_tpu.backend_retry import retry_transient

    devices = retry_transient(probe_devices)          # readiness probe
    result  = retry_transient(main)                   # or a whole workload

Only errors that look transient (UNAVAILABLE / DEADLINE_EXCEEDED /
backend-init) are retried; real bugs propagate immediately.
"""

from __future__ import annotations

import time

_TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Unable to initialize backend",
    "backend setup/compile error",
    "Socket closed",
    "Connection reset",
    "RESOURCE_EXHAUSTED: Attempting to reserve",
)


def is_transient(exc: BaseException) -> bool:
    if isinstance(exc, ProbesExhausted):
        return False  # already retried a full cycle — don't multiply
    msg = f"{type(exc).__name__}: {exc}"
    return any(m in msg for m in _TRANSIENT_MARKERS)


def _clear_backends() -> None:
    """Best-effort: drop JAX's cached (possibly failed) backend handles."""
    try:
        import jax.extend.backend as jexb

        jexb.clear_backends()
        return
    except Exception:
        pass
    try:
        from jax._src import xla_bridge

        xla_bridge._clear_backends()
    except Exception:
        pass


def probe_devices():
    """Touch the device end to end (init + dispatch + fetch)."""
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    x = jnp.ones((8, 8), jnp.float32)
    float(jax.device_get(jnp.sum(x)))
    return devs


class BackendHang(RuntimeError):
    """Backend init exceeded the probe deadline (treated as transient)."""


class ProbesExhausted(RuntimeError):
    """A full probe retry cycle failed — do NOT retry again.

    Raised by callers after ``retry_transient(probe_...)`` gives up, so
    an OUTER retry loop doesn't multiply the (already long) probe
    schedule: nested retries turned a ~30 min bounded failure into a
    ~95 min stall in the wedged-tunnel rehearsal (round 3).
    ``is_transient`` deliberately returns False for it even though the
    underlying cause is transient; report it with transient=True."""


def probe_devices_subprocess(timeout_s: float = 600.0,
                             extra_env: dict | None = None) -> None:
    """Probe backend init in a KILLABLE subprocess with a deadline.

    The axon tunnel's observed failure modes are (a) a fast transient
    ``UNAVAILABLE`` (round 2) and (b) an indefinite *hang* inside
    ``jax.devices()`` (round 3) — the latter cannot be recovered
    in-process.  Probing in a subprocess bounds each attempt; on timeout
    we raise :class:`BackendHang`, which ``is_transient`` matches, so
    ``retry_transient`` backs off and re-probes.  Only after the
    subprocess probe succeeds does the caller init in-process."""
    import os
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; "
            "float(jax.device_get(jnp.ones((8, 8)).sum()))")
    env = dict(os.environ)
    # in-process platform overrides (jax.config) don't reach the child:
    # mirror them so a caller already forced onto CPU (tests, the
    # verify recipe) probes CPU instead of retrying a wedged tunnel
    try:
        import jax

        plat = jax.config.jax_platforms
    except Exception:
        plat = None
    if plat:
        env["JAX_PLATFORMS"] = plat
        if plat == "cpu":
            # the axon sitecustomize register() can hang interpreter
            # startup when the tunnel is wedged; a CPU probe never
            # needs it
            env["PALLAS_AXON_POOL_IPS"] = ""
    env.update(extra_env or {})
    try:
        res = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True, env=env)
    except subprocess.TimeoutExpired:
        raise BackendHang(
            f"UNAVAILABLE: backend probe exceeded {timeout_s:.0f}s "
            f"(hung init)") from None
    if res.returncode != 0:
        tail = (res.stderr or res.stdout or "").strip().splitlines()
        raise RuntimeError("backend probe failed: "
                           + (tail[-1] if tail else "no output"))


def retry_transient(fn, *args, attempts: int = 5,
                    backoffs=(30, 45, 60, 60), log=None, **kwargs):
    """Run ``fn``; on a transient backend error, clear backends, back off,
    and retry (up to ``attempts`` total tries).  Non-transient errors and
    the final transient error propagate."""
    last = None
    for i in range(attempts):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — filtered by is_transient
            if not is_transient(e):
                raise
            last = e
            if i == attempts - 1:
                break
            delay = backoffs[min(i, len(backoffs) - 1)]
            if log is not None:
                log(f"transient backend error (attempt {i + 1}/{attempts}, "
                    f"retrying in {delay}s): {e}")
            _clear_backends()
            time.sleep(delay)
    raise last
