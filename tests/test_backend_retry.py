"""Transient-backend retry machinery (alignn_tpu/backend_retry.py).

Round 2 lost its driver perf record to a single un-retried UNAVAILABLE
at first dispatch (VERDICT r2 #1); round 3 additionally observed *hung*
backend inits.  These tests pin the retry/transient-classification
semantics and the killable subprocess probe on the CPU backend.
"""

import pytest

from alignn_tpu.backend_retry import (
    BackendHang,
    is_transient,
    probe_devices,
    probe_devices_subprocess,
    retry_transient,
)


def test_is_transient_classification():
    assert is_transient(RuntimeError(
        "Unable to initialize backend 'axon': UNAVAILABLE: TPU backend "
        "setup/compile error (Unavailable)."))
    assert is_transient(RuntimeError("DEADLINE_EXCEEDED: rpc timed out"))
    assert is_transient(BackendHang("UNAVAILABLE: backend probe exceeded"))
    assert not is_transient(ValueError("shape mismatch"))
    assert not is_transient(AssertionError("loss is NaN"))


def test_retry_recovers_after_transients():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("UNAVAILABLE: transient")
        return "ok"

    assert retry_transient(flaky, backoffs=(0, 0, 0, 0)) == "ok"
    assert len(calls) == 3


def test_retry_propagates_non_transient_immediately():
    calls = []

    def buggy():
        calls.append(1)
        raise ValueError("real bug")

    with pytest.raises(ValueError):
        retry_transient(buggy, backoffs=(0,))
    assert len(calls) == 1


def test_retry_exhausts_and_raises_last_transient():
    def always_down():
        raise RuntimeError("UNAVAILABLE: still down")

    with pytest.raises(RuntimeError, match="still down"):
        retry_transient(always_down, attempts=3, backoffs=(0, 0))


def test_probe_devices_cpu():
    # on the test CPU mesh the probe must pass end to end
    devs = probe_devices()
    assert len(devs) >= 1


def test_probe_subprocess_happy_path():
    # This test pins the subprocess mechanics (spawn, deadline, rc
    # handling) on the CPU backend.  Two env overrides make it hermetic:
    # JAX_PLATFORMS=cpu (the conftest's in-process jax.config override
    # does not reach children) and PALLAS_AXON_POOL_IPS="" — the axon
    # sitecustomize calls register() at EVERY interpreter start when
    # that var is set, and a wedged tunnel can hang python startup
    # itself (observed round 3), which is the environment's failure,
    # not this code path's.
    probe_devices_subprocess(timeout_s=300.0,
                             extra_env={"JAX_PLATFORMS": "cpu",
                                        "PALLAS_AXON_POOL_IPS": ""})


def test_probe_subprocess_timeout_raises_transient_hang():
    # python startup alone exceeds 1 ms -> deterministic TimeoutExpired
    with pytest.raises(BackendHang) as ei:
        probe_devices_subprocess(timeout_s=0.001)
    assert is_transient(ei.value)


def test_probes_exhausted_not_retried():
    """ProbesExhausted must short-circuit outer retry loops: nested
    retries turned a bounded ~30 min wedged-tunnel failure into ~95 min
    (attempts^2 probes) in the round-3 rehearsal."""
    from alignn_tpu.backend_retry import ProbesExhausted

    e = ProbesExhausted("backend unavailable after full probe retry "
                        "cycle: BackendHang: UNAVAILABLE: ...")
    assert not is_transient(e)  # despite the UNAVAILABLE in the message

    calls = []

    def probe_phase():
        calls.append(1)
        raise ProbesExhausted("UNAVAILABLE: still down")

    with pytest.raises(ProbesExhausted):
        retry_transient(probe_phase, attempts=3, backoffs=(0, 0))
    assert len(calls) == 1
