"""Profiling: XLA/TPU traces + per-step throughput counters.

Replaces the reference's torch.profiler wrapper (`alignn/profiler.py`,
schedule wait=2/warmup=2/active=6 with TensorBoard export, :69-84) with
`jax.profiler` traces (XPlane / TensorBoard-compatible) plus a simple
step-timer that reports edges/s — the framework's headline throughput
metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "./jax_trace"):
    """Capture a TensorBoard-compatible device trace around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_step(step_fn: Callable, state, batch,
                 wait: int = 2, warmup: int = 2, active: int = 6,
                 logdir: Optional[str] = "./jax_trace",
                 edges_per_batch: Optional[int] = None) -> Dict:
    """Profile a jitted train step with the reference's schedule.

    Runs `wait` untimed steps, `warmup` timed-but-discarded steps, then
    `active` traced+timed steps (reference profiler.py:69-84 schedule).
    Returns {"step_time_s", "edges_per_s", "trace_dir"}.

    NOTE: `step_fn` must be built with donate=False
    (train/state.make_train_step) — the caller's `state` buffers are
    reused across schedule phases here, and a donating step would
    delete them after the first call.
    """
    if active < 1:
        raise ValueError("profile_step requires active >= 1")
    out = None
    for _ in range(wait):
        state, out = step_fn(state, batch)
    if out is not None:
        jax.block_until_ready(out)
    for _ in range(warmup):
        state, out = step_fn(state, batch)
    if out is not None:
        jax.block_until_ready(out)

    ctx = trace(logdir) if logdir else contextlib.nullcontext()
    with ctx:
        t0 = time.perf_counter()
        for _ in range(active):
            state, out = step_fn(state, batch)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / active
    result = {"step_time_s": dt, "trace_dir": logdir}
    if edges_per_batch:
        result["edges_per_s"] = edges_per_batch / dt
    return result


def memory_stats() -> Dict:
    """Per-device memory stats (profile_memory parity)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = {}
    return out
