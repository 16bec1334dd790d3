"""fp8 (e4m3) storage for the L(g)-sized activation tables.

The round-3 roofline pinned the E/F/S train step as HBM-traffic-bound
with ~14.6 L-pass equivalents per layer over [L, F] tables
(BENCH_NOTES "Roofline"); activation storage below bf16 is the last
named traffic lever (VERDICT r3 #2).  This module provides
straight-through e4m3 quantization with per-row scales:

- storage dtype: ``float8_e4m3fn`` (max normal 448);
- scale: per ROW max/448 in f32 — rows are the natural tile here
  (feature dim 256 = two 128-lanes registers; a per-row scale
  broadcasts for free in the dequant fusion);
- compute stays in the caller's dtype: consumers see
  ``dequant = f8.astype(bf16) * scale`` and XLA fuses the dequant into
  the consuming op while materializing the f8 array — the HBM-resident
  representation is 1 byte/element + [rows] scales;
- gradients: straight-through (identity) — quantization noise enters
  the VALUES, not the derivative structure, so custom-VJP residuals
  stay differentiable functions of the primals (the grad-of-grad
  invariant, CLAUDE.md).

Opt-in via ``ALIGNN_TPU_FP8_LTABLES=1`` (bench A/B knob).  Applied to
the two dominant [L, F] terms: the pair-stage custom-VJP residual m2
(ops/pallas_dense._pair_fwd) and the z residual stream at ALIGNN-layer
boundaries (nn/layers dense L-stage).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

E4M3_MAX = 448.0


def fp8_ltables_enabled() -> bool:
    import os

    # repo env-knob convention (bench.env_on): unset, empty, and "0"
    # all mean OFF — `for v in 0 1` A/B sweeps must get two real arms
    return os.environ.get("ALIGNN_TPU_FP8_LTABLES", "") not in ("", "0")


def quantize_e4m3(x):
    """x -> (q_f8, scale_f32[rows,1]); q * scale ~= x rowwise."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / E4M3_MAX
    q = (x.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    return q, scale


def dequantize(q, scale, dtype):
    return (q.astype(jnp.float32) * scale).astype(dtype)


@jax.custom_vjp
def fp8_round_trip(x):
    """Straight-through e4m3 round trip: value quantizes, grad passes.

    The array that crosses the materialization boundary is the f8
    payload (XLA keeps the smallest intermediate and fuses the scale
    multiply into consumers).
    """
    q, scale = quantize_e4m3(x)
    return dequantize(q, scale, x.dtype)


def _rt_fwd(x):
    return fp8_round_trip(x), None


def _rt_bwd(_res, g):
    return (g,)


fp8_round_trip.defvjp(_rt_fwd, _rt_bwd)
