"""Pallas TPU kernel: gated aggregation for the dense-neighborhood layout.

In the dense layout (graph/dense.py) the e-table is D-blocks by dst, so
    h_i = (sum_s sigma(m[i*D+s]) * bh[i*D+s]) / (sum_s sigma(...) + eps)
is a *regular* blockwise reduction — no one-hot matmuls, no scalar
prefetch, no sorted-offset bookkeeping (contrast ops/pallas_eggc.py).
The kernel exists because the XLA lowering of the same math materializes
the f32 sigma tensors ([L, F] each) for the two reduction consumers —
the dense probe measured +32% HBM bytes vs the sparse fused kernel.
Here sigma lives only in VMEM registers.

Masking contract: callers fold the slot mask ADDITIVELY into the gate
logits before the call (`m + (mask - 1) * 1e9`) — sigma(-1e9) == 0 in
f32, which removes trash slots from numerator AND denominator exactly,
and sigma'(-1e9) == 0 kills their gradients exactly.  This keeps the
kernel mask-free (one less [L]-shaped operand) and makes the VJP's
sigma recompute automatically masked.

The custom VJP is pure elementwise/broadcast/reduce algebra — its
transposes are broadcasts and reductions, so NO scatter appears at any
derivative order (the grad-of-grad force training differentiates this
backward; no custom-recursion trick needed, unlike the sparse kernel).

Replaces the reference's DGL update_all pair on the node/L(g) stages
(alignn/models/alignn.py:100-108) for dense batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TN = 128       # output rows per tile
EPS = 1e-6
MASK_SHIFT = 1e9   # additive logit shift for masked slots
# Mosaic's default scoped-vmem cap is 16 MB; request the raised limit
# (v5e has 128 MB physical VMEM) and fall back to XLA when even a
# conservative estimate of the tile footprint would exceed the budget
# (radius graphs reach D ~ 35+ where the [TN*D, F] f32 blocks blow up).
_VMEM_LIMIT = 100 * 2 ** 20
_VMEM_BUDGET = 64 * 2 ** 20


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def fold_mask(m: jnp.ndarray, mask, weight=None) -> jnp.ndarray:
    """Fold a {0,1} slot mask into gate logits (see module docstring).

    `weight` (soft edge weights in [0, 1], eALIGNN inner-cutoff path)
    cannot be folded additively — callers with weights use the XLA path.
    """
    if mask is None:
        return m
    return m + ((mask - 1.0) * MASK_SHIFT).astype(m.dtype)[:, None]


def _xla_dense_aggregate(m, bh, D: int):
    f = m.shape[-1]
    sig = jax.nn.sigmoid(m.astype(jnp.float32))
    num = (sig * bh.astype(jnp.float32)).reshape(-1, D, f).sum(axis=1)
    den = sig.reshape(-1, D, f).sum(axis=1)
    return ((num / (den + EPS))).astype(bh.dtype)


def _kernel(m_ref, bh_ref, h_ref, *, D: int):
    f = h_ref.shape[-1]
    sig = jax.nn.sigmoid(m_ref[:].astype(jnp.float32))
    num = (sig * bh_ref[:].astype(jnp.float32)).reshape(TN, D, f).sum(
        axis=1)
    den = sig.reshape(TN, D, f).sum(axis=1)
    h_ref[:] = (num / (den + EPS)).astype(h_ref.dtype)


def _pallas_dense_aggregate(m, bh, D: int):
    rows, f = m.shape
    grid = rows // (TN * D)
    return pl.pallas_call(
        functools.partial(_kernel, D=D),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TN * D, f), lambda i: (i, 0)),
            pl.BlockSpec((TN * D, f), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((TN, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows // D, f), bh.dtype),
        compiler_params=_compiler_params(),
        interpret=jax.default_backend() == "cpu",
    )(m, bh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dense_gated_aggregate(m, bh, D: int, use_pallas: bool = True):
    """h = blockwise segment_normalized(sigmoid(m) * bh); mask pre-folded.

    m, bh: [M*D, F] (D-blocks); returns [M, F].
    """
    # tile footprint: two [TN*D, F] input blocks (double-buffered) plus
    # the in-kernel f32 casts/sigma — ~6 elem-copies in f32
    tile_bytes = TN * D * m.shape[-1] * 4 * 6
    if use_pallas and m.shape[0] % (TN * D) == 0 and \
            m.shape[-1] % 128 == 0 and tile_bytes <= _VMEM_BUDGET:
        return _pallas_dense_aggregate(m, bh, D)
    return _xla_dense_aggregate(m, bh, D)


def _gated_bwd_op_enabled() -> bool:
    # The first-class node-stage backward is OPT-IN: unlike the
    # pair-stage twin (+3.6%), it measured a consistent -0.9% on the
    # full b64 train step (1.786M vs 1.803M edges/s, interleaved 2x2
    # device A/B — BENCH_NOTES round 3 "node-stage backward") — the
    # op's den/h recompute costs an extra pass over [M*D, F] that the
    # pair stage amortizes over D^2 rows, and autodiff's residual
    # sharing is already optimal at this traffic scale.
    import os

    return os.environ.get("ALIGNN_TPU_GATED_BWD_OP", "") not in ("", "0")


def _fwd(m, bh, D, use_pallas):
    h = dense_gated_aggregate(m, bh, D, use_pallas)
    return h, (m, bh, h)


def _bwd(D, use_pallas, res, g):
    """Elementwise/broadcast/reduce backward (differentiable residuals).

    den is recomputed (a residual must stay a differentiable function of
    the primals for grad-of-grad force training); sigma recompute is
    automatically masked because m arrives mask-folded.  The opt-in
    route (see _gated_bwd_op_enabled) goes through the first-class
    gated_aggregate_bwd op instead."""
    m, bh, h = res
    if _gated_bwd_op_enabled():
        return gated_aggregate_bwd(m, bh, g, D)
    f = m.shape[-1]
    sig = jax.nn.sigmoid(m.astype(jnp.float32))
    den = sig.reshape(-1, D, f).sum(axis=1) + EPS
    g32 = g.astype(jnp.float32)
    ginv_e = _expand(g32 / den, D)
    gh_e = _expand(-g32 * h.astype(jnp.float32) / den, D)   # dL/dden
    dbh = (sig * ginv_e).astype(bh.dtype)
    dm = (sig * (1.0 - sig)
          * (bh.astype(jnp.float32) * ginv_e + gh_e)).astype(m.dtype)
    return dm, dbh


dense_gated_aggregate.defvjp(_fwd, _bwd)


def _expand(x, D: int):
    """[M, F] -> [M*D, F] row broadcast (D-block layout)."""
    M, f = x.shape
    return jnp.broadcast_to(x[:, None, :], (M, D, f)).reshape(-1, f)


def _xla_gated_bwd(m, bh, g, D: int):
    """First-order backward (recomputes den/h from primals so the
    residuals stay differentiable functions of the primals — required
    by grad-of-grad force training; sigma recompute is automatically
    masked because m arrives mask-folded)."""
    f = m.shape[-1]
    sig = jax.nn.sigmoid(m.astype(jnp.float32))
    bh32 = bh.astype(jnp.float32)
    den = sig.reshape(-1, D, f).sum(axis=1) + EPS     # [M, F]
    h = (sig * bh32).reshape(-1, D, f).sum(axis=1) / den
    g32 = g.astype(jnp.float32)
    ginv_e = _expand(g32 / den, D)                    # [M*D, F]
    gh_e = _expand(-g32 * h / den, D)                 # dL/dden route
    dbh = (sig * ginv_e).astype(bh.dtype)
    dm = (sig * (1.0 - sig) * (bh32 * ginv_e + gh_e)).astype(m.dtype)
    return dm, dbh


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gated_aggregate_bwd(m, bh, g, D: int):
    """(dm, dbh) = VJP of dense_gated_aggregate at (m, bh) with
    cotangent g, differentiable once more via the hand-derived rule
    below (the t-collapsed twin of pair_aggregate_bwd's, sharing the
    A/Bq/C row reductions across all three cotangents).  OPT-IN via
    ALIGNN_TPU_GATED_BWD_OP=1: on the node/GCN stages this measured an
    honest -0.9% (vs the pair stage's +3.6%) — see
    _gated_bwd_op_enabled for the mechanism."""
    return _xla_gated_bwd(m, bh, g, D)


def _xla_gated_bwd2(m, bh, g, u, v, D: int):
    """Hand-derived VJP of (m, bh, g) -> (dm, dbh) with cotangents
    (u, v); pinned against jax.vjp(_xla_gated_bwd) in tests.

    The t-collapsed specialization of _xla_pair_bwd2's formula: with
    sig' = sig(1-sig), sig'' = sig'(1-2 sig), den = sum_s sig + eps,
    h = num/den, ginv = g/den, gh = -g h/den, k = -g/den^2, and row
    reductions A = sum_s u sig', Bq = sum_s u sig' bh, C = sum_s v sig:

      c_g    = (Bq - h A + C) / den
      c_bh_s = u sig' ginv + sig k A
      c_m_s  = u sig'' (bh ginv + gh)
               + sig' [ k (Bq - 2 h A + bh A + C) + v ginv ]
    """
    f = m.shape[-1]
    sig = jax.nn.sigmoid(m.astype(jnp.float32))
    sigp = sig * (1.0 - sig)
    sigpp = sigp * (1.0 - 2.0 * sig)
    bh32 = bh.astype(jnp.float32)
    u32 = u.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    den = sig.reshape(-1, D, f).sum(axis=1) + EPS     # [M, F]
    h = (sig * bh32).reshape(-1, D, f).sum(axis=1) / den
    g32 = g.astype(jnp.float32)
    ginv = g32 / den
    gh = -g32 * h / den
    k = -g32 / (den * den)
    a = (u32 * sigp).reshape(-1, D, f).sum(axis=1)    # [M, F]
    bq = (u32 * sigp * bh32).reshape(-1, D, f).sum(axis=1)
    cc = (v32 * sig).reshape(-1, D, f).sum(axis=1)
    c_g = ((bq - h * a + cc) / den).astype(g.dtype)
    ginv_e = _expand(ginv, D)
    gh_e = _expand(gh, D)
    k_e = _expand(k, D)
    a_e = _expand(a, D)
    c_bh = (u32 * sigp * ginv_e + sig * _expand(k * a, D)).astype(bh.dtype)
    c_m = (u32 * sigpp * (bh32 * ginv_e + gh_e)
           + sigp * (k_e * (_expand(bq - 2.0 * h * a + cc, D)
                            + bh32 * a_e)
                     + v32 * ginv_e)).astype(m.dtype)
    return c_m, c_bh, c_g


def _gated_bwd_fwd(m, bh, g, D):
    return gated_aggregate_bwd(m, bh, g, D), (m, bh, g)


def _gated_bwd_bwd(D, res, cot):
    m, bh, g = res
    u, v = cot
    return _xla_gated_bwd2(m, bh, g, u, v, D)


gated_aggregate_bwd.defvjp(_gated_bwd_fwd, _gated_bwd_bwd)


# ---------------------------------------------------------------------------
# local-pair aggregation (v2 L-stage): rows (j, t, s), reduce over s
# ---------------------------------------------------------------------------

C_NODES = 8    # g-nodes per grid step (8*D^2 rows per tile)


def _xla_pair_aggregate(m2, bh, D: int):
    f = m2.shape[-1]
    n = bh.shape[0] // D
    sig = jax.nn.sigmoid(m2.astype(jnp.float32)).reshape(n, D, D, f)
    bh4 = bh.astype(jnp.float32).reshape(n, 1, D, f)
    num = (sig * bh4).sum(axis=2)
    den = sig.sum(axis=2)
    return (num / (den + EPS)).reshape(n * D, f).astype(bh.dtype)


def _pair_kernel(m2_ref, bh_ref, h_ref, *, D: int):
    # statically-unrolled reduction over s, one [c*D, F] slice at a
    # time: 4-D [c, D, D, F] f32 intermediates exceed the ~16 MB scoped
    # VMEM at D ~ 13 (Mosaic pads the minor-2 dim to sublane tiles)
    f = h_ref.shape[-1]
    rows = bh_ref.shape[0]          # c*D rows (j, t)
    c = rows // D
    m2 = m2_ref[:].reshape(rows, D, f)       # [(j,t), s, F]
    bh = bh_ref[:].reshape(c, D, f)          # [j, s, F]
    num = jnp.zeros((rows, f), jnp.float32)
    den = jnp.zeros((rows, f), jnp.float32)
    for s in range(D):
        sig = jax.nn.sigmoid(m2[:, s, :].astype(jnp.float32))
        bh_s = jnp.broadcast_to(
            bh[:, s, :].astype(jnp.float32)[:, None, :],
            (c, D, f)).reshape(rows, f)
        num = num + sig * bh_s
        den = den + sig
    h_ref[:] = (num / (den + EPS)).astype(h_ref.dtype)


def _pallas_pair_aggregate(m2, bh, D: int):
    rows, f = m2.shape
    n = rows // (D * D)
    c = C_NODES
    return pl.pallas_call(
        functools.partial(_pair_kernel, D=D),
        grid=(n // c,),
        in_specs=[
            pl.BlockSpec((c * D * D, f), lambda i: (i, 0)),
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((c * D, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n * D, f), bh.dtype),
        compiler_params=_compiler_params(),
        interpret=jax.default_backend() == "cpu",
    )(m2, bh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dense_pair_aggregate(m2, bh, D: int, use_pallas: bool = True):
    """h[j,t] = sum_s sigma(m2[j,t,s]) * bh[j,s] / (sum_s sigma + eps).

    m2: [N*D*D, F] rows (j, t, s) with s fastest, mask pre-folded
    (see fold_mask); bh: [N*D, F] rows (j, s).  Returns [N*D, F] rows
    (j, t) — the L(g)-node update for edge b = rev[j*D+t] (callers
    apply the rev permutation).
    """
    n = bh.shape[0] // D
    tile_bytes = C_NODES * D * D * m2.shape[-1] * 4 * 6
    if use_pallas and n % C_NODES == 0 and m2.shape[-1] % 128 == 0 \
            and tile_bytes <= _VMEM_BUDGET:
        return _pallas_pair_aggregate(m2, bh, D)
    return _xla_pair_aggregate(m2, bh, D)


def _pair_fwd(m2, bh, D, use_pallas):
    h = dense_pair_aggregate(m2, bh, D, use_pallas)
    from alignn_tpu.ops.fp8 import fp8_ltables_enabled, fp8_round_trip

    if fp8_ltables_enabled():
        # store the dominant [L, F] residual through an e4m3 round trip
        # (VERDICT r3 #2 A/B): the f8 payload is the only real data
        # dependency of the saved value, so XLA materializes 1 B/elem
        # + per-row scales instead of the bf16 table.  Straight-through
        # gradient keeps the residual a differentiable function of the
        # primals (grad-of-grad invariant).
        return h, (fp8_round_trip(m2), bh)
    return h, (m2, bh)


def _pair_bwd(D, use_pallas, res, g):
    """Routes through pair_aggregate_bwd — a first-class op so the
    outer E/F/S gradient differentiates it via the hand-derived
    second-order rule instead of autodiff's mechanical transpose
    (+3.6% full-step, BENCH_NOTES round 3 "pair backward as a
    first-class op")."""
    m2, bh = res
    dm2, dbh = pair_aggregate_bwd(m2, bh, g, D, use_pallas)
    return dm2, dbh


dense_pair_aggregate.defvjp(_pair_fwd, _pair_bwd)


# ---------------------------------------------------------------------------
# pair-aggregation BACKWARD as a first-class op (+ its own VJP)
#
# The force/stress training step runs the aggregation backward inside
# the forward (forces = -dE/dr) and the outer gradient differentiates
# through it, so the backward's own structure is the hot path (64% of
# the step is the outer grad — BENCH_NOTES "Step decomposition").
# Making the backward a first-class custom-vjp op lets us replace
# autodiff's mechanical transpose of the broadcast/reduce algebra with
# the HAND-DERIVED second-order rule below, which shares the row
# reductions (A, Bq, C) across the three cotangents in one fused
# formula.  Measured on device (BENCH_NOTES round 3 "pair backward as
# a first-class op"): the hand-derived XLA rule is **+3.6%** on the
# full b64 train step (1.80M vs 1.74M edges/s) — the new default.
#
# The Pallas twins (_pallas_pair_bwd / _pallas_pair_bwd2, opt-in via
# ALIGNN_TPU_PAIR_BWD_KERNEL=1) keep the [rows, D, F] intermediates in
# VMEM but measured **-10%** vs the XLA rule (1.62M): the custom-call
# boundary forces dm2/cm2 to materialize where XLA would have fused
# them into the consuming matmul VJPs — same mechanism as the fused
# L-stage post-mortem.  Kept honest-negative, tested in interpret mode.
#
# Both orders are pinned against jax.vjp of the XLA reference in
# tests/test_dense.py::test_pair_bwd_first_class_pin.
# ---------------------------------------------------------------------------


def _xla_pair_bwd(m2, bh, g, D: int):
    """Reference first-order backward (recomputes den/h from primals)."""
    f = m2.shape[-1]
    n = bh.shape[0] // D
    sig = jax.nn.sigmoid(m2.astype(jnp.float32)).reshape(n, D, D, f)
    bh4 = bh.astype(jnp.float32).reshape(n, 1, D, f)
    den = sig.sum(axis=2) + EPS                        # [n, t, F]
    h = (sig * bh4).sum(axis=2) / den                  # [n, t, F]
    g32 = g.astype(jnp.float32).reshape(n, D, f)
    ginv = (g32 / den)[:, :, None, :]                  # [n, t, 1, F]
    gh = (-g32 * h / den)[:, :, None, :]
    dsig = bh4 * ginv + gh
    dm2 = (sig * (1.0 - sig) * dsig).reshape(-1, f).astype(m2.dtype)
    dbh = (sig * ginv).sum(axis=1).reshape(-1, f).astype(bh.dtype)
    return dm2, dbh


def _pair_bwd_kernel(m2_ref, bh_ref, g_ref, dm2_ref, ginv_ref, *, D: int):
    # dm2_ref is a 3-D [(j,t), s, F] ref — per-s slice writes mirror the
    # proven per-s slice READS of _pair_kernel (a [rows, D, F] ->
    # [rows*D, F] vector reshape inside the kernel trips Mosaic's
    # reduction/relayout rules; the 3-D ref sidesteps them).  The small
    # t-reductions (dbh) happen OUTSIDE in XLA, seeded by the ginv
    # output, where they fuse into one pass over m2.
    f = bh_ref.shape[-1]
    rows = bh_ref.shape[0]              # c*D rows (j, t)
    c = rows // D
    m2 = m2_ref[:].reshape(rows, D, f)  # [(j,t), s, F] bf16/f32
    bh = bh_ref[:].reshape(c, D, f)
    den = jnp.full((rows, f), EPS, jnp.float32)
    num = jnp.zeros((rows, f), jnp.float32)
    for s in range(D):
        sig = jax.nn.sigmoid(m2[:, s, :].astype(jnp.float32))
        bh_s = jnp.broadcast_to(
            bh[:, s, :].astype(jnp.float32)[:, None, :],
            (c, D, f)).reshape(rows, f)
        num = num + sig * bh_s
        den = den + sig
    g32 = g_ref[:].astype(jnp.float32)                 # rows (j, t)
    ginv = g32 / den
    gh = -g32 * (num / den) / den
    ginv_ref[:] = ginv.astype(ginv_ref.dtype)
    for s in range(D):
        sig = jax.nn.sigmoid(m2[:, s, :].astype(jnp.float32))
        bh_s = jnp.broadcast_to(
            bh[:, s, :].astype(jnp.float32)[:, None, :],
            (c, D, f)).reshape(rows, f)
        dm2_ref[:, s, :] = (sig * (1.0 - sig)
                            * (bh_s * ginv + gh)).astype(dm2_ref.dtype)


def _pallas_pair_bwd(m2, bh, g, D: int):
    rows, f = m2.shape
    n = rows // (D * D)
    c = C_NODES
    dm2_3d, ginv = pl.pallas_call(
        functools.partial(_pair_bwd_kernel, D=D),
        grid=(n // c,),
        in_specs=[
            pl.BlockSpec((c * D * D, f), lambda i: (i, 0)),
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((c * D, D, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n * D, D, f), m2.dtype),
            jax.ShapeDtypeStruct((n * D, f), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=jax.default_backend() == "cpu",
    )(m2, bh, g)
    dm2 = dm2_3d.reshape(rows, f)
    # dbh[j,s] = sum_t sig[(j,t),s] * ginv[(j,t)] — a single fused
    # XLA pass over m2 (sigmoid has one consumer here)
    dbh = (jax.nn.sigmoid(m2.astype(jnp.float32)).reshape(n, D, D, f)
           * ginv.reshape(n, D, 1, f)).sum(axis=1)
    return dm2, dbh.reshape(-1, f).astype(bh.dtype)


def _pair_fits(m2, bh, D, use_pallas):
    # The Pallas backward twins are OPT-IN (measured -10% vs the
    # hand-derived XLA rule on the full train step — see the section
    # comment above); flip on with ALIGNN_TPU_PAIR_BWD_KERNEL=1.
    import os

    if os.environ.get("ALIGNN_TPU_PAIR_BWD_KERNEL", "") in ("", "0"):
        return False
    n = bh.shape[0] // D
    tile_bytes = C_NODES * D * D * m2.shape[-1] * 4 * 6
    return (use_pallas and n % C_NODES == 0
            and m2.shape[-1] % 128 == 0 and tile_bytes <= _VMEM_BUDGET)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pair_aggregate_bwd(m2, bh, g, D: int, use_pallas: bool = True):
    """(dm2, dbh) = VJP of dense_pair_aggregate at (m2, bh) with
    cotangent g — a first-class op because force training executes it
    in the forward pass.  Differentiable once more (the outer E/F/S
    gradient) via the hand-derived second-order rule below."""
    if _pair_fits(m2, bh, D, use_pallas):
        return _pallas_pair_bwd(m2, bh, g, D)
    return _xla_pair_bwd(m2, bh, g, D)


def _xla_pair_bwd2(m2, bh, g, u, v, D: int):
    """Hand-derived VJP of (m2, bh, g) -> (dm2, dbh) with cotangents
    (u, v); pinned against jax.vjp(_xla_pair_bwd) in tests.

    With sig' = sig(1-sig), sig'' = sig'(1-2 sig), den_t = sum_s sig +
    eps, h_t = num_t/den_t, ginv_t = g_t/den_t, gh_t = -g_t h_t/den_t,
    and row reductions A_t = sum_s u sig', Bq_t = sum_s u sig' bh_s,
    C_t = sum_s v_s sig:

    and k_t = -g_t/den_t^2:

      c_g_t   = (Bq_t - h_t A_t + C_t) / den_t
      c_bh_s  = sum_t [ u sig' ginv_t + sig k_t A_t ]
                (the second term is gh's dependence on bh through num)
      c_m2_ts = u sig'' (bh_s ginv_t + gh_t)
                + sig' [ k_t (Bq_t - 2 h_t A_t + bh_s A_t + C_t)
                         + v_s ginv_t ]
    """
    f = m2.shape[-1]
    n = bh.shape[0] // D
    sig = jax.nn.sigmoid(m2.astype(jnp.float32)).reshape(n, D, D, f)
    sigp = sig * (1.0 - sig)
    sigpp = sigp * (1.0 - 2.0 * sig)
    bh4 = bh.astype(jnp.float32).reshape(n, 1, D, f)
    u4 = u.astype(jnp.float32).reshape(n, D, D, f)
    v4 = v.astype(jnp.float32).reshape(n, 1, D, f)
    den = sig.sum(axis=2) + EPS                        # [n, t, F]
    h = (sig * bh4).sum(axis=2) / den
    g32 = g.astype(jnp.float32).reshape(n, D, f)
    ginv = g32 / den
    gh = -g32 * h / den
    a = (u4 * sigp).sum(axis=2)                        # [n, t, F]
    bq = (u4 * sigp * bh4).sum(axis=2)
    cc = (v4 * sig).sum(axis=2)
    c_g = ((bq - h * a + cc) / den).reshape(-1, f).astype(g.dtype)
    k = -g32 / (den * den)                             # [n, t, F]
    c_bh = (u4 * sigp * ginv[:, :, None, :]
            + sig * (k * a)[:, :, None, :]).sum(axis=1) \
        .reshape(-1, f).astype(bh.dtype)
    c_m2 = (u4 * sigpp * (bh4 * ginv[:, :, None, :] + gh[:, :, None, :])
            + sigp * (k[:, :, None, :]
                      * ((bq - 2.0 * h * a + cc)[:, :, None, :]
                         + bh4 * a[:, :, None, :])
                      + v4 * ginv[:, :, None, :]))
    c_m2 = c_m2.reshape(-1, f).astype(m2.dtype)
    return c_m2, c_bh, c_g


def _pair_bwd2_kernel(m2_ref, bh_ref, g_ref, u_ref, v_ref,
                      cm2_ref, cg_ref, ginv_ref, ka_ref, *, D: int):
    # cm2_ref is 3-D (see _pair_bwd_kernel); cbh's t-reduction happens
    # outside in XLA, seeded by the (ginv, k*a) row outputs.
    f = bh_ref.shape[-1]
    rows = bh_ref.shape[0]              # c*D rows (j, t)
    c = rows // D
    m2 = m2_ref[:].reshape(rows, D, f)
    u = u_ref[:].reshape(rows, D, f)
    bh = bh_ref[:].reshape(c, D, f)
    v = v_ref[:].reshape(c, D, f)
    den = jnp.full((rows, f), EPS, jnp.float32)
    num = jnp.zeros((rows, f), jnp.float32)
    a = jnp.zeros((rows, f), jnp.float32)
    bq = jnp.zeros((rows, f), jnp.float32)
    cc = jnp.zeros((rows, f), jnp.float32)
    for s in range(D):
        sig = jax.nn.sigmoid(m2[:, s, :].astype(jnp.float32))
        sigp = sig * (1.0 - sig)
        u_s = u[:, s, :].astype(jnp.float32)
        bh_s = jnp.broadcast_to(
            bh[:, s, :].astype(jnp.float32)[:, None, :],
            (c, D, f)).reshape(rows, f)
        v_s = jnp.broadcast_to(
            v[:, s, :].astype(jnp.float32)[:, None, :],
            (c, D, f)).reshape(rows, f)
        den = den + sig
        num = num + sig * bh_s
        a = a + u_s * sigp
        bq = bq + u_s * sigp * bh_s
        cc = cc + v_s * sig
    g32 = g_ref[:].astype(jnp.float32)
    h = num / den
    ginv = g32 / den
    gh = -g32 * h / den
    k = -g32 / (den * den)
    cg_ref[:] = ((bq - h * a + cc) / den).astype(cg_ref.dtype)
    ginv_ref[:] = ginv.astype(ginv_ref.dtype)
    ka_ref[:] = (k * a).astype(ka_ref.dtype)
    kterm = bq - 2.0 * h * a + cc
    for s in range(D):
        sig = jax.nn.sigmoid(m2[:, s, :].astype(jnp.float32))
        sigp = sig * (1.0 - sig)
        sigpp = sigp * (1.0 - 2.0 * sig)
        u_s = u[:, s, :].astype(jnp.float32)
        bh_s = jnp.broadcast_to(
            bh[:, s, :].astype(jnp.float32)[:, None, :],
            (c, D, f)).reshape(rows, f)
        v_s = jnp.broadcast_to(
            v[:, s, :].astype(jnp.float32)[:, None, :],
            (c, D, f)).reshape(rows, f)
        cm2_ref[:, s, :] = (u_s * sigpp * (bh_s * ginv + gh)
                            + sigp * (k * (kterm + bh_s * a)
                                      + v_s * ginv)).astype(cm2_ref.dtype)


def _pallas_pair_bwd2(m2, bh, g, u, v, D: int):
    rows, f = m2.shape
    n = rows // (D * D)
    c = C_NODES
    cm2_3d, cg, ginv, ka = pl.pallas_call(
        functools.partial(_pair_bwd2_kernel, D=D),
        grid=(n // c,),
        in_specs=[
            pl.BlockSpec((c * D * D, f), lambda i: (i, 0)),
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),
            pl.BlockSpec((c * D * D, f), lambda i: (i, 0)),
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((c * D, D, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n * D, D, f), m2.dtype),
            jax.ShapeDtypeStruct((n * D, f), g.dtype),
            jax.ShapeDtypeStruct((n * D, f), jnp.float32),
            jax.ShapeDtypeStruct((n * D, f), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=jax.default_backend() == "cpu",
    )(m2, bh, g, u, v)
    cm2 = cm2_3d.reshape(rows, f)
    # c_bh[s] = sum_t [u sig' ginv + sig k a] — one fused XLA pass over
    # (m2, u) seeded by the kernel's ginv / k*a rows
    sig = jax.nn.sigmoid(m2.astype(jnp.float32)).reshape(n, D, D, f)
    u4 = u.astype(jnp.float32).reshape(n, D, D, f)
    cbh = (u4 * (sig * (1.0 - sig)) * ginv.reshape(n, D, 1, f)
           + sig * ka.reshape(n, D, 1, f)).sum(axis=1)
    return cm2, cbh.reshape(-1, f).astype(bh.dtype), cg


def _pair_bwd_fwd(m2, bh, g, D, use_pallas):
    out = pair_aggregate_bwd(m2, bh, g, D, use_pallas)
    return out, (m2, bh, g)


def _pair_bwd_bwd(D, use_pallas, res, cot):
    m2, bh, g = res
    u, v = cot
    if _pair_fits(m2, bh, D, use_pallas):
        return _pallas_pair_bwd2(m2, bh, g, u, v, D)
    return _xla_pair_bwd2(m2, bh, g, u, v, D)


pair_aggregate_bwd.defvjp(_pair_bwd_fwd, _pair_bwd_bwd)
