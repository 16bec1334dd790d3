"""Fully-fused dense L-stage: matmul + gates + aggregate + norm in one pass.

In the dense-neighborhood layout (graph/dense.py) the L(g) stage of an
ALIGNN layer is, per node j with in-edges s, t < D:

    eg        = z @ W_eg + b_eg                  # [N*D^2, F] matmul
    m2[j,t,s] = sg_f[j,s] + dg_f[j,t] + eg[j,t,s]
    sig       = sigmoid(m2)
    h[j,t]    = sum_s sig[j,t,s] * bh[j,s] / (sum_s sig + 1e-6)
    e_new     = z + silu(layernorm(m2))          # the next layer's z

The L-sized ([N*D^2, F]) tensors dominate the train step's HBM traffic:
executed as separate XLA fusions + the pair kernel, each layer's
forward reads z twice and round-trips m2 three times (write + read by
the aggregation + read by the norm) — six L-sized HBM passes.  This
kernel computes the whole chain per node-block with m2 living only in
VMEM: one z read, one e_new write — two passes.  The edge_gate matmul
rides the MXU inside the kernel (bf16 operands, f32 accumulation).

Masking contract: callers fold the EDGE mask additively into BOTH gate
operands (sg_f = src_gate + (em-1)*1e9, dg_f likewise, see
pallas_dense.fold_mask) — the pair (t, s) is masked iff either side is,
and sigmoid(-1e9) == 0 removes it from numerator, denominator, and all
gradients exactly.  Masked rows of e_new carry harmless garbage (their
layernorm is finite); they are isolated by masks downstream exactly as
in the unfused path.

The custom VJP recomputes m2 in XLA from the primals — pure
matmul/broadcast/reduce algebra, so every derivative order (grad-of-grad
force training) stays scatter-free without custom-rule recursion.

Replaces the reference's L(g) update_all + norm chain
(alignn/models/alignn_atomwise.py:157-208 via models/alignn.py:132-167)
for dense batches with layernorm and residual (the ALIGNNAtomWise
configuration); other flavors use the unfused path in nn/layers.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6        # aggregation denominator (reference parity)
LN_EPS = 1e-5     # torch nn.LayerNorm default (MaskedLayerNorm parity)

# VMEM-resident per-tile f32 bytes ~ c*D^2*F*(z + eg + e_stack) + slack;
# cap the tile choice so D from radius graphs cannot blow VMEM (the
# pallas_call requests a raised scoped-vmem limit — v5e has 128 MB
# physical VMEM; Mosaic's default scoped cap is only 16 MB).
_VMEM_BUDGET = 24 * 2 ** 20
_VMEM_LIMIT = 100 * 2 ** 20


def _pick_c(n: int, D: int, f: int, bytes_per_elem: int = 14) -> int:
    import os

    override = os.environ.get("ALIGNN_TPU_FUSED_C")  # perf experiments
    cands = (int(override),) if override else (8, 4, 2, 1)
    for c in cands:
        # Mosaic block rule: last-2 dims divisible by (8, 128) — both
        # the [c*D*D, F] and [c*D, F] blocks must satisfy it
        if (c * D * D) % 8 or (c * D) % 8:
            continue
        if n % c == 0 and (override
                           or c * D * D * f * bytes_per_elem
                           <= _VMEM_BUDGET):
            return c
    return 0


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _xla_fused(z, w, b, sg_f, dg_f, bh, scale, bias, D: int):
    """Reference composition (CPU / ineligible shapes), f32 compute."""
    f = z.shape[-1]
    n = sg_f.shape[0] // D
    f32 = jnp.float32
    eg = jnp.dot(z, w.astype(z.dtype), preferred_element_type=f32) \
        + b.astype(f32)
    m2 = (eg.reshape(n, D, D, f)
          + sg_f.astype(f32).reshape(n, 1, D, f)
          + dg_f.astype(f32).reshape(n, D, 1, f))
    sig = jax.nn.sigmoid(m2)
    bh4 = bh.astype(f32).reshape(n, 1, D, f)
    num = (sig * bh4).sum(axis=2)
    den = sig.sum(axis=2)
    h = (num / (den + EPS)).reshape(n * D, f).astype(bh.dtype)
    m2r = m2.reshape(-1, f)
    mean = m2r.mean(axis=-1, keepdims=True)
    var = ((m2r - mean) ** 2).mean(axis=-1, keepdims=True)
    ln = (m2r - mean) * jax.lax.rsqrt(var + LN_EPS) * scale.astype(f32) \
        + bias.astype(f32)
    e_new = (z.astype(f32) + _silu(ln)).astype(z.dtype)
    return e_new, h


def _kernel(z_ref, w_ref, b_ref, sg_ref, dg_ref, bh_ref, sc_ref, bi_ref,
            e_ref, h_ref, *, D: int):
    # loop-free full-tile algebra (the per-s unrolled variant issued
    # tiny [c*D, F] vector ops and measured 1.8x SLOWER than unfused;
    # with the raised scoped-vmem limit the clean 4-D form fits).  The
    # s-axis reductions use the (rows, D, F).sum(axis=1) 3-D form that
    # the committed pallas_dense kernels already run on device.
    f = h_ref.shape[-1]
    rows = bh_ref.shape[0]                    # c*D rows (j, t)
    c = rows // D
    f32 = jnp.float32
    zt = z_ref[:]                             # [c*D*D, F] model dtype
    # MXU: bf16 x bf16 -> f32 accumulation
    eg = jnp.dot(zt, w_ref[:], preferred_element_type=f32) \
        + b_ref[:].astype(f32)                # [c*D*D, F]
    m2 = (eg.reshape(c, D, D, f)
          + sg_ref[:].astype(f32).reshape(c, 1, D, f)
          + dg_ref[:].astype(f32).reshape(c, D, 1, f))   # [c, t, s, F]
    sig = jax.nn.sigmoid(m2)
    bh4 = bh_ref[:].astype(f32).reshape(c, 1, D, f)
    num = (sig * bh4).reshape(rows, D, f).sum(axis=1)
    den = sig.reshape(rows, D, f).sum(axis=1)
    h_ref[:] = (num / (den + EPS)).astype(h_ref.dtype)
    m2r = m2.reshape(rows * D, f)
    mean = jnp.mean(m2r, axis=-1, keepdims=True)
    var = jnp.mean((m2r - mean) ** 2, axis=-1, keepdims=True)
    ln = (m2r - mean) * jax.lax.rsqrt(var + LN_EPS) \
        * sc_ref[:].astype(f32) + bi_ref[:].astype(f32)
    e_ref[:] = (zt.astype(f32) + _silu(ln)).astype(e_ref.dtype)


def _pallas_fused(z, w, b, sg_f, dg_f, bh, scale, bias, D: int, c: int):
    rows, f = z.shape
    n = sg_f.shape[0] // D
    w2 = w.astype(z.dtype)
    b2 = b.reshape(1, f)
    sc2 = scale.reshape(1, f)
    bi2 = bias.reshape(1, f)
    return pl.pallas_call(
        functools.partial(_kernel, D=D),
        grid=(n // c,),
        in_specs=[
            pl.BlockSpec((c * D * D, f), lambda i: (i, 0)),   # z
            pl.BlockSpec((f, f), lambda i: (0, 0)),           # w
            pl.BlockSpec((1, f), lambda i: (0, 0)),           # b
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),       # sg_f
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),       # dg_f
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),       # bh
            pl.BlockSpec((1, f), lambda i: (0, 0)),           # scale
            pl.BlockSpec((1, f), lambda i: (0, 0)),           # bias
        ],
        out_specs=[
            pl.BlockSpec((c * D * D, f), lambda i: (i, 0)),   # e_new
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),       # h
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, f), z.dtype),
            jax.ShapeDtypeStruct((n * D, f), bh.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(z, w2, b2, sg_f, dg_f, bh, sc2, bi2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_pair_lstage(z, w, b, sg_f, dg_f, bh, scale, bias,
                      D: int, use_pallas: bool = True):
    """(e_new, h_jt) for the dense L-stage (module docstring math).

    z: [N*D*D, F] L-edge features, rows (j, t, s) with s fastest;
    w, b: edge_gate Dense params; sg_f/dg_f/bh: [N*D, F] gate tables,
    masks pre-folded into sg_f and dg_f; scale, bias: layernorm params.
    Returns e_new [N*D*D, F] (= z + silu(ln(m2))) and h_jt [N*D, F]
    rows (j, t) — callers apply the rev permutation to h_jt.
    """
    f = z.shape[-1]
    n = sg_f.shape[0] // D
    c = _pick_c(n, D, f)
    if use_pallas and c and f % 128 == 0:
        return _pallas_fused(z, w, b, sg_f, dg_f, bh, scale, bias, D, c)
    return _xla_fused(z, w, b, sg_f, dg_f, bh, scale, bias, D)


def _fwd(z, w, b, sg_f, dg_f, bh, scale, bias, D, use_pallas):
    out = fused_pair_lstage(z, w, b, sg_f, dg_f, bh, scale, bias,
                            D, use_pallas)
    return out, (z, w, b, sg_f, dg_f, bh, scale, bias)


def _bwd(D, use_pallas, res, cts):
    """First-order backward: dispatches to the fused backward kernel.

    `_bwd_op` is itself a custom-vjp function whose backward is
    jax.vjp of the XLA recompute body — the custom-rule recursion that
    keeps grad-of-grad force training off the kernel body (and
    scatter-free: every transpose in the body is a broadcast,
    reduction, or matmul).
    """
    import os

    z, w, b, sg_f, dg_f, bh, scale, bias = res
    de, dh = cts
    kernel_bwd = use_pallas and not os.environ.get(
        "ALIGNN_TPU_DISABLE_FUSED_BWD")
    return _bwd_op(z, w, b, sg_f, dg_f, bh, scale, bias, de, dh,
                   D, kernel_bwd)


fused_pair_lstage.defvjp(_fwd, _bwd)


def _bwd_body(z, w, b, sg_f, dg_f, bh, scale, bias, de, dh, D):
    """XLA recompute backward: matmul/broadcast/reduce only.

    m2 is recomputed from the primals (residuals must stay
    differentiable functions of the primals — the E/F/S train step
    differentiates this body for grad-of-grad force training, and every
    transpose here is a broadcast, reduction, or matmul: scatter-free
    at all orders).
    """
    f = z.shape[-1]
    n = sg_f.shape[0] // D
    f32 = jnp.float32
    eg = jnp.dot(z, w.astype(z.dtype), preferred_element_type=f32) \
        + b.astype(f32)
    m2 = (eg.reshape(n, D, D, f)
          + sg_f.astype(f32).reshape(n, 1, D, f)
          + dg_f.astype(f32).reshape(n, D, 1, f))    # [n, t, s, F]
    sig = jax.nn.sigmoid(m2)
    bh4 = bh.astype(f32).reshape(n, 1, D, f)
    den = sig.sum(axis=2) + EPS                       # [n, t, F]
    num = (sig * bh4).sum(axis=2)
    h = num / den
    # aggregation cotangents
    dh32 = dh.astype(f32).reshape(n, D, f)
    ginv = (dh32 / den)[:, :, None, :]                # [n, t, 1, F]
    gh = (-dh32 * h / den)[:, :, None, :]
    dsig = bh4 * ginv + gh
    dm2_agg = sig * (1.0 - sig) * dsig                # [n, t, s, F]
    dbh = (sig * ginv).sum(axis=1).reshape(-1, f).astype(bh.dtype)
    # norm + silu + residual cotangents
    m2r = m2.reshape(-1, f)
    mean = m2r.mean(axis=-1, keepdims=True)
    var = ((m2r - mean) ** 2).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (m2r - mean) * rstd
    ln = xhat * scale.astype(f32) + bias.astype(f32)
    sig_ln = jax.nn.sigmoid(ln)
    de32 = de.astype(f32)
    dz = de                                            # residual branch
    dln = de32 * (sig_ln * (1.0 + ln * (1.0 - sig_ln)))
    dscale = (dln * xhat).sum(axis=0).astype(scale.dtype)
    dbias = dln.sum(axis=0).astype(bias.dtype)
    dxhat = dln * scale.astype(f32)
    dm2_norm = rstd / f * (f * dxhat
                           - dxhat.sum(axis=-1, keepdims=True)
                           - xhat * (dxhat * xhat).sum(axis=-1,
                                                       keepdims=True))
    dm2 = dm2_agg.reshape(-1, f) + dm2_norm            # [N*D*D, F] f32
    # the two L-sized matmuls ride the model dtype (bf16 in the bench
    # config): halves their HBM traffic and matches the unfused path's
    # cotangent precision (dm2 was a bf16 activation cotangent there)
    dm2_c = dm2.astype(z.dtype)
    dz = (dz.astype(f32)
          + jnp.dot(dm2_c, w.astype(z.dtype).T,
                    preferred_element_type=f32)).astype(z.dtype)
    dw = jnp.dot(z.T, dm2_c, preferred_element_type=f32).astype(w.dtype)
    db = dm2.sum(axis=0).astype(b.dtype)
    dm4 = dm2.reshape(n, D, D, f)
    dsg = dm4.sum(axis=1).reshape(-1, f).astype(sg_f.dtype)
    ddg = dm4.sum(axis=2).reshape(-1, f).astype(dg_f.dtype)
    return dz, dw, db, dsg, ddg, dbh, dscale, dbias


# ---------------------------------------------------------------------------
# fused backward kernel (first order): one pass over z/de, m2 and dm2
# live only in VMEM; dw/db/dscale/dbias accumulate across grid steps
# ---------------------------------------------------------------------------

# per-element VMEM footprint of the backward tile, used to bound the
# tile choice.  Calibrated against Mosaic's scoped-vmem accounting on
# device (c=8/D=13/F=256 with stashed slices hit 26.7 MB; the recompute
# version at the same shape fits under the raised scoped-vmem limit)
_VMEM_BYTES_PER_ELEM_BWD = 40


def _pick_c_bwd(n: int, D: int, f: int) -> int:
    return _pick_c(n, D, f, _VMEM_BYTES_PER_ELEM_BWD)


def _bwd_kernel(z_ref, de_ref, dh_ref, sg_ref, dg_ref, bh_ref,
                w_ref, wt_ref, b_ref, sc_ref, bi_ref,
                dz_ref, dsg_ref, ddg_ref, dbh_ref,
                dw_ref, db_ref, dsc_ref, dbi_ref, *, D: int):
    f = dh_ref.shape[-1]
    rows = dh_ref.shape[0]                    # c*D rows (j, t)
    c = rows // D
    f32 = jnp.float32
    zt = z_ref[:]                             # [cDD, F] model dtype
    eg = jnp.dot(zt, w_ref[:], preferred_element_type=f32) \
        + b_ref[:].astype(f32)
    m2 = (eg.reshape(c, D, D, f)
          + sg_ref[:].astype(f32).reshape(c, 1, D, f)
          + dg_ref[:].astype(f32).reshape(c, D, 1, f))   # [c, t, s, F]
    sig = jax.nn.sigmoid(m2)
    bh4 = bh_ref[:].astype(f32).reshape(c, 1, D, f)
    # s-axis reductions in the (rows, D, F) 3-D form (device-proven);
    # t-axis reductions in the (c*D_t <- regrouped) form below
    num = (sig * bh4).reshape(rows, D, f).sum(axis=1)    # [rows(j,t), F]
    den = sig.reshape(rows, D, f).sum(axis=1) + EPS
    h = num / den
    dh32 = dh_ref[:].astype(f32)
    ginv = dh32 / den                                    # [rows(j,t), F]
    gh = -dh32 * h / den
    dsig = bh4 * ginv.reshape(c, D, 1, f) + gh.reshape(c, D, 1, f)
    dm2_agg = sig * (1.0 - sig) * dsig                   # [c, t, s, F]
    # dbh[j,s] = sum_t sig*ginv: regroup so the summed axis (t) is the
    # middle of a 3-D view with lanes D*F (a 128-multiple when F is)
    sgv = (sig * ginv.reshape(c, D, 1, f)).reshape(c, D, D * f)
    dbh_ref[:] = sgv.sum(axis=1).reshape(rows, f).astype(dbh_ref.dtype)
    # layernorm + silu + residual backward on the flat [rows*D, F] view
    m2r = m2.reshape(rows * D, f)
    mean = jnp.mean(m2r, axis=-1, keepdims=True)
    var = jnp.mean((m2r - mean) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (m2r - mean) * rstd
    sc = sc_ref[:].astype(f32)
    ln = xhat * sc + bi_ref[:].astype(f32)
    sl = jax.nn.sigmoid(ln)
    de32 = de_ref[:].astype(f32)
    dln = de32 * (sl * (1.0 + ln * (1.0 - sl)))
    dxhat = dln * sc
    dm2_norm = rstd / f * (f * dxhat
                           - dxhat.sum(axis=-1, keepdims=True)
                           - xhat * (dxhat * xhat).sum(axis=-1,
                                                       keepdims=True))
    dm2 = dm2_agg.reshape(rows * D, f) + dm2_norm        # [c*D*D, F] f32
    dm2_c = dm2.astype(zt.dtype)
    dz_ref[:] = (de32
                 + jnp.dot(dm2_c, wt_ref[:], preferred_element_type=f32)
                 ).astype(dz_ref.dtype)
    # dsg[j,s] = sum_t dm2: same t-middle regroup; ddg[j,t] = sum_s dm2
    dsg_ref[:] = dm2.reshape(c, D, D * f).sum(axis=1).reshape(
        rows, f).astype(dsg_ref.dtype)
    ddg_ref[:] = dm2.reshape(rows, D, f).sum(axis=1).astype(
        ddg_ref.dtype)
    # parameter grads accumulate across the sequential grid; row
    # reductions ride the MXU (ones-vector / zt contractions) -- Mosaic
    # rejects axis-0 multi_reductions on offset-layout values
    dw_t = jax.lax.dot_general(zt, dm2_c, (((0,), (0,)), ((), ())),
                               preferred_element_type=f32)
    ones_r = jnp.ones((1, rows * D), f32)
    dims = (((1,), (0,)), ((), ()))
    db_t = jax.lax.dot_general(ones_r, dm2, dims,
                               preferred_element_type=f32)
    dsc_t = jax.lax.dot_general(ones_r, dln * xhat, dims,
                                preferred_element_type=f32)
    dbi_t = jax.lax.dot_general(ones_r, dln, dims,
                                preferred_element_type=f32)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dsc_ref[:] = jnp.zeros_like(dsc_ref)
        dbi_ref[:] = jnp.zeros_like(dbi_ref)

    dw_ref[:] += dw_t
    db_ref[:] += db_t
    dsc_ref[:] += dsc_t
    dbi_ref[:] += dbi_t


def _pallas_bwd(z, w, b, sg_f, dg_f, bh, scale, bias, de, dh,
                D: int, c: int):
    rows, f = z.shape
    n = sg_f.shape[0] // D
    w2 = w.astype(z.dtype)
    wt2 = w2.T
    b2 = b.reshape(1, f)
    sc2 = scale.reshape(1, f)
    bi2 = bias.reshape(1, f)
    dz, dsg, ddg, dbh, dw, db, dsc, dbi = pl.pallas_call(
        functools.partial(_bwd_kernel, D=D),
        grid=(n // c,),
        in_specs=[
            pl.BlockSpec((c * D * D, f), lambda i: (i, 0)),   # z
            pl.BlockSpec((c * D * D, f), lambda i: (i, 0)),   # de
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),       # dh
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),       # sg_f
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),       # dg_f
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),       # bh
            pl.BlockSpec((f, f), lambda i: (0, 0)),           # w
            pl.BlockSpec((f, f), lambda i: (0, 0)),           # w.T
            pl.BlockSpec((1, f), lambda i: (0, 0)),           # b
            pl.BlockSpec((1, f), lambda i: (0, 0)),           # scale
            pl.BlockSpec((1, f), lambda i: (0, 0)),           # bias
        ],
        out_specs=[
            pl.BlockSpec((c * D * D, f), lambda i: (i, 0)),   # dz
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),       # dsg
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),       # ddg
            pl.BlockSpec((c * D, f), lambda i: (i, 0)),       # dbh
            pl.BlockSpec((f, f), lambda i: (0, 0)),           # dw accum
            pl.BlockSpec((1, f), lambda i: (0, 0)),           # db accum
            pl.BlockSpec((1, f), lambda i: (0, 0)),           # dscale
            pl.BlockSpec((1, f), lambda i: (0, 0)),           # dbias
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, f), z.dtype),
            jax.ShapeDtypeStruct((n * D, f), sg_f.dtype),
            jax.ShapeDtypeStruct((n * D, f), dg_f.dtype),
            jax.ShapeDtypeStruct((n * D, f), bh.dtype),
            jax.ShapeDtypeStruct((f, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(z, de, dh, sg_f, dg_f, bh, w2, wt2, b2, sc2, bi2)
    return (dz, dw.astype(w.dtype), db.reshape(f).astype(b.dtype),
            dsg, ddg, dbh, dsc.reshape(f).astype(scale.dtype),
            dbi.reshape(f).astype(bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _bwd_op(z, w, b, sg_f, dg_f, bh, scale, bias, de, dh,
            D: int, use_pallas: bool):
    f = z.shape[-1]
    n = sg_f.shape[0] // D
    c = _pick_c_bwd(n, D, f)
    if use_pallas and c and f % 128 == 0:
        return _pallas_bwd(z, w, b, sg_f, dg_f, bh, scale, bias,
                           de, dh, D, c)
    return _bwd_body(z, w, b, sg_f, dg_f, bh, scale, bias, de, dh, D)


def _bwd_op_fwd(z, w, b, sg_f, dg_f, bh, scale, bias, de, dh,
                D, use_pallas):
    out = _bwd_op(z, w, b, sg_f, dg_f, bh, scale, bias, de, dh,
                  D, use_pallas)
    return out, (z, w, b, sg_f, dg_f, bh, scale, bias, de, dh)


def _bwd_op_bwd(D, use_pallas, res, cts):
    """Second order: jax.vjp of the XLA body (scatter-free algebra)."""
    _, vjp = jax.vjp(lambda *a: _bwd_body(*a, D), *res)
    return vjp(cts)


_bwd_op.defvjp(_bwd_op_fwd, _bwd_op_bwd)
