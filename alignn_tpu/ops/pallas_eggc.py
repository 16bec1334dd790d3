"""Pallas TPU kernel: fused edge-gated segment aggregation.

The EGGC node update
    h_i = (sum_{e: dst(e)=i} sigma(m_e) * bh_e) / (sum sigma(m_e) + eps)
is the framework's hot reduction (replaces DGL's two C++ SpMM
`update_all` calls, reference alignn.py:105-108).  XLA lowers
`segment_sum` to scatter-adds, which serialize on TPU; this kernel
exploits the sorted-by-dst edge layout (established at graph build,
alignn_tpu/graph/build.py) to turn the scatter into dense one-hot
matmuls on the MXU:

- grid over node tiles of TN rows; scalar-prefetched per-tile edge
  offsets delimit each tile's contiguous edge range;
- the kernel DMAs edge chunks (TE rows) of m / bh / dst from HBM into
  VMEM, computes sigma = sigmoid(m) on the VPU, builds the [TE, TN]
  one-hot dst matrix, and accumulates onehot^T @ [sigma*bh | sigma]
  into a VMEM accumulator — one MXU matmul per chunk;
- sigma is never materialized in HBM (saves [E, 2F] of traffic vs the
  unfused pair of reductions).

A custom VJP fuses the backward too: the denominator recompute is a
Pallas sorted-segment-sum (one-hot MXU matmul) and the node->edge
gathers carry a custom transpose that scatters through the same kernel,
so force training (grad-of-grad differentiates the backward) never hits
an XLA serialized scatter at any derivative order.  On non-TPU backends
the public entry points fall back to the XLA segment-sum path.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alignn_tpu.ops.segment import segment_sum

TN = 128   # node rows per tile
TE = 128   # edge rows per chunk
EPS = 1e-6


def _kernel(off_ref, lo_ref, hi_ref,     # scalar prefetch [num_tiles]
            m_hbm, bh_hbm, oh_hbm,       # HBM inputs
            h_ref,                        # VMEM output [TN, F]
            m_buf, bh_buf, oh_buf, acc, sems):
    tile = pl.program_id(0)
    start = off_ref[tile]     # TE-aligned DMA base for this tile
    lo = lo_ref[tile]         # true first edge of the tile's dst range
    hi = hi_ref[tile]         # one past the true last edge
    f = m_buf.shape[2]

    acc[:] = jnp.zeros_like(acc)
    num_chunks = pl.cdiv(hi - start, TE)

    def dmas(k, slot):
        # `start` is TE-aligned (host-side alignment), so every DMA
        # start is provably tile-aligned for Mosaic
        e0 = pl.multiple_of(start + k * TE, TE)
        return (
            pltpu.make_async_copy(
                m_hbm.at[pl.ds(e0, TE), :], m_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                bh_hbm.at[pl.ds(e0, TE), :], bh_buf.at[slot],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                oh_hbm.at[pl.ds(e0, TE), :], oh_buf.at[slot],
                sems.at[slot, 2]),
        )

    @pl.when(num_chunks > 0)
    def _():
        # warmup: first chunk's DMAs; guarded so empty tiles don't leak
        # un-waited semaphore signals into later grid steps
        for cp in dmas(0, 0):
            cp.start()

    def body(k, _):
        slot = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)

        @pl.when(k + 1 < num_chunks)
        def _():
            # double buffering: prefetch chunk k+1 while computing k
            for cp in dmas(k + 1, nxt):
                cp.start()

        for cp in dmas(k, slot):
            cp.wait()
        e0 = start + k * TE
        # row-index masking: the aligned head [start, lo) belongs to the
        # previous tile, rows >= hi to later tiles / padding.
        # Operands stream bf16 (HBM traffic win) but VPU math runs f32 —
        # Mosaic rejects mixed-precision vector ops.
        idx = e0 + jax.lax.broadcasted_iota(jnp.int32, (TE, 1), 0)[:, 0]
        valid = ((idx >= lo) & (idx < hi)).astype(jnp.float32)
        sigma = jax.nn.sigmoid(
            m_buf[slot].astype(jnp.float32)) * valid[:, None]
        packed = jnp.concatenate(
            [sigma * bh_buf[slot].astype(jnp.float32), sigma], axis=1)
        # one-hot dst-within-tile arrives precomputed [TE, TN]; the
        # matmul turns the scatter into an MXU contraction
        acc[:] = acc[:] + jax.lax.dot_general(
            oh_buf[slot].astype(jnp.float32), packed,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, num_chunks, body, 0)
    num = acc[:, :f]
    den = acc[:, f:]
    # NOTE: den is a free by-product, but it cannot be returned as a
    # VJP residual — custom_vjp residuals must be differentiable
    # functions of the primals for the grad-of-grad force training to
    # stay correct, and an aux pallas output has no derivative rule.
    # The backward recomputes den with a differentiable segment_sum.
    h_ref[:] = (num / (den + EPS)).astype(h_ref.dtype)


def _pallas_forward(m: jnp.ndarray, bh: jnp.ndarray, dst: jnp.ndarray,
                    num_nodes: int) -> jnp.ndarray:
    e, f = m.shape
    assert num_nodes % TN == 0, num_nodes
    num_tiles = num_nodes // TN
    # per-tile edge ranges from the sorted dst array (computed in-graph,
    # cheap searchsorted over [E])
    bounds = jnp.searchsorted(
        dst, jnp.arange(0, num_nodes + 1, TN, dtype=dst.dtype))
    lo = bounds[:-1].astype(jnp.int32)
    hi = bounds[1:].astype(jnp.int32)
    # align DMA bases down to the chunk quantum so every slice start is
    # provably TE-aligned (Mosaic tiling requirement); the extra head
    # rows are masked by the [lo, hi) row-index test in the kernel
    offsets = ((lo // TE) * TE).astype(jnp.int32)

    # operands stream in their native dtype (bf16 halves DMA traffic);
    # the MXU accumulator stays f32 via preferred_element_type
    dtype = m.dtype if m.dtype in (jnp.float32, jnp.bfloat16) \
        else jnp.float32
    # one-hot dst-within-tile, precomputed in XLA with feature-array
    # tiling ([E, TN]) — 1-D integer DMAs violate Mosaic lane tiling
    onehot = jax.nn.one_hot(dst % TN, TN, dtype=dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TN, f), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TE, f), dtype),
            pltpu.VMEM((2, TE, f), dtype),
            pltpu.VMEM((2, TE, TN), dtype),
            pltpu.VMEM((TN, 2 * f), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    interpret = jax.default_backend() != "tpu"
    # pad one full chunk so the tail DMA never clamps its start
    # (dynamic_slice start-adjustment would misalign the valid mask)
    m_p = jnp.pad(m.astype(dtype), ((0, TE), (0, 0)))
    bh_p = jnp.pad(bh.astype(dtype), ((0, TE), (0, 0)))
    oh_p = jnp.pad(onehot, ((0, TE), (0, 0)))
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((num_nodes, f), m.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offsets, lo, hi, m_p, bh_p, oh_p)


def _ssum_kernel(off_ref, lo_ref, hi_ref,    # scalar prefetch [num_tiles]
                 x_hbm, oh_hbm,              # HBM inputs
                 out_ref,                     # VMEM output [TN, F]
                 x_buf, oh_buf, acc, sems):
    """Plain sorted segment-sum: acc = onehot^T @ x per node tile.

    Same tile/DMA structure as the fused forward `_kernel` (aligned
    chunk starts, double buffering, row-validity masking) without the
    sigmoid/gating math — used by the fused backward for the denominator
    and as the scatter-transpose of `sorted_gather`.
    """
    tile = pl.program_id(0)
    start = off_ref[tile]
    lo = lo_ref[tile]
    hi = hi_ref[tile]

    acc[:] = jnp.zeros_like(acc)
    num_chunks = pl.cdiv(hi - start, TE)

    def dmas(k, slot):
        e0 = pl.multiple_of(start + k * TE, TE)
        return (
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(e0, TE), :], x_buf.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                oh_hbm.at[pl.ds(e0, TE), :], oh_buf.at[slot],
                sems.at[slot, 1]),
        )

    @pl.when(num_chunks > 0)
    def _():
        for cp in dmas(0, 0):
            cp.start()

    def body(k, _):
        slot = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)

        @pl.when(k + 1 < num_chunks)
        def _():
            for cp in dmas(k + 1, nxt):
                cp.start()

        for cp in dmas(k, slot):
            cp.wait()
        e0 = start + k * TE
        idx = e0 + jax.lax.broadcasted_iota(jnp.int32, (TE, 1), 0)[:, 0]
        valid = ((idx >= lo) & (idx < hi)).astype(jnp.float32)
        rows = x_buf[slot].astype(jnp.float32) * valid[:, None]
        acc[:] = acc[:] + jax.lax.dot_general(
            oh_buf[slot].astype(jnp.float32), rows,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, num_chunks, body, 0)
    out_ref[:] = acc[:].astype(out_ref.dtype)


def _ssum_pallas(x: jnp.ndarray, dst: jnp.ndarray,
                 num_nodes: int) -> jnp.ndarray:
    e, f = x.shape
    assert num_nodes % TN == 0, num_nodes
    num_tiles = num_nodes // TN
    bounds = jnp.searchsorted(
        dst, jnp.arange(0, num_nodes + 1, TN, dtype=dst.dtype))
    lo = bounds[:-1].astype(jnp.int32)
    hi = bounds[1:].astype(jnp.int32)
    offsets = ((lo // TE) * TE).astype(jnp.int32)

    dtype = x.dtype if x.dtype in (jnp.float32, jnp.bfloat16) \
        else jnp.float32
    onehot = jax.nn.one_hot(dst % TN, TN, dtype=dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TN, f), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TE, f), dtype),
            pltpu.VMEM((2, TE, TN), dtype),
            pltpu.VMEM((TN, f), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    interpret = jax.default_backend() != "tpu"
    x_p = jnp.pad(x.astype(dtype), ((0, TE), (0, 0)))
    oh_p = jnp.pad(onehot, ((0, TE), (0, 0)))
    return pl.pallas_call(
        _ssum_kernel,
        out_shape=jax.ShapeDtypeStruct((num_nodes, f), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offsets, lo, hi, x_p, oh_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sorted_segment_sum(x, dst, num_nodes: int, use_pallas: bool = True,
                       window: int = 0):
    """segment_sum over dst-sorted edges; Pallas one-hot MXU matmul.

    The VJP is `sorted_gather` (whose own VJP is this function again), so
    every derivative order of the training objective keeps its scatters
    on the MXU instead of XLA's serialized scatter-add.  `window` (the
    static per-tile span of `dst` from pallas_gather.window_for) routes
    the VJP's gather through the windowed one-hot kernel.
    """
    if use_pallas and num_nodes % TN == 0 and x.shape[-1] % 128 == 0:
        return _ssum_pallas(x, dst, num_nodes)
    return segment_sum(x, dst, num_nodes, indices_are_sorted=True)


def _ssum_fwd(x, dst, num_nodes, use_pallas, window):
    # route through the custom function itself so HIGHER-order
    # differentiation of this fwd body re-enters the custom rules
    # (otherwise grad-of-grad differentiates the raw op and its
    # transpose lowers to an XLA scatter — the round-2 HLO audit
    # caught exactly that)
    return sorted_segment_sum(x, dst, num_nodes, use_pallas, window), dst


def _ssum_bwd(num_nodes, use_pallas, window, dst, g):
    return sorted_gather(g, dst, num_nodes, use_pallas, window), None


sorted_segment_sum.defvjp(_ssum_fwd, _ssum_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sorted_gather(x, dst, num_nodes: int, use_pallas: bool = True,
                  window: int = 0):
    """x[dst] with a Pallas-scatter transpose (see sorted_segment_sum).

    With `window` > 0 (and the Pallas path on) the forward runs the
    windowed one-hot MXU gather — trash-pointing padded rows read 0
    instead of x[-1], which is gradient-identical because padded rows
    are masked at every loss/readout boundary (pallas_gather docstring).
    """
    if use_pallas and window:
        from alignn_tpu.ops.pallas_gather import windowed_gather

        return windowed_gather(x, dst, window)
    return x[dst]


def _gather_fwd(x, dst, num_nodes, use_pallas, window):
    # see _ssum_fwd: keep higher-order derivatives inside custom rules
    return sorted_gather(x, dst, num_nodes, use_pallas, window), dst


def _gather_bwd(num_nodes, use_pallas, window, dst, g):
    return sorted_segment_sum(g, dst, num_nodes, use_pallas, window), None


sorted_gather.defvjp(_gather_fwd, _gather_bwd)


@jax.custom_vjp
def permute_rows(x, perm, inv_perm):
    """x[perm] whose transpose is the inverse permutation GATHER.

    XLA lowers the transpose of a gather to a scatter even when the
    indices are a permutation; this custom rule keeps every derivative
    order gather-only (the VJP is permute_rows with the roles swapped).
    """
    return x[perm]


def _perm_fwd(x, perm, inv_perm):
    # see _ssum_fwd: keep higher-order derivatives inside custom rules
    return permute_rows(x, perm, inv_perm), (perm, inv_perm)


def _perm_bwd(res, g):
    perm, inv_perm = res
    return permute_rows(g, inv_perm, perm), None, None


permute_rows.defvjp(_perm_fwd, _perm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def gather_nodes(x, idx, perm, inv_perm, num_nodes: int,
                 use_pallas: bool = True, window: int = 0,
                 window_sorted: int = 0):
    """x[idx] for UNSORTED idx with a sorted-scatter transpose.

    `perm` is the stable argsort of `idx` (precomputed at batch build:
    GraphBatch.src_perm / lg_src_perm).  The VJP permutes the cotangent
    into idx-sorted order and reduces with the Pallas sorted-segment-sum
    kernel — the gathers by `src`/`lg_src` in EGGC would otherwise
    transpose to XLA serialized scatter-adds over the full [E|L, F]
    table, which dominate the force-training backward.

    `window` routes the forward through the windowed one-hot gather
    (pallas_gather); `window_sorted` is the span of `idx[perm]`, used by
    the inner segment-sum's own VJP at the next derivative order (force
    training differentiates this function's backward).
    """
    if use_pallas and window:
        from alignn_tpu.ops.pallas_gather import windowed_gather

        return windowed_gather(x, idx, window)
    return x[idx]


def _gn_fwd(x, idx, perm, inv_perm, num_nodes, use_pallas, window,
            window_sorted):
    # see _ssum_fwd: keep higher-order derivatives inside custom rules
    return gather_nodes(x, idx, perm, inv_perm, num_nodes,
                        use_pallas, window, window_sorted), \
        (idx, perm, inv_perm)


def _gn_bwd(num_nodes, use_pallas, window, window_sorted, res, g):
    idx, perm, inv_perm = res
    g_sorted = permute_rows(g, perm, inv_perm)
    ids_sorted = idx[perm]
    dx = sorted_segment_sum(g_sorted, ids_sorted, num_nodes, use_pallas,
                            window_sorted)
    return dx, None, None, None


gather_nodes.defvjp(_gn_fwd, _gn_bwd)


def _xla_forward(m, bh, dst, num_nodes):
    sigma = jax.nn.sigmoid(m)
    packed = jnp.concatenate([sigma * bh, sigma], axis=-1)
    summed = segment_sum(packed, dst, num_nodes, indices_are_sorted=True)
    f = m.shape[-1]
    return summed[:, :f] / (summed[:, f:] + EPS)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gated_aggregate(m, bh, dst, num_nodes: int, use_pallas: bool = True,
                    window: int = 0):
    """h = segment_normalized(sigmoid(m) * bh) over sorted dst.

    `window` (static span of `dst`) routes the backward's node->edge
    gathers through the windowed one-hot kernel.
    """
    if use_pallas:
        return _pallas_forward(m, bh, dst, num_nodes)
    return _xla_forward(m, bh, dst, num_nodes)


def _fwd(m, bh, dst, num_nodes, use_pallas, window):
    h = gated_aggregate(m, bh, dst, num_nodes, use_pallas, window)
    return h, (m, bh, dst, h)


def _bwd(num_nodes, use_pallas, window, res, g):
    """Backward with Pallas-fused reductions (round-2, VERDICT #6).

    The den recompute is a sorted_segment_sum (MXU one-hot matmul on
    TPU), and the two node->edge gathers ride a custom-vjp gather whose
    transpose is again the Pallas scatter — so the force-training
    grad-of-grad (which differentiates THIS function) never lowers to an
    XLA scatter-add.  Residuals stay differentiable functions of the
    primals (den recomputed, not captured), preserving correct higher-
    order derivatives.
    """
    m, bh, dst, h = res
    f = m.shape[-1]
    sigma = jax.nn.sigmoid(m)
    # den must be segment-summed in f32: the FORWARD kernel divided by
    # its f32 accumulator, and a bf16-rounded den here (up to ~0.4% off
    # for high-degree nodes) would make every edge gradient the
    # gradient of a slightly different function
    den = sorted_segment_sum(sigma.astype(jnp.float32), dst, num_nodes,
                             use_pallas, window) + EPS
    ginv = g / den                       # [N, F] f32
    gh = -g * h / den                    # [N, F] dL/dden
    packed = sorted_gather(jnp.concatenate([ginv, gh], axis=-1), dst,
                           num_nodes, use_pallas, window)
    ginv_e, gh_e = packed[:, :f], packed[:, f:]
    dbh = (sigma * ginv_e).astype(bh.dtype)
    dsigma = bh * ginv_e + gh_e
    dm = (sigma * (1 - sigma) * dsigma).astype(m.dtype)
    return dm, dbh, None


gated_aggregate.defvjp(_fwd, _bwd)


def edge_gated_aggregate_pallas(bh_src: jnp.ndarray, m: jnp.ndarray,
                                dst: jnp.ndarray, num_nodes: int,
                                use_pallas: bool = True,
                                window: int = 0) -> jnp.ndarray:
    """Drop-in for ops.segment.edge_gated_aggregate with logits input.

    Takes the *pre-sigmoid* gate logits m (the fused kernel computes
    sigmoid internally).
    """
    # kernel constraints: node table tiles by TN, features fill whole
    # 128-lane tiles (otherwise Mosaic rejects the HBM slices)
    if use_pallas and (num_nodes % TN != 0 or m.shape[-1] % 128 != 0):
        use_pallas = False
    return gated_aggregate(m, bh_src, dst, num_nodes, use_pallas, window)
