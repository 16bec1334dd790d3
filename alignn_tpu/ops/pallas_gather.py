"""Pallas TPU kernel: windowed one-hot gather for graph-local indices.

XLA lowers `x[idx]` for the message-passing gathers (node->edge by
`src`, edge->L-edge by `lg_src`/`lg_dst`) to a random-access dynamic
gather that the round-2 device profile measured at ~10-20% of HBM
bandwidth — the dominant cost of the train step once the scatters moved
to the MXU (BENCH_NOTES.md round-2 profile).

This kernel exploits the batch layout (graph/batch.py): each graph's
nodes / edges / L-edges occupy contiguous index blocks, and edges are
sorted by dst — so for any 128-row tile of a gather's index vector, the
*real* (non-trash) indices span at most one graph's block.  The gather
then becomes, per tile:

- DMA the [W, F] source window (aligned, contiguous — full-bandwidth)
  into VMEM, skipping the copy when the previous tile used the same
  window base (consecutive tiles of one graph share it);
- stream a precomputed int8 local one-hot [128, W] (cheap: 1 byte/row
  per window column, sequential);
- out = onehot @ window on the MXU, f32 accumulation.

Semantics differ from `x[idx]` in ONE deliberate way: rows whose index
falls outside the tile's window (only trash-pointing padded rows, by
construction) produce 0 instead of `x[trash_row]`.  Padded rows are
masked at every loss/readout boundary so their cotangents are exactly
zero, which makes the two conventions produce identical gradients at
every derivative order; forward garbage stays finite (pad displacement
r=(1,0,0) was only ever needed to keep NaNs out, and 0 is NaN-safe).

The required window size is static per batch: graph/batch.py measures
the max per-tile span of real indices and rounds up to a power of two
(bounded jit-cache churn).  Window 0 or > _MAX_WINDOW means "fall back
to XLA gather" (single huge graphs, e.g. MD cells).

Replaces the reference's DGL edge-softmax/SpMM gather machinery
(alignn/models/alignn.py:100-108 `update_all`) on the forward side; the
scatter side lives in ops/pallas_eggc.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TL = 128          # index rows per tile
_MAX_WINDOW = 2048


def max_tile_span(idx, trash: int, tile: int = TL) -> int:
    """Max over tiles of (max real idx - min real idx), host-side numpy.

    Used by graph/batch.py to size the static gather window.  Rows equal
    to `trash` (the padded-slot index) are excluded — the kernel returns
    0 for them instead of x[trash].
    """
    import numpy as np

    idx = np.asarray(idx)
    pad = (-len(idx)) % tile
    if pad:
        idx = np.concatenate([idx, np.full(pad, trash, idx.dtype)])
    t = idx.reshape(-1, tile)
    real = t != trash
    lo = np.where(real, t, np.iinfo(np.int32).max).min(axis=1)
    hi = np.where(real, t, -1).max(axis=1)
    spans = hi - lo + 1
    spans = np.where(hi >= 0, spans, 0)
    return int(spans.max()) if len(spans) else 0


def window_for(idx, trash: int, tile: int = TL) -> int:
    """Static window (power-of-two >= span + alignment slack), 0 = fallback.

    The kernel aligns each tile's DMA base down to 128, so the window
    must cover span + up-to-127 slack.
    """
    span = max_tile_span(idx, trash, tile)
    w = tile
    while w < span + tile:
        w *= 2
    return w if w <= _MAX_WINDOW else 0


def _gather_kernel(base_ref,            # scalar prefetch [T]
                   oh_hbm, x_hbm,       # HBM inputs
                   out_ref,             # VMEM [TL, F]
                   win, oh_buf, prev, sems):
    i = pl.program_id(0)
    base = pl.multiple_of(base_ref[i], TL)
    w = win.shape[1]

    oh_cp = pltpu.make_async_copy(
        oh_hbm.at[pl.ds(i * TL, TL), :], oh_buf, sems.at[0])
    oh_cp.start()

    # re-DMA the source window only when the base moved — consecutive
    # tiles of the same graph share one window (prev lives in SMEM
    # scratch, which persists across sequential grid steps)
    first = i == 0
    moved = jnp.logical_or(first, base != prev[0])

    @pl.when(moved)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(base, w), :], win, sems.at[1])
        cp.start()
        cp.wait()

    prev[0] = base
    oh_cp.wait()
    onehot = oh_buf[:].astype(jnp.float32)
    rows = win[0].astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        onehot, rows, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _windowed_gather_impl(x: jnp.ndarray, idx: jnp.ndarray, window: int,
                          interpret: bool) -> jnp.ndarray:
    rows, f = x.shape
    m = idx.shape[0]
    assert m % TL == 0 and window % TL == 0 and f % 128 == 0
    num_tiles = m // TL
    trash = rows - 1

    t = idx.reshape(num_tiles, TL)
    real = t != trash
    big = jnp.int32(rows)
    lo = jnp.min(jnp.where(real, t, big), axis=1)
    base = jnp.where(lo >= rows, 0, (lo // TL) * TL).astype(jnp.int32)
    # int8 local one-hot: out-of-range (trash) rows become all-zero
    local = t - base[:, None]
    oh = jax.nn.one_hot(
        jnp.where(real, local, -1).reshape(m), window, dtype=jnp.int8)

    # pad so window slices never run off the end; leading unit axis keeps
    # the manual DMA 3-D with a static major index (Mosaic-friendly)
    x_p = jnp.pad(x, ((0, window), (0, 0)))[None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TL, f), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, window, f), x.dtype),
            pltpu.VMEM((TL, window), jnp.int8),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((m, f), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(base, oh, x_p)


def windowed_gather(x: jnp.ndarray, idx: jnp.ndarray,
                    window: int) -> jnp.ndarray:
    """x[idx] via windowed one-hot MXU matmuls (trash rows -> 0).

    `window` is the static per-tile source span from
    :func:`window_for`; 0 (or unusable shapes) falls back to XLA gather.
    """
    if (window <= 0 or window > _MAX_WINDOW
            or x.shape[-1] % 128 != 0 or idx.shape[0] % TL != 0):
        return x[idx]
    interpret = jax.default_backend() != "tpu"
    return _windowed_gather_impl(x, idx, window, interpret)
