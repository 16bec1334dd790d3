"""Pallas TPU kernel: windowed one-hot gather for graph-local indices.

XLA lowers `x[idx]` for the message-passing gathers (node->edge by
`src`, edge->L-edge by `lg_src`/`lg_dst`) to a random-access dynamic
gather that the round-2 device profile measured at ~10-20% of HBM
bandwidth (~13 ns/row regardless of dtype) — the dominant cost of the
train step once the scatters moved to the MXU (BENCH_NOTES.md round-2
profile).

This kernel exploits the batch layout (graph/batch.py): each graph's
nodes / edges / L-edges occupy contiguous index blocks, so for any
supertile of consecutive index rows the *real* (non-trash) indices span
a bounded window of the source table.  The gather then becomes, per
supertile of `TLS` rows:

- DMA the [W, F] source window (aligned, contiguous — full-bandwidth)
  into VMEM, skipping the copy when the previous supertile used the
  same window base;
- stream a precomputed int8 local one-hot [TLS, W] as an
  auto-pipelined input block (Pallas double-buffers it);
- out = onehot @ window on the MXU, f32 accumulation, HIGHEST
  precision so f32 tables gather exactly (one-hot selection is exact
  for 0/1 coefficients; verified bit-exact on v5e — BENCH_NOTES).

Semantics differ from `x[idx]` in ONE deliberate way: rows whose index
falls outside the supertile's window (only trash-pointing padded rows,
by construction) produce 0 instead of `x[trash_row]`.  Padded rows are
masked at every loss/readout boundary so their cotangents are exactly
zero, which makes the two conventions produce identical gradients at
every derivative order; forward garbage stays finite (pad displacement
r=(1,0,0) was only ever needed to keep NaNs out, and 0 is NaN-safe).

The required window size is static per batch: graph/batch.py measures
the max per-supertile span of real indices and rounds up to a multiple
of 256 (bounded jit-cache churn).  Window 0 or > _MAX_WINDOW means
"fall back to XLA gather" (single huge graphs, e.g. MD cells).

Replaces the forward side of the reference's DGL SpMM gather machinery
(alignn/models/alignn.py:100-108 `update_all`); the scatter side lives
in ops/pallas_eggc.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TLS = 512         # preferred index rows per supertile (grid step)
_ALIGN = 128      # window DMA base alignment
_W_QUANTUM = 256
_MAX_WINDOW = 2048


def windows_enabled() -> bool:
    """Opt-in switch for routing model gathers through this kernel.

    Default OFF: on-device measurement (tools/gather_bench.py, v5e,
    batch 64) found the standalone windowed gather bit-exact but
    0.5-0.87x the XLA dynamic gather — the one-hot rebuild costs more
    than random-access HBM reads at these shapes.  The kernel stays as
    the building block for the fused L-stage kernel (where the matmul
    amortizes against eliminated HBM round-trips); flip on with
    ALIGNN_TPU_ENABLE_WGATHER=1 for experiments.
    """
    import os

    return bool(os.environ.get("ALIGNN_TPU_ENABLE_WGATHER"))


def supertile_for(m: int) -> int:
    """Largest supertile in (512, 256, 128) dividing the index length.

    Edge tables pad to 128-row quanta, L-edge tables to 512
    (graph/batch.py) — window sizing and the kernel grid must agree on
    the tiling, so both derive it from this helper.
    """
    for t in (TLS, 256, 128):
        if m % t == 0:
            return t
    return 0


def max_tile_span(idx, trash: int, tile: int = TLS) -> int:
    """Max over supertiles of (max real idx - min real idx + 1), numpy.

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


def window_for(idx, trash: int, tile: int | None = None) -> int:
    """Static window (multiple of 256 >= span + align slack), 0 = fallback."""
    if tile is None:
        tile = supertile_for(len(idx))
        if tile == 0:
            return 0
    span = max_tile_span(idx, trash, tile)
    w = span + _ALIGN  # base aligns down by up to _ALIGN-1 rows
    w = ((w + _W_QUANTUM - 1) // _W_QUANTUM) * _W_QUANTUM
    return w if w <= _MAX_WINDOW else 0


def _gather_kernel(base_ref,            # scalar prefetch [T]
                   oh_ref, x_hbm,       # [TLS, W] pipelined; HBM table
                   out_ref,             # VMEM [TLS, F]
                   win, state, sems):
    """Per-supertile: out = onehot @ window, window double-buffered.

    Consecutive supertiles of one graph share a window base, so the
    [W, F] source DMA is skipped on repeats and prefetched one supertile
    ahead on changes (all bases are scalar-prefetched, so step i can
    start step i+1's copy).  `state[0]` tracks the live slot; every
    started DMA is waited exactly one step later — base_{i+1} != base_i
    at start time iff `moved` fires at step i+1.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    base = pl.multiple_of(base_ref[i], _ALIGN)
    w = win.shape[1]

    def dma(b, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(b, w), :], win.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        state[0] = 0
        cp = dma(base, 0)
        cp.start()
        cp.wait()

    # bases arrive pre-aligned from the XLA side
    moved = jnp.logical_and(
        i > 0, base_ref[i] != base_ref[jnp.maximum(i - 1, 0)])

    @pl.when(moved)
    def _():
        # the previous step prefetched this window into the spare slot
        slot = 1 - state[0]
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(base, w), :], win.at[slot],
            sems.at[slot]).wait()
        state[0] = slot

    cur = state[0]

    @pl.when(i + 1 < n)
    def _():
        nb = pl.multiple_of(base_ref[i + 1], _ALIGN)

        @pl.when(nb != base_ref[i])
        def _():
            dma(nb, 1 - cur).start()

    if win.dtype == jnp.bfloat16:
        # bf16 tables: bf16 x bf16 one-hot matmul with f32 accumulation
        # is an exact row copy (0/1 coefficients) at 1 MXU pass
        onehot = oh_ref[:].astype(jnp.bfloat16)
        out_ref[:] = jax.lax.dot_general(
            onehot, win[cur], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)
    else:
        # f32 tables need HIGHEST: the MXU's default f32 path truncates
        # operands to bf16, which would make the gather lossy (verified
        # bit-exact on v5e with HIGHEST — BENCH_NOTES)
        onehot = oh_ref[:].astype(jnp.float32)
        out_ref[:] = jax.lax.dot_general(
            onehot, win[cur].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST).astype(out_ref.dtype)


def _windowed_gather_impl(x: jnp.ndarray, idx: jnp.ndarray, window: int,
                          interpret: bool) -> jnp.ndarray:
    rows, f = x.shape
    m = idx.shape[0]
    tls = supertile_for(m)
    assert tls and window % _W_QUANTUM == 0 and f % 128 == 0
    num_tiles = m // tls
    trash = rows - 1

    t = idx.reshape(num_tiles, tls)
    real = t != trash
    big = jnp.int32(rows)
    lo = jnp.min(jnp.where(real, t, big), axis=1)
    base = jnp.where(lo >= rows, 0,
                     (lo // _ALIGN) * _ALIGN).astype(jnp.int32)
    # int8 local one-hot: out-of-range (trash) rows become all-zero
    local = t - base[:, None]
    oh = jax.nn.one_hot(
        jnp.where(real, local, -1).reshape(m), window, dtype=jnp.int8)

    # pad so window slices never run off the end
    x_p = jnp.pad(x, ((0, window), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tls, window), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tls, f), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, window, f), x.dtype),
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

    `window` is the static per-supertile source span from
    :func:`window_for`; 0 (or unusable shapes) falls back to XLA gather.
    """
    if (window <= 0 or window > _MAX_WINDOW
            or window % _W_QUANTUM != 0
            or x.dtype not in (jnp.float32, jnp.bfloat16)
            or x.shape[-1] % 128 != 0
            or supertile_for(idx.shape[0]) == 0):
        return x[idx]
    interpret = jax.default_backend() != "tpu"
    return _windowed_gather_impl(x, idx, window, interpret)
