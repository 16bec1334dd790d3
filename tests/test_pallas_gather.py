"""Windowed one-hot gather kernel (ops/pallas_gather) parity tests.

Runs in interpret mode on the CPU mesh; the real-TPU Mosaic path is
exercised by tools/gather_bench.py (numbers in BENCH_NOTES.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alignn_tpu.ops.pallas_gather import (
    _MAX_WINDOW,
    max_tile_span,
    window_for,
    windowed_gather,
)


def _blocky_indices(rng, blocks, refs_per_block, trash, quantum=512):
    """Batched-graph-style indices: per-block refs + trailing trash."""
    idx, off = [], 0
    for b in blocks:
        idx.extend((off + rng.integers(0, b, size=refs_per_block * b)))
        off += b
    m = ((len(idx) + quantum - 1) // quantum) * quantum
    return np.array(list(idx) + [trash] * (m - len(idx)), dtype=np.int32)


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    blocks = [180, 200, 150, 190, 170, 160]
    rows = 1280
    x = rng.normal(size=(rows, 256)).astype(np.float32)
    idx = _blocky_indices(rng, blocks, 4, rows - 1)
    return x, idx, rows - 1


def test_window_sizing(case):
    x, idx, trash = case
    span = max_tile_span(idx, trash)
    w = window_for(idx, trash)
    assert w >= span + 128 and w % 128 == 0
    # sorted indices need a smaller window
    assert window_for(np.sort(idx), trash) <= w


def test_f32_parity_real_rows_zero_trash(case):
    x, idx, trash = case
    w = window_for(idx, trash)
    out = np.asarray(windowed_gather(jnp.asarray(x), jnp.asarray(idx), w))
    real = idx != trash
    np.testing.assert_allclose(out[real], x[idx][real], rtol=1e-6)
    assert np.all(out[~real] == 0)


def test_bf16_exact(case):
    x, idx, trash = case
    w = window_for(idx, trash)
    xb = jnp.asarray(x, jnp.bfloat16)
    out = np.asarray(windowed_gather(xb, jnp.asarray(idx), w))
    real = idx != trash
    assert np.array_equal(out[real].astype(np.float32),
                          np.asarray(xb)[idx][real].astype(np.float32))


def test_fallbacks(case):
    x, idx, trash = case
    # window=0 and over-cap windows fall back to exact XLA gather
    for w in (0, _MAX_WINDOW * 2):
        out = np.asarray(windowed_gather(jnp.asarray(x), jnp.asarray(idx), w))
        np.testing.assert_allclose(out, x[idx], rtol=0)


def test_all_trash_and_sparse_tiles(case):
    x, _, _ = case
    trash = x.shape[0] - 1
    idx = np.full(512, trash, np.int32)
    idx[300:340] = 7
    w = window_for(idx, trash)
    out = np.asarray(windowed_gather(jnp.asarray(x), jnp.asarray(idx), w))
    np.testing.assert_allclose(out[300:340], np.tile(x[7], (40, 1)),
                               rtol=1e-6)
    assert np.all(out[:300] == 0) and np.all(out[340:] == 0)


def test_grad_through_sorted_gather_window(case):
    """Grad flows through the custom-VJP wrapper, windowed forward.

    `windowed_gather` itself has no autodiff rule by design — production
    always reaches it through sorted_gather/gather_nodes, whose VJPs are
    the Pallas sorted scatters (never differentiating the kernel body).
    """
    from alignn_tpu.ops.pallas_eggc import sorted_gather

    x, idx, trash = case
    sidx = np.sort(idx)
    w = window_for(sidx, trash)
    mask = jnp.asarray((sidx != trash).astype(np.float32))[:, None]

    def loss(fn):
        return lambda xx: jnp.sum(jnp.square(fn(xx) * mask))

    xj = jnp.asarray(x)
    rows = x.shape[0]
    g_win = jax.grad(loss(lambda xx: sorted_gather(
        xx, jnp.asarray(sidx), rows, True, w)))(xj)
    g_xla = jax.grad(loss(lambda xx: xx[jnp.asarray(sidx)]))(xj)
    np.testing.assert_allclose(np.asarray(g_win), np.asarray(g_xla),
                               rtol=1e-5, atol=1e-6)
