"""Fused dense L-stage (ops/pallas_fused_lstage.py): parity + autodiff.

The fused op must be *the same math* as the unfused composition
(edge_gate Dense -> gate broadcasts -> mask fold -> pair aggregation ->
layernorm -> silu -> residual) executed by the committed dense path, at
every derivative order, with zero scatters in the grad-of-grad jaxpr.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alignn_tpu.ops.pallas_dense import dense_pair_aggregate, fold_mask
from alignn_tpu.ops.pallas_fused_lstage import _xla_fused, fused_pair_lstage


def _inputs(n=16, D=4, F=128, seed=0, masked=True):
    rng = np.random.default_rng(seed)
    E, L = n * D, n * D * D
    mk = lambda s, sc=1.0: jnp.asarray(  # noqa: E731
        rng.standard_normal(s) * sc, jnp.float32)
    z, sg, dg, bh = mk((L, F)), mk((E, F)), mk((E, F)), mk((E, F))
    w, b = mk((F, F), 0.05), mk(F, 0.1)
    sc = jnp.asarray(1.0 + 0.1 * rng.standard_normal(F), jnp.float32)
    bi = jnp.asarray(0.1 * rng.standard_normal(F), jnp.float32)
    em = jnp.asarray((rng.random(E) < 0.85).astype(np.float32)) \
        if masked else jnp.ones(E, jnp.float32)
    shift = ((em - 1.0) * 1e9)[:, None]
    return z, w, b, sg + shift, dg + shift, bh, sc, bi, em


def _unfused(z, w, b, sg, dg, bh, sc, bi, em, D):
    """The committed dense path's composition, spelled out."""
    n = sg.shape[0] // D
    F = z.shape[-1]
    L = z.shape[0]
    # strip the folded shifts back off: the unfused path folds lg_mask
    # into m2 instead
    shift = ((em - 1.0) * 1e9)[:, None]
    eg = z @ w + b
    m2 = (eg.reshape(n, D, D, F)
          + (sg - shift).reshape(n, 1, D, F)
          + (dg - shift).reshape(n, D, 1, F)).reshape(L, F)
    em2 = em.reshape(n, D)
    lm = (em2[:, None, :] * em2[:, :, None]).reshape(L)
    m2f = fold_mask(m2, lm)
    h = dense_pair_aggregate(m2f, bh, D, False)
    mean = m2f.mean(-1, keepdims=True)
    var = ((m2f - mean) ** 2).mean(-1, keepdims=True)
    ln = (m2f - mean) * jax.lax.rsqrt(var + 1e-5) * sc + bi
    e_new = z + jax.nn.silu(ln)
    return e_new, h, lm


@pytest.mark.parametrize("use_pallas", [False, True])
def test_fused_matches_unfused_composition(use_pallas):
    z, w, b, sg, dg, bh, sc, bi, em = _inputs()
    e_u, h_u, lm = _unfused(z, w, b, sg, dg, bh, sc, bi, em, 4)
    e_f, h_f = fused_pair_lstage(z, w, b, sg, dg, bh, sc, bi, 4,
                                 use_pallas)
    real = np.asarray(lm) > 0
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_u),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_f)[real],
                               np.asarray(e_u)[real],
                               rtol=1e-5, atol=1e-5)


def test_fused_vjp_matches_autodiff():
    """Custom VJP == plain autodiff of the XLA body, all 8 operands."""
    z, w, b, sg, dg, bh, sc, bi, em = _inputs(seed=2)
    n = sg.shape[0] // 4
    em2 = em.reshape(n, 4)
    lm = (em2[:, None, :] * em2[:, :, None]).reshape(-1)

    def loss_fused(args):
        e, h = fused_pair_lstage(*args, 4, False)
        return jnp.sum((e * lm[:, None]) ** 2) + jnp.sum(h ** 2)

    def loss_plain(args):
        e, h = _xla_fused(*args, 4)
        return jnp.sum((e * lm[:, None]) ** 2) + jnp.sum(h ** 2)

    args = (z, w, b, sg, dg, bh, sc, bi)
    gf = jax.grad(loss_fused)(args)
    gp = jax.grad(loss_plain)(args)
    for a, p in zip(gf, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(p),
                                   rtol=1e-4, atol=1e-4)


def test_fused_grad_of_grad_scatter_free():
    """Force-training pattern: d/dparams of (dE/dz)^2 — parity + census."""
    z, w, b, sg, dg, bh, sc, bi, _ = _inputs(n=8, seed=3, masked=False)

    def energy(z_, w_, fn):
        e, h = fn(z_, w_)
        return jnp.sum(e ** 2) + jnp.sum(h ** 2)

    def floss(w_, fn):
        f = jax.grad(lambda zz: energy(zz, w_, fn))(z)
        return jnp.sum(f ** 2)

    fused = lambda z_, w_: fused_pair_lstage(  # noqa: E731
        z_, w_, b, sg, dg, bh, sc, bi, 4, False)
    plain = lambda z_, w_: _xla_fused(  # noqa: E731
        z_, w_, b, sg, dg, bh, sc, bi, 4)
    g2_f = jax.grad(lambda w_: floss(w_, fused))(w)
    g2_p = jax.grad(lambda w_: floss(w_, plain))(w)
    scale = float(np.abs(np.asarray(g2_p)).max())
    np.testing.assert_allclose(np.asarray(g2_f) / scale,
                               np.asarray(g2_p) / scale,
                               rtol=1e-5, atol=1e-6)
    jx = str(jax.make_jaxpr(lambda w_: floss(w_, fused))(w))
    assert len(re.findall(r"scatter", jx)) == 0


def test_fused_backward_kernel_matches_body():
    """Pallas backward kernel == XLA recompute body, every output."""
    from alignn_tpu.ops.pallas_fused_lstage import _bwd_body, _bwd_op

    z, w, b, sg, dg, bh, sc, bi, _ = _inputs(seed=7)
    rng = np.random.default_rng(8)
    de = jnp.asarray(rng.standard_normal(z.shape), jnp.float32)
    dh = jnp.asarray(rng.standard_normal(sg.shape), jnp.float32)
    outs_k = _bwd_op(z, w, b, sg, dg, bh, sc, bi, de, dh, 4, True)
    outs_x = _bwd_body(z, w, b, sg, dg, bh, sc, bi, de, dh, 4)
    for a, p in zip(outs_k, outs_x):
        scale = max(float(np.abs(np.asarray(p)).max()), 1e-9)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(p) / scale,
                                   rtol=1e-5, atol=1e-5)


def test_fused_grad_of_grad_through_kernel_backward():
    """2nd order with the kernel backward active == plain autodiff."""
    z, w, b, sg, dg, bh, sc, bi, _ = _inputs(n=8, seed=9, masked=False)

    def energy(z_, w_, fn):
        e, h = fn(z_, w_)
        return jnp.sum(e ** 2) + jnp.sum(h ** 2)

    def floss(w_, fn):
        f = jax.grad(lambda zz: energy(zz, w_, fn))(z)
        return jnp.sum(f ** 2)

    fused = lambda z_, w_: fused_pair_lstage(  # noqa: E731
        z_, w_, b, sg, dg, bh, sc, bi, 4, True)
    plain = lambda z_, w_: _xla_fused(  # noqa: E731
        z_, w_, b, sg, dg, bh, sc, bi, 4)
    g2_f = jax.grad(lambda w_: floss(w_, fused))(w)
    g2_p = jax.grad(lambda w_: floss(w_, plain))(w)
    scale = float(np.abs(np.asarray(g2_p)).max())
    np.testing.assert_allclose(np.asarray(g2_f) / scale,
                               np.asarray(g2_p) / scale,
                               rtol=1e-5, atol=1e-6)


def test_fused_model_parity(monkeypatch):
    """Model through the fused path == sparse reference path; the
    variable tree (edge_gate / norm_edges param paths) is identical, so
    checkpoints load interchangeably."""
    from tests.test_dense import _graphs, _model_outputs

    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.dense import (
        dense_batch_graphs,
        dense_spec_for_batch,
    )

    graphs = _graphs(2, seed=5)
    sp = batch_graphs(graphs, BucketSpec.tight_for_batch(graphs),
                      target_width=1)
    dn = dense_batch_graphs(graphs, dense_spec_for_batch(graphs),
                            target_width=1)
    n_real = sum(g.num_nodes for g in graphs)
    n_graphs = len(graphs)

    model, variables, res_sp = _model_outputs(sp)
    monkeypatch.setenv("ALIGNN_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("ALIGNN_TPU_FUSED_LSTAGE", "1")  # opt-in path
    _, _, res_dn = _model_outputs(dn, variables=variables)
    np.testing.assert_allclose(
        np.asarray(res_dn["out"])[:n_graphs],
        np.asarray(res_sp["out"])[:n_graphs], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(res_dn["grad"])[:n_real],
        np.asarray(res_sp["grad"])[:n_real], rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(res_dn["stresses"])[:n_graphs],
        np.asarray(res_sp["stresses"])[:n_graphs], rtol=5e-4, atol=5e-5)
    # init on the dense batch (fused modules) == init on sparse: the
    # param-only _DenseParams/_NormParams modules reproduce the Dense /
    # MaskedLayerNorm paths AND values (path-based RNG)
    v_dn = model.init(jax.random.PRNGKey(0), dn, dn.r, train=False)
    v_sp = model.init(jax.random.PRNGKey(0), sp, sp.r, train=False)
    assert (jax.tree_util.tree_structure(v_dn)
            == jax.tree_util.tree_structure(v_sp))
    for a, p in zip(jax.tree_util.tree_leaves(v_dn),
                    jax.tree_util.tree_leaves(v_sp)):
        assert a.shape == p.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(p))
