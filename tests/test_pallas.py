"""Pallas fused gated-aggregation kernel: parity vs the XLA path.

On CPU the kernel runs in interpreter mode; the same code path compiles
for TPU.  Checks forward parity, VJP parity, and grad-of-grad (the force
-training double-backward requirement, SURVEY.md §7 hard parts).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alignn_tpu.ops.pallas_eggc import (
    TN,
    _xla_forward,
    edge_gated_aggregate_pallas,
    gated_aggregate,
)


def _random_problem(num_nodes=256, e=1500, f=128, seed=0):
    rng = np.random.default_rng(seed)
    dst = np.sort(rng.integers(0, num_nodes, size=e)).astype(np.int32)
    m = rng.standard_normal((e, f)).astype(np.float32)
    bh = rng.standard_normal((e, f)).astype(np.float32)
    return jnp.asarray(m), jnp.asarray(bh), jnp.asarray(dst), num_nodes


def test_forward_parity():
    m, bh, dst, n = _random_problem()
    h_pallas = gated_aggregate(m, bh, dst, n, True)
    h_xla = _xla_forward(m, bh, dst, n)
    np.testing.assert_allclose(np.asarray(h_pallas), np.asarray(h_xla),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_empty_nodes():
    # nodes with no incident edges must come out exactly 0
    m, bh, dst, n = _random_problem(num_nodes=TN * 2, e=64)
    dst = jnp.where(dst < TN, dst, TN - 1).astype(jnp.int32)  # tile 2 empty
    dst = jnp.sort(dst)
    h = gated_aggregate(m, bh, dst, n, True)
    np.testing.assert_allclose(np.asarray(h)[TN:], 0.0, atol=1e-6)


def test_vjp_parity():
    m, bh, dst, n = _random_problem(f=128, e=700)

    def loss_p(m, bh):
        return jnp.sum(gated_aggregate(m, bh, dst, n, True) ** 2)

    def loss_x(m, bh):
        return jnp.sum(_xla_forward(m, bh, dst, n) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(m, bh)
    gx = jax.grad(loss_x, argnums=(0, 1))(m, bh)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_grad_of_grad():
    # double-backward through the custom VJP (force-loss training path)
    m, bh, dst, n = _random_problem(num_nodes=TN, e=200, f=128)

    def energy(m):
        return jnp.sum(gated_aggregate(m, bh, dst, n, True))

    def force_norm(m):
        return jnp.sum(jax.grad(energy)(m) ** 2)

    g2 = jax.grad(force_norm)(m)
    assert np.isfinite(np.asarray(g2)).all()

    def energy_x(m):
        return jnp.sum(_xla_forward(m, bh, dst, n))

    def force_norm_x(m):
        return jnp.sum(jax.grad(energy_x)(m) ** 2)

    g2x = jax.grad(force_norm_x)(m)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g2x),
                               rtol=1e-4, atol=1e-5)


def test_wrapper_fallback_unaligned():
    # num_nodes not a TN multiple -> XLA path, still correct
    m, bh, dst, n = _random_problem(num_nodes=100, e=300)
    h = edge_gated_aggregate_pallas(bh, m, dst, n)
    h_ref = _xla_forward(m, bh, dst, n)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)


def test_sorted_segment_sum_parity_and_grads():
    """Pallas sorted_segment_sum == XLA segment_sum, through 2nd order.

    The mutually-recursive VJP pair (sorted_segment_sum <-> sorted_gather)
    is what keeps the fused backward scatter-free at every derivative
    order (round-2 backward fusion, ops/pallas_eggc.py:_bwd).
    """
    from alignn_tpu.ops.pallas_eggc import sorted_gather, sorted_segment_sum
    from alignn_tpu.ops.segment import segment_sum

    m, _, dst, n = _random_problem()

    out_p = sorted_segment_sum(m, dst, n, True)
    out_x = segment_sum(m, dst, n, indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-6, atol=1e-6)

    def loss_p(x):
        return jnp.sum(jnp.sin(sorted_segment_sum(x, dst, n, True)) ** 2)

    def loss_x(x):
        return jnp.sum(jnp.sin(
            segment_sum(x, dst, n, indices_are_sorted=True)) ** 2)

    g_p = jax.grad(loss_p)(m)
    g_x = jax.grad(loss_x)(m)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-5, atol=1e-6)

    # second order: grad of a scalar built from the first grad
    gg_p = jax.grad(lambda x: jnp.sum(jax.grad(loss_p)(x) ** 2))(m)
    gg_x = jax.grad(lambda x: jnp.sum(jax.grad(loss_x)(x) ** 2))(m)
    # f32 accumulation-order noise between the two scatter orders
    np.testing.assert_allclose(np.asarray(gg_p), np.asarray(gg_x),
                               rtol=1e-3, atol=1e-4)

    # gather + its scatter transpose
    xn = jnp.asarray(np.random.default_rng(1).standard_normal(
        (n, m.shape[1])).astype(np.float32))
    np.testing.assert_allclose(np.asarray(sorted_gather(xn, dst, n, True)),
                               np.asarray(xn[dst]), rtol=1e-6, atol=0)
    gg = jax.grad(lambda x: jnp.sum(
        sorted_gather(x, dst, n, True) ** 2))(xn)
    gx = jax.grad(lambda x: jnp.sum(x[dst] ** 2))(xn)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gx),
                               rtol=1e-5, atol=1e-6)


def test_gather_nodes_and_permute_rows():
    """Unsorted-gather custom op: forward = x[idx]; grads match the
    plain-indexing implementation through second order (the transpose
    runs as a sorted Pallas scatter via the precomputed permutation)."""
    from alignn_tpu.ops.pallas_eggc import gather_nodes, permute_rows

    rng = np.random.default_rng(0)
    n_nodes, e, f = 256, 1500, 128
    idx = jnp.asarray(rng.integers(0, n_nodes, size=e).astype(np.int32))
    perm = jnp.asarray(np.argsort(np.asarray(idx),
                                  kind="stable").astype(np.int32))
    inv = np.empty(e, np.int32)
    inv[np.asarray(perm)] = np.arange(e, dtype=np.int32)
    inv = jnp.asarray(inv)
    x = jnp.asarray(rng.standard_normal((n_nodes, f)).astype(np.float32))

    out = gather_nodes(x, idx, perm, inv, n_nodes, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[idx]))

    def loss_fused(x):
        return jnp.sum(jnp.sin(
            gather_nodes(x, idx, perm, inv, n_nodes, True)) ** 2)

    def loss_plain(x):
        return jnp.sum(jnp.sin(x[idx]) ** 2)

    g_f = jax.grad(loss_fused)(x)
    g_p = jax.grad(loss_plain)(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_p),
                               rtol=1e-5, atol=1e-6)
    gg_f = jax.grad(lambda x: jnp.sum(jax.grad(loss_fused)(x) ** 2))(x)
    gg_p = jax.grad(lambda x: jnp.sum(jax.grad(loss_plain)(x) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gg_f), np.asarray(gg_p),
                               rtol=1e-3, atol=1e-4)

    # permutation op: transpose is the inverse permutation
    y = jnp.asarray(rng.standard_normal((e, 4)).astype(np.float32))
    g = jax.grad(lambda y: jnp.sum(permute_rows(y, perm, inv)
                                   * jnp.arange(e)[:, None]))(y)
    expect = jnp.arange(e)[:, None] * jnp.ones((1, 4))
    np.testing.assert_allclose(np.asarray(g),
                               np.asarray(expect[inv]), rtol=1e-6)


def test_full_model_grads_with_fused_gathers():
    """ALIGNNAtomWise force training with use_pallas forced on (CPU
    interpret): grads wrt params match the plain-gather path."""
    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.nn import layers as L
    from alignn_tpu.nn.models import (
        ALIGNNAtomWise,
        ALIGNNAtomWiseConfig,
        atomwise_forward,
    )

    rng = np.random.default_rng(0)
    a = Atoms(lattice_mat=np.eye(3) * 4.0,
              frac_coords=np.array([[0, 0, 0], [0.5, 0.5, 0.5]])
              + 0.01 * rng.standard_normal((2, 3)),
              elements=["Na", "Cl"])
    g = build_graph(a, cutoff=5.0, max_neighbors=12)
    g.target = np.array([0.3])
    g.forces = 0.05 * rng.standard_normal((2, 3))
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=128, embedding_features=64, gradwise_weight=1.0,
        stresswise_weight=0.1)

    outs = {}
    for tag, forced in (("fused", True), ("plain", False)):
        orig = L.pallas_default
        L.pallas_default = lambda: forced
        try:
            model = ALIGNNAtomWise(cfg=cfg)
            variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                                   train=False)

            def loss(params):
                res = atomwise_forward(
                    model, {"params": params}, batch, train=False)
                return (jnp.sum(res["out"][:1] ** 2)
                        + jnp.sum(res["grad"] ** 2)
                        + jnp.sum(res["stresses"] ** 2))

            outs[tag] = jax.grad(loss)(variables["params"])
        finally:
            L.pallas_default = orig
    flat_f = jax.tree_util.tree_leaves(outs["fused"])
    flat_p = jax.tree_util.tree_leaves(outs["plain"])
    for af, ap in zip(flat_f, flat_p):
        np.testing.assert_allclose(np.asarray(af), np.asarray(ap),
                                   rtol=2e-3, atol=2e-5)
