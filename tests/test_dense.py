"""Dense-neighborhood layout (graph/dense.py): builder + model parity.

The dense layout must be *the same graph* in a different execution
layout: identical L-edge set, identical model outputs (energies, forces,
stress) and parameter gradients vs the sparse path, to reduction-order
tolerance.  The sparse path is itself pinned against the reference's own
source (tests/test_ref_oracle.py), so dense parity chains to the
reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alignn_tpu.chem.atoms import Atoms
from alignn_tpu.graph.batch import BucketSpec, batch_graphs
from alignn_tpu.graph.build import build_graph
from alignn_tpu.graph.dense import (
    dense_batch_graphs,
    dense_spec_for_batch,
    max_in_degree,
)


def _graphs(n=3, seed=0):
    rng = np.random.default_rng(seed)
    elems = ["Na", "Cl", "K", "Br", "Mg", "O", "Ca", "S"]
    out = []
    for i in range(n):
        a = 4.2 + 0.3 * rng.standard_normal()
        base = np.array([
            [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
            [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5]])
        frac = base + 0.03 * rng.standard_normal((8, 3))
        atoms = Atoms(lattice_mat=np.eye(3) * a, frac_coords=frac,
                      elements=[elems[j % len(elems)] for j in range(8)])
        g = build_graph(atoms, cutoff=8.0, max_neighbors=12)
        g.target = np.array([rng.standard_normal()])
        g.forces = rng.standard_normal((8, 3)) * 0.1
        g.stress = np.eye(3) * 0.01
        out.append(g)
    return out


def test_dense_builder_layout_invariants():
    graphs = _graphs(2)
    spec = dense_spec_for_batch(graphs)
    b = dense_batch_graphs(graphs, spec)
    D = b.dense_D
    e_pad = b.src.shape[0]
    assert e_pad == b.z.shape[0] * D
    assert b.lg_src.shape[0] == e_pad * D
    # dst is the block owner everywhere
    np.testing.assert_array_equal(b.dst, np.arange(e_pad) // D)
    # rev is an involution with r[rev] == -r on real edges
    np.testing.assert_array_equal(b.rev[b.rev], np.arange(e_pad))
    real = b.edge_mask > 0
    np.testing.assert_allclose(b.r[b.rev][real], -b.r[real], atol=1e-6)
    # implicit local-pair lg arrays: row j*D^2 + t*D + s <-> (a, b)
    np.testing.assert_array_equal(
        b.lg_dst, np.repeat(b.rev, D))
    np.testing.assert_array_equal(
        b.lg_src,
        (np.repeat((np.arange(e_pad, dtype=np.int64) // D) * D, D)
         + np.tile(np.arange(D), e_pad)))
    # masks: every real edge row's (src, dst) pair present in the
    # original graphs, and counts match
    assert int(b.edge_mask.sum()) == sum(g.num_edges for g in graphs)


def test_dense_lg_edge_set_matches_sparse():
    """The real (masked-in) implicit L-edge set == the sparse L(g)."""
    g = _graphs(1)[0]
    spec = dense_spec_for_batch([g])
    b = dense_batch_graphs([g], spec)
    D = b.dense_D
    # map dense edge row -> original (src, dst, r) identity via r match
    real = b.edge_mask > 0
    dense_rows = np.nonzero(real)[0]
    # sparse L-edge set as (src_a, dst_a, src_b, dst_b, r_a, r_b) multiset
    sp = set()
    for a, bb in zip(g.lg_src, g.lg_dst):
        sp.add((g.src[a], g.dst[a], g.src[bb], g.dst[bb],
                tuple(np.round(np.float32(g.r[a]), 4)), tuple(np.round(np.float32(g.r[bb]), 4))))
    dn = set()
    lg_mask = b.lg_mask.reshape(-1, D)   # rows (j, t), cols s
    for jt in range(lg_mask.shape[0]):
        brow = b.rev[jt]                  # L(g)-dst edge b = rev(j*D+t)
        j = jt // D
        for s in range(D):
            if lg_mask[jt, s] > 0:
                arow = j * D + s          # L(g)-src edge a
                dn.add((b.src[arow], b.dst[arow], b.src[brow], b.dst[brow],
                        tuple(np.round(b.r[arow], 4)),
                        tuple(np.round(b.r[brow], 4))))
    assert sp == dn
    assert int(b.lg_mask.sum()) == g.num_lg_edges


def _model_outputs(batch, variables=None, seed=0):
    from alignn_tpu.nn.models import (
        ALIGNNAtomWise,
        ALIGNNAtomWiseConfig,
        atomwise_forward,
    )

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=2, gcn_layers=2,
        hidden_features=64, embedding_features=32,
        gradwise_weight=1.0, stresswise_weight=0.1, graphwise_weight=1.0)
    model = ALIGNNAtomWise(cfg=cfg)
    if variables is None:
        variables = model.init(jax.random.PRNGKey(seed), batch, batch.r,
                               train=False)
    res = atomwise_forward(model, variables, batch, train=False)
    return model, variables, res


def test_dense_model_parity_with_sparse():
    graphs = _graphs(3)
    sp_spec = BucketSpec.tight_for_batch(graphs)
    sp = batch_graphs(graphs, sp_spec, target_width=1)
    dn_spec = dense_spec_for_batch(graphs)
    dn = dense_batch_graphs(graphs, dn_spec, target_width=1)
    n_real = sum(g.num_nodes for g in graphs)
    n_graphs = len(graphs)

    model, variables, res_sp = _model_outputs(sp)
    # same params must drive the dense path (identical parameter tree)
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


def test_dense_param_grad_parity():
    """Training-objective parameter gradients match sparse (E+F loss)."""
    graphs = _graphs(2, seed=3)
    sp = batch_graphs(graphs, BucketSpec.tight_for_batch(graphs))
    dn = dense_batch_graphs(graphs, dense_spec_for_batch(graphs))

    from alignn_tpu.nn.models import (
        ALIGNNAtomWise,
        ALIGNNAtomWiseConfig,
        atomwise_forward,
    )

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=64, embedding_features=32,
        gradwise_weight=1.0, graphwise_weight=1.0)
    model = ALIGNNAtomWise(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(1), sp, sp.r, train=False)

    def loss(params, batch):
        res = atomwise_forward(model, {"params": params["params"]},
                               batch, train=False)
        g_mask = batch.graph_mask
        e = jnp.sum(jnp.abs(res["out"][:, 0] - batch.target[:, 0]) * g_mask)
        f = jnp.sum(jnp.abs(res["grad"] - batch.forces)
                    * batch.node_mask[:, None])
        return e + f

    g_sp = jax.grad(loss)(variables, sp)
    g_dn = jax.grad(loss)(variables, dn)
    flat_sp = jax.tree_util.tree_leaves(g_sp)
    flat_dn = jax.tree_util.tree_leaves(g_dn)
    for a, b in zip(flat_sp, flat_dn):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_dense_degree_overflow_raises():
    graphs = _graphs(1)
    spec = dense_spec_for_batch(graphs, D=4)
    with pytest.raises(ValueError):
        dense_batch_graphs(graphs, spec)


def test_max_in_degree():
    graphs = _graphs(2)
    assert max_in_degree(graphs) == 12


def test_dense_kernel_matches_xla():
    """Pallas dense aggregate vs XLA path: fwd, VJP, grad-of-grad."""
    from alignn_tpu.ops.pallas_dense import (
        _xla_dense_aggregate,
        dense_gated_aggregate,
        fold_mask,
    )

    rng = np.random.default_rng(0)
    M, D, F = 128, 4, 128
    m = jnp.asarray(rng.standard_normal((M * D, F)), jnp.float32)
    bh = jnp.asarray(rng.standard_normal((M * D, F)), jnp.float32)
    mask = jnp.asarray((rng.random(M * D) < 0.8).astype(np.float32))
    mf = fold_mask(m, mask)

    h_k = dense_gated_aggregate(mf, bh, D, True)
    h_x = _xla_dense_aggregate(mf, bh, D)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_x),
                               rtol=1e-5, atol=1e-6)

    def loss_k(m, bh):
        return jnp.sum(dense_gated_aggregate(fold_mask(m, mask),
                                             bh, D, True) ** 2)

    def loss_x(m, bh):
        return jnp.sum(_xla_dense_aggregate(fold_mask(m, mask),
                                            bh, D) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(m, bh)
    gx = jax.grad(loss_x, argnums=(0, 1))(m, bh)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # masked slots get exactly zero gradient (additive fold property)
    np.testing.assert_array_equal(
        np.asarray(gk[0])[np.asarray(mask) == 0], 0.0)

    # grad-of-grad (force-training requirement)
    def gg(fn):
        def inner(m):
            g = jax.grad(lambda mm: jnp.sum(fn(mm, bh)))(m)
            return jnp.sum(g ** 2)

        return jax.grad(inner)(m)

    ggk = gg(lambda mm, b: dense_gated_aggregate(fold_mask(mm, mask),
                                                 b, D, True))
    ggx = gg(lambda mm, b: _xla_dense_aggregate(fold_mask(mm, mask), b, D))
    np.testing.assert_allclose(np.asarray(ggk), np.asarray(ggx),
                               rtol=1e-4, atol=1e-5)


def test_pair_kernel_matches_xla():
    """dense_pair_aggregate Pallas vs XLA: fwd, VJP, grad-of-grad."""
    from alignn_tpu.ops.pallas_dense import (
        C_NODES,
        _xla_pair_aggregate,
        dense_pair_aggregate,
        fold_mask,
    )

    rng = np.random.default_rng(1)
    n, D, F = C_NODES * 2, 5, 128
    m2 = jnp.asarray(rng.standard_normal((n * D * D, F)), jnp.float32)
    bh = jnp.asarray(rng.standard_normal((n * D, F)), jnp.float32)
    em = (rng.random((n, D)) < 0.8).astype(np.float32)
    pairmask = jnp.asarray(
        (em[:, :, None] * em[:, None, :]).reshape(-1))
    mf = fold_mask(m2, pairmask)

    h_k = dense_pair_aggregate(mf, bh, D, True)
    h_x = _xla_pair_aggregate(mf, bh, D)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_x),
                               rtol=1e-5, atol=1e-6)

    def loss(fn):
        def f(m2v, bhv):
            return jnp.sum(fn(fold_mask(m2v, pairmask), bhv, D) ** 2)

        return f

    gk = jax.grad(loss(lambda a, b, d: dense_pair_aggregate(a, b, d, True)),
                  argnums=(0, 1))(m2, bh)
    gx = jax.grad(loss(lambda a, b, d: _xla_pair_aggregate(a, b, d)),
                  argnums=(0, 1))(m2, bh)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    def gg(fn):
        def inner(m2v):
            g = jax.grad(lambda mm: jnp.sum(
                fn(fold_mask(mm, pairmask), bh, D)))(m2v)
            return jnp.sum(g ** 2)

        return jax.grad(inner)(m2)

    ggk = gg(lambda a, b, d: dense_pair_aggregate(a, b, d, True))
    ggx = gg(lambda a, b, d: _xla_pair_aggregate(a, b, d))
    np.testing.assert_allclose(np.asarray(ggk), np.asarray(ggx),
                               rtol=1e-4, atol=1e-5)


def test_pair_bwd_first_class_pin(monkeypatch):
    """pair_aggregate_bwd (the backward-as-a-first-class op) and its
    hand-derived second-order rule, pinned against jax.vjp with random
    cotangents on EVERY output — the grad-of-grad test above only
    drives the u (dm2) cotangent; here v (dbh) and the g-input
    cotangent paths are exercised too.  The opt-in Pallas twins
    (ALIGNN_TPU_PAIR_BWD_KERNEL=1) run in interpret mode."""
    monkeypatch.setenv("ALIGNN_TPU_PAIR_BWD_KERNEL", "1")
    from alignn_tpu.ops.pallas_dense import (
        C_NODES,
        _pallas_pair_bwd2,
        _xla_pair_aggregate,
        _xla_pair_bwd,
        _xla_pair_bwd2,
        pair_aggregate_bwd,
    )

    rng = np.random.default_rng(7)
    n, D, F = C_NODES, 3, 128
    m2 = jnp.asarray(rng.standard_normal((n * D * D, F)), jnp.float32)
    bh = jnp.asarray(rng.standard_normal((n * D, F)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((n * D, F)), jnp.float32)

    # first order: both routes == jax.vjp of the XLA forward
    _, vjp = jax.vjp(lambda a, b: _xla_pair_aggregate(a, b, D), m2, bh)
    dm2_ref, dbh_ref = vjp(g)
    for use_pallas in (False, True):
        dm2, dbh = pair_aggregate_bwd(m2, bh, g, D, use_pallas)
        np.testing.assert_allclose(np.asarray(dm2), np.asarray(dm2_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dbh), np.asarray(dbh_ref),
                                   rtol=1e-4, atol=1e-5)

    # second order: hand-derived rule == jax.vjp of the first-order
    # backward, random cotangents on BOTH outputs
    u = jnp.asarray(rng.standard_normal((n * D * D, F)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n * D, F)), jnp.float32)
    _, vjp2 = jax.vjp(lambda a, b, c: _xla_pair_bwd(a, b, c, D),
                      m2, bh, g)
    refs = vjp2((u, v))
    for impl in (_xla_pair_bwd2,
                 lambda *args: _pallas_pair_bwd2(*args[:5], args[5])):
        outs = impl(m2, bh, g, u, v, D)
        for got, ref in zip(outs, refs):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-5)

    # the custom-vjp wiring end-to-end: grad through pair_aggregate_bwd
    # with a loss that touches dm2, dbh AND flows back into g
    def loss(m2v, bhv, gv, use_pallas):
        dm2, dbh = pair_aggregate_bwd(m2v, bhv, gv, D, use_pallas)
        return (jnp.sum(dm2 * u) + jnp.sum(dbh * v)
                + jnp.sum(dbh ** 2))

    gref = jax.grad(loss, argnums=(0, 1, 2))(m2, bh, g, False)
    gpal = jax.grad(loss, argnums=(0, 1, 2))(m2, bh, g, True)
    for a, b in zip(gpal, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_gated_bwd_first_class_pin(monkeypatch):
    """gated_aggregate_bwd (node/GCN-stage backward-as-a-first-class
    op) and its hand-derived second-order rule, pinned against jax.vjp
    with random cotangents on EVERY output — the grad-of-grad test
    above only drives the u (dm) cotangent; here v (dbh) and the
    g-input cotangent paths are exercised too (the t-collapsed twin of
    test_pair_bwd_first_class_pin)."""
    from alignn_tpu.ops.pallas_dense import (
        _xla_dense_aggregate,
        _xla_gated_bwd,
        _xla_gated_bwd2,
        gated_aggregate_bwd,
    )

    rng = np.random.default_rng(11)
    M, D, F = 64, 5, 128
    m = jnp.asarray(rng.standard_normal((M * D, F)), jnp.float32)
    bh = jnp.asarray(rng.standard_normal((M * D, F)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((M, F)), jnp.float32)

    # first order == jax.vjp of the XLA forward
    _, vjp = jax.vjp(lambda a, b: _xla_dense_aggregate(a, b, D), m, bh)
    dm_ref, dbh_ref = vjp(g)
    dm, dbh = gated_aggregate_bwd(m, bh, g, D)
    np.testing.assert_allclose(np.asarray(dm), np.asarray(dm_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dbh), np.asarray(dbh_ref),
                               rtol=1e-4, atol=1e-5)

    # second order: hand-derived rule == jax.vjp of the first-order
    # backward, random cotangents on BOTH outputs
    u = jnp.asarray(rng.standard_normal((M * D, F)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((M * D, F)), jnp.float32)
    _, vjp2 = jax.vjp(lambda a, b, c: _xla_gated_bwd(a, b, c, D),
                      m, bh, g)
    refs = vjp2((u, v))
    outs = _xla_gated_bwd2(m, bh, g, u, v, D)
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    # the custom-vjp wiring end-to-end: grad through gated_aggregate_bwd
    # with a loss that touches dm, dbh AND flows back into g
    def loss(mv, bhv, gv):
        dmv, dbhv = gated_aggregate_bwd(mv, bhv, gv, D)
        return jnp.sum(dmv * u) + jnp.sum(dbhv * v) + jnp.sum(dbhv ** 2)

    got = jax.grad(loss, argnums=(0, 1, 2))(m, bh, g)

    def loss_ref(mv, bhv, gv):
        dmv, dbhv = _xla_gated_bwd(mv, bhv, gv, D)
        return jnp.sum(dmv * u) + jnp.sum(dbhv * v) + jnp.sum(dbhv ** 2)

    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(m, bh, g)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    # the opt-in routing (ALIGNN_TPU_GATED_BWD_OP=1) is equivalent to
    # the default inline backward through grad-of-grad of the public op
    from alignn_tpu.ops.pallas_dense import dense_gated_aggregate

    def gg(mv):
        gfn = jax.grad(
            lambda mm: jnp.sum(dense_gated_aggregate(mm, bh, D, False)))
        return jnp.sum(gfn(mv) ** 2)

    monkeypatch.setenv("ALIGNN_TPU_GATED_BWD_OP", "0")
    ref_gg = jax.grad(gg)(m)
    monkeypatch.setenv("ALIGNN_TPU_GATED_BWD_OP", "1")
    jax.clear_caches()
    opt_gg = jax.grad(gg)(m)
    jax.clear_caches()
    np.testing.assert_allclose(np.asarray(opt_gg), np.asarray(ref_gg),
                               rtol=1e-4, atol=1e-5)


def test_dense_property_model_matches_sparse():
    """The BatchNorm property model (ALIGNN) on dense == sparse."""
    from alignn_tpu.nn.models import ALIGNN, ALIGNNConfig

    graphs = _graphs(2, seed=13)
    sp = batch_graphs(graphs, BucketSpec.tight_for_batch(graphs),
                      target_width=1)
    dn = dense_batch_graphs(graphs, dense_spec_for_batch(graphs),
                            target_width=1)
    n_graphs = len(graphs)
    cfg = ALIGNNConfig(name="alignn", alignn_layers=1, gcn_layers=1,
                       hidden_features=32, embedding_features=16)
    model = ALIGNN(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(3), sp, train=False)
    out_sp = model.apply(variables, sp, train=False)
    out_dn = model.apply(variables, dn, train=False)
    np.testing.assert_allclose(np.asarray(out_dn)[:n_graphs],
                               np.asarray(out_sp)[:n_graphs],
                               rtol=2e-4, atol=2e-5)


def test_dense_ealignn_matches_sparse():
    """eALIGNN on a dense batch == sparse batch (E/F/S), same params.

    The inner-cutoff soft weights ride the layers' XLA weight branches
    in dense mode; cosines are the node-local dense form."""
    from alignn_tpu.nn.ealignn import (
        eALIGNNAtomWise,
        eALIGNNAtomWiseConfig,
        ealignn_forward,
    )

    graphs = _graphs(2, seed=11)
    sp = batch_graphs(graphs, BucketSpec.tight_for_batch(graphs),
                      target_width=1)
    dn = dense_batch_graphs(graphs, dense_spec_for_batch(graphs),
                            target_width=1)
    n_real = sum(g.num_nodes for g in graphs)
    n_graphs = len(graphs)

    cfg = eALIGNNAtomWiseConfig(
        alignn_layers=1, gcn_layers=1, hidden_features=32,
        embedding_features=16, gradwise_weight=1.0,
        stresswise_weight=0.1, inner_cutoff=4.0)
    model = eALIGNNAtomWise(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(2), sp, sp.frac_coords,
                           train=False)
    res_sp = ealignn_forward(model, variables, sp, train=False)
    res_dn = ealignn_forward(model, variables, dn, train=False)
    np.testing.assert_allclose(
        np.asarray(res_dn["out"])[:n_graphs],
        np.asarray(res_sp["out"])[:n_graphs], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(res_dn["grad"])[:n_real],
        np.asarray(res_sp["grad"])[:n_real], rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(res_dn["stresses"])[:n_graphs],
        np.asarray(res_sp["stresses"])[:n_graphs], rtol=5e-4, atol=5e-5)


def test_dense_calculator_ealignn():
    """The FF Calculator runs eALIGNN on the dense layout (the round-2
    permanent sparse downgrade is gone)."""
    from alignn_tpu.ff.calculator import Calculator
    from alignn_tpu.nn.ealignn import eALIGNNAtomWise, eALIGNNAtomWiseConfig

    cfg = eALIGNNAtomWiseConfig(
        alignn_layers=1, gcn_layers=1, hidden_features=16,
        embedding_features=8, gradwise_weight=1.0, inner_cutoff=4.0)
    model = eALIGNNAtomWise(cfg=cfg)
    atoms = Atoms(lattice_mat=np.eye(3) * 4.1,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    g = build_graph(atoms, cutoff=5.0, max_neighbors=12)
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    variables = model.init(jax.random.PRNGKey(0), batch,
                           batch.frac_coords, train=False)
    common = dict(model=model, variables=variables,
                  config={"neighbor_strategy": "k-nearest",
                          "cutoff": 5.0, "max_neighbors": 12,
                          "model": {"name": "ealignn_atomwise"}})
    rd = Calculator(dense=True, **common).calculate(atoms)
    rs = Calculator(dense=False, **common).calculate(atoms)
    np.testing.assert_allclose(rd["energy"], rs["energy"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rd["forces"], rs["forces"],
                               rtol=1e-4, atol=1e-5)


def test_dense_dp_train_step():
    """Dense batches compose with data parallelism (dense_D is a static
    pytree field, so per-device shards keep the block layout)."""
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.parallel.dp import make_dp_train_step
    from alignn_tpu.parallel.mesh import make_mesh
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state

    graphs = _graphs(8)
    D = max_in_degree(graphs)
    spec = BucketSpec(n_nodes=128, n_edges=128 * D,
                      n_lg_edges=128 * D * D, n_graphs=3, dense_D=D)
    shards = [dense_batch_graphs(graphs[i * 2:(i + 1) * 2], spec,
                                 target_width=1) for i in range(4)]
    batch = jax.tree.map(lambda *xs: np.stack(xs), *shards)
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=32, embedding_features=16,
        gradwise_weight=1.0, graphwise_weight=1.0)
    model = ALIGNNAtomWise(cfg=cfg)
    state = create_train_state(model, shards[0],
                               build_optimizer("adamw", 1e-3, 1e-5))
    step = make_dp_train_step(model, make_mesh(4), criterion="l1")
    _, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))


def test_dense_calculator_matches_sparse():
    """FF Calculator with dense=True returns the sparse path's E/F/S."""
    from alignn_tpu.ff.calculator import Calculator
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8, gradwise_weight=1.0,
        stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    atoms = Atoms(lattice_mat=np.eye(3) * 4.1,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    g = build_graph(atoms, cutoff=5.0, max_neighbors=12)
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    common = dict(model=model, variables=variables,
                  config={"neighbor_strategy": "k-nearest",
                          "cutoff": 5.0, "max_neighbors": 12})
    sparse_calc = Calculator(dense=False, **common)
    dense_calc = Calculator(dense=True, **common)
    rs = sparse_calc.calculate(atoms)
    rd = dense_calc.calculate(atoms)
    assert dense_calc.dense, "dense path should not have fallen back"
    assert dense_calc._spec.dense_D > 0
    np.testing.assert_allclose(rd["energy"], rs["energy"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rd["forces"], rs["forces"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(rd["stress"], rs["stress"],
                               rtol=1e-4, atol=1e-5)
    # bucket reuse on a small perturbation (same compile)
    fn1 = dense_calc._fn
    a2 = atoms.with_positions(
        cart_coords=atoms.cart_coords + [[0.03, 0, 0], [0, 0, 0]])
    dense_calc.calculate(a2)
    assert dense_calc._fn is fn1


def test_dense_calculator_asymmetric_fallback_is_per_call(monkeypatch):
    """One asymmetric structure detours to sparse for THAT call only;
    the next symmetric structure runs dense again (and invariant-type
    ValueErrors are NOT swallowed)."""
    import alignn_tpu.graph.dense as gd
    from alignn_tpu.ff.calculator import Calculator
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8, gradwise_weight=1.0)
    model = ALIGNNAtomWise(cfg=cfg)
    atoms = Atoms(lattice_mat=np.eye(3) * 4.1,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    g = build_graph(atoms, cutoff=5.0, max_neighbors=12)
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    calc = Calculator(model=model, variables=variables, dense=True,
                      config={"neighbor_strategy": "k-nearest",
                              "cutoff": 5.0, "max_neighbors": 12})

    real_batcher = gd.dense_batch_graphs
    fail = {"n": 1}

    def flaky(*a, **kw):
        if fail["n"]:
            fail["n"] -= 1
            raise gd.AsymmetricEdgesError("injected asymmetry")
        return real_batcher(*a, **kw)

    monkeypatch.setattr(gd, "dense_batch_graphs", flaky)
    r1 = calc.calculate(atoms)                 # falls back THIS call
    assert np.isfinite(r1["energy"])
    assert calc.dense, "fallback must not permanently disable dense"
    r2 = calc.calculate(atoms)                 # dense again
    assert calc._spec is not None and calc._spec.dense_D > 0
    np.testing.assert_allclose(r2["energy"], r1["energy"],
                               rtol=1e-4, atol=1e-5)
    # invariant violations must propagate, not downgrade
    def broken(*a, **kw):
        raise ValueError("inconsistent dense spec")

    monkeypatch.setattr(gd, "dense_batch_graphs", broken)
    with pytest.raises(ValueError):
        calc.calculate(atoms)


def test_dense_calculator_config_default():
    """dense_neighborhoods in the training config activates the layout."""
    from alignn_tpu.ff.calculator import Calculator
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8, gradwise_weight=1.0)
    model = ALIGNNAtomWise(cfg=cfg)
    atoms = Atoms(lattice_mat=np.eye(3) * 4.1,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    g = build_graph(atoms, cutoff=5.0, max_neighbors=12)
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    calc = Calculator(model=model, variables=variables,
                      config={"neighbor_strategy": "k-nearest",
                              "cutoff": 5.0, "max_neighbors": 12,
                              "dense_neighborhoods": True})
    assert calc.dense
    res = calc.calculate(atoms)
    assert np.isfinite(res["energy"])
