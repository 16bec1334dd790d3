"""Model-layer tests: EGGC semantics vs a plain-numpy reference,
padding invariance, masked BatchNorm correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from alignn_tpu.chem import Atoms
from alignn_tpu.graph import BucketSpec, batch_graphs, build_graph
from alignn_tpu.nn import (
    ALIGNN,
    ALIGNNAtomWise,
    ALIGNNAtomWiseConfig,
    ALIGNNConfig,
    EdgeGatedGraphConv,
    MaskedBatchNorm,
    atomwise_forward,
)

SI = {
    "lattice_mat": [[2.715, 2.715, 0], [0, 2.715, 2.715], [2.715, 0, 2.715]],
    "coords": [[0, 0, 0], [0.25, 0.25, 0.25]],
    "elements": ["Si", "Si"],
    "cartesian": False,
}


def _rng(seed=0):
    return jax.random.PRNGKey(seed)


def _numpy_lin(p, v):
    return v @ np.asarray(p["kernel"]) + np.asarray(p["bias"])


def _numpy_layernorm(p, v, eps=1e-5):
    mean = v.mean(-1, keepdims=True)
    var = ((v - mean) ** 2).mean(-1, keepdims=True)
    return (v - mean) / np.sqrt(var + eps) * np.asarray(
        p["scale"]) + np.asarray(p["bias"])


def _silu(v):
    return v / (1 + np.exp(-v))


def test_eggc_matches_numpy_reference():
    """Per-layer parity: vectorized segment-op EGGC == literal loop math.

    The literal loop implements exactly the documented DGL semantics of
    the reference conv (alignn_atomwise.py:157-208), so this is the
    per-layer allclose gate of SURVEY.md section 4.
    """
    rng = np.random.RandomState(0)
    n, e, f = 5, 12, 8
    src = rng.randint(0, n, e).astype(np.int32)
    dst = rng.randint(0, n, e).astype(np.int32)
    x = rng.randn(n, f).astype(np.float32)
    ee = rng.randn(e, f).astype(np.float32)

    mod = EdgeGatedGraphConv(features=f, norm="layernorm")
    variables = mod.init(_rng(), jnp.asarray(x), jnp.asarray(ee),
                         jnp.asarray(src), jnp.asarray(dst))
    x_out, e_out = mod.apply(variables, jnp.asarray(x), jnp.asarray(ee),
                             jnp.asarray(src), jnp.asarray(dst))

    p = jax.tree.map(np.asarray, variables["params"])
    m = (_numpy_lin(p["src_gate"], x)[src]
         + _numpy_lin(p["dst_gate"], x)[dst]
         + _numpy_lin(p["edge_gate"], ee))
    sigma = 1.0 / (1.0 + np.exp(-m))
    bh = _numpy_lin(p["dst_update"], x)
    num = np.zeros((n, f))
    den = np.zeros((n, f))
    for i in range(e):
        num[dst[i]] += bh[src[i]] * sigma[i]
        den[dst[i]] += sigma[i]
    h = num / (den + 1e-6)
    x_ref = x + _silu(_numpy_layernorm(
        p["norm_nodes"], _numpy_lin(p["src_update"], x) + h))
    e_ref = ee + _silu(_numpy_layernorm(p["norm_edges"], m))

    np.testing.assert_allclose(np.asarray(x_out), x_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_out), e_ref, atol=1e-5)


def _make_batch(files_or_atoms, spec=None, **kw):
    graphs = []
    for a in files_or_atoms:
        if isinstance(a, str):
            a = Atoms.from_poscar(a)
        g = build_graph(a)
        g.target = np.array([1.5])
        graphs.append(g)
    if spec is None:
        spec = BucketSpec.tight_for_batch(graphs)
    return batch_graphs(graphs, spec, **kw)


def test_padding_invariance_atomwise(sample_poscars):
    """Outputs on real slots must not depend on pad amounts."""
    atoms = [Atoms.from_poscar(f) for f in sample_poscars[:2]]
    graphs = [build_graph(a) for a in atoms]
    tight = BucketSpec.tight_for_batch(graphs)
    loose = BucketSpec(
        n_nodes=tight.n_nodes + 64, n_edges=tight.n_edges + 512,
        n_lg_edges=tight.n_lg_edges + 2048, n_graphs=tight.n_graphs + 3)

    cfg = ALIGNNAtomWiseConfig(alignn_layers=2, gcn_layers=2,
                               hidden_features=32, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg)
    b1 = jax.tree.map(jnp.asarray, batch_graphs(graphs, tight))
    b2 = jax.tree.map(jnp.asarray, batch_graphs(graphs, loose))
    variables = model.init(_rng(), b1, b1.r)
    r1 = atomwise_forward(model, variables, b1)
    r2 = atomwise_forward(model, variables, b2)

    n_real = sum(g.num_nodes for g in graphs)
    np.testing.assert_allclose(np.asarray(r1["out"][:2]),
                               np.asarray(r2["out"][:2]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r1["grad"][:n_real]),
                               np.asarray(r2["grad"][:n_real]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r1["stresses"][:2]),
                               np.asarray(r2["stresses"][:2]), atol=2e-5)
    # pad-lane forces are exactly zero
    assert np.abs(np.asarray(r2["grad"][n_real:])).max() == 0.0


def test_padding_invariance_property_model(sample_poscars):
    """BatchNorm model: masked stats make outputs pad-independent."""
    atoms = [Atoms.from_poscar(f) for f in sample_poscars[:2]]
    graphs = [build_graph(a) for a in atoms]
    tight = BucketSpec.tight_for_batch(graphs)
    loose = BucketSpec(
        n_nodes=tight.n_nodes + 40, n_edges=tight.n_edges + 256,
        n_lg_edges=tight.n_lg_edges + 1024, n_graphs=tight.n_graphs + 2)
    cfg = ALIGNNConfig(alignn_layers=2, gcn_layers=2, hidden_features=32)
    model = ALIGNN(cfg)
    b1 = jax.tree.map(jnp.asarray, batch_graphs(graphs, tight))
    b2 = jax.tree.map(jnp.asarray, batch_graphs(graphs, loose))
    variables = model.init(_rng(), b1)
    out1, _ = model.apply(variables, b1, mutable=["batch_stats"])
    out2, _ = model.apply(variables, b2, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out1[:2]), np.asarray(out2[:2]),
                               atol=2e-5)


def test_masked_batchnorm_matches_unmasked():
    rng = np.random.RandomState(1)
    x = rng.randn(10, 4).astype(np.float32)
    pad = np.zeros((6, 4), np.float32)
    xp = np.concatenate([x, pad])
    mask = np.concatenate([np.ones(10), np.zeros(6)]).astype(np.float32)

    bn = MaskedBatchNorm()
    v = bn.init(_rng(), jnp.asarray(x))
    y_plain, s1 = bn.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    y_mask, s2 = bn.apply(v, jnp.asarray(xp), mask=jnp.asarray(mask),
                          mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_plain),
                               np.asarray(y_mask)[:10], atol=1e-5)
    # running stats identical
    np.testing.assert_allclose(
        np.asarray(s1["batch_stats"]["mean"]),
        np.asarray(s2["batch_stats"]["mean"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1["batch_stats"]["var"]),
        np.asarray(s2["batch_stats"]["var"]), atol=1e-6)


def test_batchnorm_running_stats_torch_semantics():
    """Momentum-0.1 EMA with unbiased variance, torch BatchNorm1d parity."""
    rng = np.random.RandomState(2)
    x = rng.randn(32, 3).astype(np.float32)
    bn = MaskedBatchNorm()
    v = bn.init(_rng(), jnp.asarray(x))
    _, s = bn.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    mean = x.mean(0)
    var_unbiased = x.var(0, ddof=1)
    np.testing.assert_allclose(np.asarray(s["batch_stats"]["mean"]),
                               0.1 * mean, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s["batch_stats"]["var"]),
                               0.9 * 1.0 + 0.1 * var_unbiased, atol=1e-5)


def test_alignn_link_and_classification(sample_poscars):
    b = _make_batch(sample_poscars[:2])
    b = jax.tree.map(jnp.asarray, b)
    # log link: positive outputs
    cfg = ALIGNNConfig(alignn_layers=1, gcn_layers=1, hidden_features=16,
                       link="log")
    model = ALIGNN(cfg)
    v = model.init(_rng(), b)
    out, _ = model.apply(v, b, mutable=["batch_stats"])
    assert (np.asarray(out) > 0).all()
    # classification: log-probs over 2 classes
    cfg = ALIGNNConfig(alignn_layers=1, gcn_layers=1, hidden_features=16,
                       classification=True, num_classes=2)
    model = ALIGNN(cfg)
    v = model.init(_rng(), b)
    out, _ = model.apply(v, b, mutable=["batch_stats"])
    assert out.shape[-1] == 2
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0,
                               atol=1e-5)


def test_atomwise_heads(sample_poscars):
    graphs = []
    for f in sample_poscars[:2]:
        g = build_graph(Atoms.from_poscar(f))
        g.target = np.array([1.0])
        g.atomwise_target = np.random.RandomState(0).rand(g.num_nodes, 3)
        g.additional = np.random.RandomState(1).rand(5)
        graphs.append(g)
    spec = BucketSpec.tight_for_batch(graphs)
    b = batch_graphs(graphs, spec, atomwise_width=3, additional_width=5)
    b = jax.tree.map(jnp.asarray, b)
    cfg = ALIGNNAtomWiseConfig(
        alignn_layers=1, gcn_layers=1, hidden_features=16,
        atomwise_output_features=3, atomwise_weight=1.0,
        additional_output_features=5, additional_output_weight=1.0,
        stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg)
    v = model.init(_rng(), b, b.r)
    res = atomwise_forward(model, v, b)
    assert res["atomwise_pred"].shape == (b.num_nodes_padded, 3)
    assert res["additional"].shape == (b.num_graphs_padded, 5)
    assert res["stresses"].shape == (b.num_graphs_padded, 3, 3)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(res))
