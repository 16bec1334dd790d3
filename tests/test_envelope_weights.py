"""Strictly continuous potential: envelope-weighted aggregation.

`ALIGNNAtomWiseConfig.envelope_edge_weights` (TPU-framework extension;
see the config docstring for why every reference variant is
discontinuous at a neighbor-list boundary).
"""

import numpy as np
import pytest

from alignn_tpu.chem.atoms import Atoms
from alignn_tpu.graph.batch import BucketSpec, batch_graphs
from alignn_tpu.graph.build import build_graph
from alignn_tpu.nn.models import (
    ALIGNNAtomWise,
    ALIGNNAtomWiseConfig,
    atomwise_forward,
)

CUT = 4.5


def _cell(scale=1.0, jitter_seed=0):
    rng = np.random.default_rng(jitter_seed)
    fcc = np.array([[0, 0, 0], [0.5, 0.5, 0],
                    [0.5, 0, 0.5], [0, 0.5, 0.5]])
    frac = fcc + 0.01 * rng.standard_normal((4, 3))
    return Atoms(lattice_mat=np.eye(3) * 4.05 * scale,
                 frac_coords=frac, elements=["Al"] * 4)


def _cfg(envelope: bool):
    return ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=32, embedding_features=16,
        gradwise_weight=1.0, stresswise_weight=0.1,
        envelope_edge_weights=envelope,
        envelope_cutoff=CUT if envelope else 0.0)


def _energy_scan(envelope: bool):
    """Per-atom energy over a strain scan crossing a shell boundary.

    fcc Al a=4.05: the 3rd shell sits at ~4.96 A * scale; scanning
    scale 0.88 -> 0.93 sweeps it through the 4.5 A cutoff, so the edge
    count changes inside the scan."""
    import jax

    cfg = _cfg(envelope)
    model = ALIGNNAtomWise(cfg=cfg)
    scales = np.linspace(0.88, 0.93, 26)
    graphs = [build_graph(_cell(s), neighbor_strategy="radius_graph",
                          cutoff=CUT) for s in scales]
    spec = BucketSpec(
        n_nodes=max(g.num_nodes for g in graphs) + 4,
        n_edges=max(g.num_edges for g in graphs) + 4,
        n_lg_edges=max(g.num_lg_edges for g in graphs) + 4,
        n_graphs=2)
    b0 = batch_graphs([graphs[0]], spec)
    variables = jax.jit(
        lambda r, b: model.init(r, b, b.r, train=False))(
        jax.random.PRNGKey(0), b0)

    @jax.jit
    def e_fn(batch):
        res = atomwise_forward(model, variables, batch, train=False)
        return res["out"][0, 0]

    es, counts = [], []
    for g in graphs:
        b = batch_graphs([g], spec)
        es.append(float(jax.device_get(e_fn(b))))
        counts.append(g.num_edges)
    return np.array(es), np.array(counts)


def test_edge_count_changes_inside_scan():
    _es, counts = _energy_scan(envelope=True)
    assert len(set(counts.tolist())) > 1, \
        "scan must cross a neighbor-shell boundary to test continuity"


def test_envelope_model_is_continuous_across_topology_change():
    """Energy steps across edge-count changes stay at f32-noise level
    (measured 3e-7 on this scan) — no topology jump.  The contrast
    evidence for the STANDARD model's discontinuity is the trained
    radius-Si potential's EOS/phonon noise (BENCH_NOTES round 5:
    residual 3.6e-2 eV, unstable FD phonons), not a random-init scan —
    at random init the readout is nearly flat and f32 rounding
    dominates both variants."""
    es, counts = _energy_scan(envelope=True)
    d = np.abs(np.diff(es))
    change = np.diff(counts) != 0
    assert change.any()
    assert d[change].max() < 1e-5, d[change].max()


def test_forces_finite_and_conservative_shape():
    import jax

    cfg = _cfg(True)
    model = ALIGNNAtomWise(cfg=cfg)
    g = build_graph(_cell(0.9), neighbor_strategy="radius_graph",
                    cutoff=CUT)
    g.target = np.array([0.0])
    b = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    variables = jax.jit(
        lambda r, bb: model.init(r, bb, bb.r, train=False))(
        jax.random.PRNGKey(0), b)
    res = atomwise_forward(model, variables, b, train=False)
    assert np.isfinite(np.asarray(res["grad"])).all()
    assert np.isfinite(np.asarray(res["stresses"])).all()
    # envelope weights are differentiable: near-cutoff bonds carry
    # nonzero force contributions through d(envelope)/dr
    assert np.abs(np.asarray(res["grad"])).max() > 0


def test_dense_layout_rejected():
    import jax

    from alignn_tpu.graph.dense import dense_batch_graphs, \
        dense_spec_for_batch

    cfg = _cfg(True)
    model = ALIGNNAtomWise(cfg=cfg)
    g = build_graph(_cell(1.0), cutoff=8.0, max_neighbors=12)
    db = dense_batch_graphs([g], dense_spec_for_batch([g]))
    with pytest.raises(ValueError, match="sparse layout"):
        model.init(jax.random.PRNGKey(0), db, db.r, train=False)


def test_train_step_finite_with_near_cutoff_bond():
    """Adversarial numerics: a bond a hair inside the cutoff gives pair
    weights ~1e-9; the soft-weight aggregation epsilon (1e-3 in
    envelope mode, layers.soft_agg_eps) must keep the force-training
    grad-of-grad finite (1e-6 overflowed f32 — device NaN at epoch 2)."""
    import jax

    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state, \
        make_train_step

    # linear chain with one neighbor RIGHT at the cutoff boundary
    lat = np.eye(3) * 30.0
    cart = np.array([[0.0, 0, 0], [2.3, 0, 0], [4.49995, 0, 0],
                     [6.8, 0, 0]])
    atoms = Atoms(lattice_mat=lat, frac_coords=cart @ np.linalg.inv(lat),
                  elements=["Si"] * 4)
    g = build_graph(atoms, neighbor_strategy="radius_graph", cutoff=CUT)
    g.target = np.array([0.1])
    g.forces = np.zeros((4, 3))
    g.stress = np.eye(3) * 0.01
    blen = np.linalg.norm(g.r, axis=1)
    assert (np.abs(blen - CUT) < 1e-3).any(), "need a near-cutoff bond"
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    cfg = _cfg(True)
    model = ALIGNNAtomWise(cfg=cfg)
    tx = build_optimizer("adamw", 1e-3, 0.0)
    state = create_train_state(model, batch, tx)
    step = make_train_step(model, criterion="l1", donate=False)
    for _ in range(3):
        state, losses = step(state, batch)
    fetched = jax.device_get(losses)
    assert np.isfinite(fetched["loss"]), fetched
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    assert all(np.isfinite(np.asarray(p)).all() for p in leaves)
