"""2-D (data x graph) mesh training step: parity vs single-device.

One dp_gp step on a 2x2 CPU mesh must produce the same parameter update
as averaging the two micro-batches' single-device gradients — this pins
down the psum-transpose scaling through the nested force grad-of-grad.
"""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def problem():
    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)

    def graphs_for(seed):
        out = []
        r = np.random.default_rng(seed)
        for i in range(2):
            atoms = Atoms(
                lattice_mat=np.eye(3) * (4.0 + 0.1 * i),
                frac_coords=np.array([[0, 0, 0], [0.5, 0.5, 0.5]])
                + 0.01 * r.standard_normal((2, 3)),
                elements=["Na", "Cl"])
            g = build_graph(atoms, cutoff=6.0, max_neighbors=12)
            g.target = np.array([r.standard_normal()])
            g.forces = r.standard_normal((2, 3)) * 0.05
            g.stress = np.eye(3) * 0.01
            out.append(g)
        return out

    all_graphs = graphs_for(1) + graphs_for(2)
    spec = BucketSpec.for_graphs(all_graphs, batch_size=2)
    micro = [batch_graphs(graphs_for(1), spec),
             batch_graphs(graphs_for(2), spec)]
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8,
        gradwise_weight=1.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    tx = build_optimizer("adamw", 1e-3, 0.0)
    state = create_train_state(model, micro[0], tx)
    return model, state, micro


def test_dp_gp_matches_averaged_single_device(problem):
    from alignn_tpu.parallel.dp_gp import make_dp_gp_train_step
    from alignn_tpu.train.losses import atomwise_loss
    from alignn_tpu.train.state import _forward_and_loss
    from jax.sharding import Mesh

    model, state, micro = problem
    assert len(jax.devices()) >= 4
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("data", "graph"))
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0), *micro)
    step = make_dp_gp_train_step(model.cfg, mesh, donate=False)
    new_state, losses = step(state, stacked)

    # reference: average the two single-device gradients
    import optax

    def loss_for(batch):
        def f(params):
            loss, (ls, _res, _bs) = _forward_and_loss(
                model, params, state.batch_stats, batch, "l1", False,
                train=True)
            return loss, ls
        return jax.grad(f, has_aux=True)(state.params)

    g1, l1 = loss_for(micro[0])
    g2, l2 = loss_for(micro[1])
    grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)
    updates, _ = state.tx.update(grads, state.opt_state, state.params)
    ref_params = optax.apply_updates(state.params, updates)

    flat_new = jax.tree_util.tree_leaves(new_state.params)
    flat_ref = jax.tree_util.tree_leaves(ref_params)
    for a, b in zip(flat_new, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-6)
    ref_loss = (float(l1["loss"]) + float(l2["loss"])) / 2
    assert float(losses["loss"]) == pytest.approx(ref_loss, rel=2e-4)


def test_trainer_with_2d_mesh(tmp_path, problem):
    """train_model_dp honors config.mesh_shape={'data':2,'graph':2}."""
    from alignn_tpu.config import TrainingConfig
    from alignn_tpu.data.dataset import GraphDataset
    from alignn_tpu.data.loader import BucketedLoader
    from alignn_tpu.parallel.dp import train_model_dp

    model, _state, micro = problem
    # rebuild a dataset of graphs from the fixture's micro batches is
    # awkward; construct fresh graphs instead
    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.graph.build import build_graph
    import numpy as np

    rng = np.random.default_rng(0)
    graphs, ids = [], []
    for i in range(8):
        atoms = Atoms(
            lattice_mat=np.eye(3) * (4.0 + 0.05 * i),
            frac_coords=np.array([[0, 0, 0], [0.5, 0.5, 0.5]])
            + 0.01 * rng.standard_normal((2, 3)),
            elements=["Na", "Cl"])
        g = build_graph(atoms, cutoff=6.0, max_neighbors=12)
        g.target = np.array([rng.standard_normal()])
        g.forces = rng.standard_normal((2, 3)) * 0.05
        g.stress = np.eye(3) * 0.01
        graphs.append(g)
        ids.append(f"s{i}")
    ds = GraphDataset(graphs=graphs, ids=ids)
    tr = BucketedLoader(ds, batch_size=2, shuffle=True, num_shards=2)
    va = BucketedLoader(ds, batch_size=2, shuffle=False)
    cfg = TrainingConfig(
        epochs=2, batch_size=2, output_dir=str(tmp_path),
        learning_rate=1e-3, mesh_shape={"data": 2, "graph": 2},
        model=model.cfg)
    summary = train_model_dp(cfg, tr, va, n_devices=4)
    assert np.isfinite(summary["best_val_loss"])
