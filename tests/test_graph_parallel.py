"""Edge-partitioned graph parallelism: parity vs single-device forward.

Runs the gp forward on a 4-device CPU mesh and checks outputs (energy,
forces, stress) match the unpartitioned atomwise forward — the
correctness bar for the halo-exchange + psum message passing.
"""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def setup():
    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    graphs = []
    for i in range(2):
        atoms = Atoms(
            lattice_mat=np.eye(3) * (4.0 + 0.1 * i),
            frac_coords=np.array([[0, 0, 0], [0.5, 0.5, 0.5]])
            + 0.01 * rng.standard_normal((2, 3)),
            elements=["Na", "Cl"])
        g = build_graph(atoms, cutoff=6.0, max_neighbors=12)
        g.target = np.array([1.0])
        g.forces = np.zeros((2, 3))
        g.stress = np.eye(3) * 0.01
        graphs.append(g)
    spec = BucketSpec.for_graphs(graphs, batch_size=2)
    batch = batch_graphs(graphs, spec)
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=2, gcn_layers=1,
        hidden_features=16, embedding_features=8,
        gradwise_weight=1.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    tx = build_optimizer("adamw", 1e-3, 0.0)
    state = create_train_state(model, batch, tx)
    return model, state, batch


def test_gp_forward_parity(setup):
    from alignn_tpu.nn.models import atomwise_forward
    from alignn_tpu.parallel.graph_parallel import (
        GRAPH_AXIS,
        check_divisible,
        make_gp_forward,
    )
    from alignn_tpu.parallel.mesh import make_mesh

    model, state, batch = setup
    n_dev = 4
    assert len(jax.devices()) >= n_dev
    check_divisible(batch, n_dev)
    mesh = make_mesh(n_dev, axis_names=(GRAPH_AXIS,))
    fwd = make_gp_forward(model.cfg, mesh, state.variables())
    out_gp, forces_gp, stress_gp = jax.device_get(fwd(batch))

    res = atomwise_forward(model, state.variables(), batch, train=False)
    np.testing.assert_allclose(np.asarray(out_gp),
                               np.asarray(res["out"]), rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(forces_gp),
                               np.asarray(res["grad"]), rtol=2e-3,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(stress_gp),
                               np.asarray(res["stresses"]), rtol=2e-3,
                               atol=2e-5)


def test_divisibility_guard(setup):
    from alignn_tpu.parallel.graph_parallel import check_divisible

    _model, _state, batch = setup
    with pytest.raises(ValueError):
        check_divisible(batch, 7)
