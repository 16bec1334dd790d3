"""Exercise the less-traveled config branches: cutoff envelopes (both
modes), link functions, alternative training criteria."""

import dataclasses

import numpy as np
import pytest

from alignn_tpu.chem.atoms import Atoms


@pytest.fixture(scope="module")
def batch():
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph

    atoms = Atoms(lattice_mat=np.eye(3) * 4.1,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    g = build_graph(atoms, neighbor_strategy="radius_graph", cutoff=5.0)
    g.target = np.array([0.5])
    g.forces = np.zeros((2, 3))
    g.stress = np.eye(3) * 0.01
    return batch_graphs([g], BucketSpec.tight_for_batch([g]))


@pytest.mark.parametrize("multiply", [True, False])
def test_cutoff_function_modes(batch, multiply):
    import jax

    from alignn_tpu.nn.models import (
        ALIGNNAtomWise,
        ALIGNNAtomWiseConfig,
        atomwise_forward,
    )

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8, gradwise_weight=1.0,
        use_cutoff_function=True, multiply_cutoff=multiply,
        inner_cutoff=4.0)
    model = ALIGNNAtomWise(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    res = atomwise_forward(model, variables, batch, train=False)
    assert np.isfinite(np.asarray(res["out"])).all()
    assert np.isfinite(np.asarray(res["grad"])).all()


@pytest.mark.parametrize("link", ["log", "logit"])
def test_link_functions_property_model(batch, link):
    import jax

    from alignn_tpu.nn.models import ALIGNN, ALIGNNConfig

    cfg = ALIGNNConfig(name="alignn", alignn_layers=1, gcn_layers=1,
                       hidden_features=16, embedding_features=8,
                       link=link)
    model = ALIGNN(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = np.asarray(model.apply(variables, batch, train=False))
    assert np.isfinite(out).all()
    if link == "log":
        assert (out > 0).all()  # exp link
    else:
        assert ((out > 0) & (out < 1)).all()  # sigmoid link


@pytest.mark.parametrize("criterion", ["mse", "poisson", "zig"])
def test_alternative_criteria_train_step(batch, criterion):
    import jax

    from alignn_tpu.nn.models import ALIGNN, ALIGNNConfig
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state, make_train_step

    cfg = ALIGNNConfig(name="alignn", alignn_layers=1, gcn_layers=1,
                       hidden_features=16, embedding_features=8)
    model = ALIGNN(cfg=cfg)
    tx = build_optimizer("sgd", 1e-3, 0.0)
    state = create_train_state(model, batch, tx)
    step = make_train_step(model, criterion=criterion, donate=False)
    state, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))
