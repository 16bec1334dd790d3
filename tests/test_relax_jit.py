"""Batched on-device FIRE relaxation."""

import numpy as np
import pytest

from alignn_tpu.chem.atoms import Atoms


@pytest.fixture(scope="module")
def model_vars():
    import jax

    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8, gradwise_weight=1.0,
        stresswise_weight=0.0)
    model = ALIGNNAtomWise(cfg=cfg)
    probe = Atoms(lattice_mat=np.eye(3) * 4.1,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    g = build_graph(probe, neighbor_strategy="radius_graph", cutoff=5.0)
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    return model, variables


def test_batch_relax_reduces_forces(model_vars):
    from alignn_tpu.ff.relax_jit import batch_relax

    model, variables = model_vars
    rng = np.random.default_rng(0)
    structs = []
    for i in range(4):
        frac = np.array([[0, 0, 0], [0.5, 0.5, 0.5]]) \
            + 0.04 * rng.standard_normal((2, 3))
        structs.append(Atoms(lattice_mat=np.eye(3) * 4.1,
                             frac_coords=frac,
                             elements=["Na", "Cl"]))
    relaxed, energies, fmaxes = batch_relax(
        model, variables, structs, fmax=1e-4, max_steps=50,
        chunk_steps=10, cutoff=5.0)
    assert len(relaxed) == 4
    assert np.isfinite(energies).all()
    # forces decreased for every structure vs the initial geometry
    from alignn_tpu.ff.calculator import Calculator

    calc = Calculator(model=model, variables=variables,
                      config={"neighbor_strategy": "radius_graph",
                              "cutoff": 5.0})
    for a0, a1, fm in zip(structs, relaxed, fmaxes):
        f0 = np.abs(calc.get_forces(a0)).max()
        f1 = np.abs(calc.get_forces(a1)).max()
        assert f1 <= f0 + 1e-6, (f0, f1)
        assert np.isfinite(fm)
