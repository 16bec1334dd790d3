"""Coverage for the remaining user-facing surfaces: ForceField driver,
dual-model iCalculator, predict CLI listing, profiler, config system."""

import json
import os

import numpy as np
import pytest

from alignn_tpu.chem.atoms import Atoms


@pytest.fixture(scope="module")
def tiny_model():
    import jax

    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8, gradwise_weight=1.0,
        stresswise_weight=0.1, atomwise_output_features=2,
        additional_output_features=4, additional_output_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    probe = Atoms(lattice_mat=np.eye(3) * 4.0,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    g = build_graph(probe, cutoff=5.0, max_neighbors=12)
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    return model, variables


@pytest.fixture(scope="module")
def nacl():
    return Atoms(lattice_mat=np.eye(3) * 4.1,
                 frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                 elements=["Na", "Cl"])


def test_forcefield_driver(tmp_path, tiny_model, nacl):
    from alignn_tpu.ff.calculator import Calculator
    from alignn_tpu.ff.forcefield import ForceField

    model, variables = tiny_model
    calc = Calculator(model=model, variables=variables,
                      config={"neighbor_strategy": "k-nearest",
                              "cutoff": 5.0, "max_neighbors": 12})
    ff = ForceField(nacl, calculator=calc, dirname=str(tmp_path))
    e = ff.unrelaxed_atoms()
    assert np.isfinite(e)
    atoms, energy = ff.optimize_atoms(fmax=0.5, steps=3,
                                      optimize_lattice=False)
    assert np.isfinite(energy)
    assert os.path.exists(os.path.join(str(tmp_path), "opt.traj.json"))
    _a, log = ff.run_nve_velocity_verlet(steps=3, timestep_fs=0.5)
    assert np.isfinite(log.rows[-1]["etot"])
    assert os.path.exists(os.path.join(str(tmp_path), "alignn_ff.log"))


def test_icalculator_dual_model(tiny_model, nacl):
    from alignn_tpu.ff.calculator import Calculator, iCalculator

    model, variables = tiny_model
    cfgd = {"neighbor_strategy": "k-nearest", "cutoff": 5.0,
            "max_neighbors": 12}
    ic = iCalculator(model=model, variables=variables, config=cfgd,
                     props=["p1", "p2", "gap_x", "p4"])
    # wire the property calculator manually (same tiny model)
    ic._prop_calc = Calculator(model=model, variables=variables,
                               config=cfgd)
    res = ic.calculate(nacl)
    assert np.isfinite(res["energy"])
    assert "charges" in res and len(res["charges"]) == 2
    assert "magmoms" in res
    assert "p1" in res and np.isfinite(res["p1"])
    # gap-like props clamp at zero
    assert res["gap_x"] >= 0.0


def test_predict_cli_list_models(capsys):
    from alignn_tpu.cli.predict import main

    main(["--list_models"])
    out = capsys.readouterr().out
    assert "jv_formation_energy_peratom_alignn" in out
    assert len(out.strip().splitlines()) > 50


def test_profiler_profile_step(tiny_model, tmp_path):
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.profiler import memory_stats, profile_step
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state, make_train_step

    model, _variables = tiny_model
    probe = Atoms(lattice_mat=np.eye(3) * 4.0,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    g = build_graph(probe, cutoff=5.0)
    g.target = np.array([1.0])
    g.forces = np.zeros((2, 3))
    g.stress = np.eye(3) * 0.01
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    tx = build_optimizer("adamw", 1e-3, 0.0)
    state = create_train_state(model, batch, tx)
    step = make_train_step(model, donate=False)
    result = profile_step(step, state, batch, wait=1, warmup=1, active=2,
                          logdir=None, edges_per_batch=100)
    assert result["step_time_s"] > 0
    assert result["edges_per_s"] > 0
    assert isinstance(memory_stats(), dict)


def test_config_env_override(monkeypatch):
    from alignn_tpu.config import TrainingConfig

    monkeypatch.setenv("ALIGNN_TPU_EPOCHS", "7")
    monkeypatch.setenv("ALIGNN_TPU_CRITERION", "l1")
    cfg = TrainingConfig()
    assert cfg.epochs == 7
    assert cfg.criterion == "l1"


def test_config_rejects_unknown_keys():
    from alignn_tpu.config import TrainingConfig

    with pytest.raises(ValueError):
        TrainingConfig.from_dict({"epochs": 2, "no_such_flag": True})


def test_zoo_registry_shapes():
    from alignn_tpu.zoo import get_all_models

    reg = get_all_models()
    assert len(reg) >= 50
    for name, meta in list(reg.items())[:5]:
        assert meta["url"].startswith("https://")
        assert meta["output_features"] >= 1


def test_loader_prefetch_deterministic(tmp_path):
    """Background-prefetch iteration yields identical batches to the
    synchronous path (order and content)."""
    import numpy as np

    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.data.dataset import GraphDataset
    from alignn_tpu.data.loader import BucketedLoader
    from alignn_tpu.graph.build import build_graph

    rng = np.random.default_rng(0)
    graphs, ids = [], []
    for i in range(10):
        a = Atoms(lattice_mat=np.eye(3) * (4.0 + 0.05 * i),
                  frac_coords=np.array([[0, 0, 0], [0.5, 0.5, 0.5]])
                  + 0.01 * rng.standard_normal((2, 3)),
                  elements=["Na", "Cl"])
        g = build_graph(a, cutoff=5.0, max_neighbors=12)
        g.target = np.array([float(i)])
        graphs.append(g)
        ids.append(f"g{i}")
    ds = GraphDataset(graphs=graphs, ids=ids)
    l_sync = BucketedLoader(ds, batch_size=3, shuffle=True, prefetch=0)
    l_pre = BucketedLoader(ds, batch_size=3, shuffle=True, prefetch=2)
    l_sync.set_epoch(1)
    l_pre.set_epoch(1)
    b_sync = list(l_sync)
    b_pre = list(l_pre)
    assert len(b_sync) == len(b_pre) > 0
    for a, b in zip(b_sync, b_pre):
        np.testing.assert_array_equal(a.z, b.z)
        np.testing.assert_allclose(a.target, b.target)
        np.testing.assert_allclose(a.r, b.r)
