"""On-device (lax.scan) MD vs host-loop MD parity + chunking behavior."""

import numpy as np
import pytest

from alignn_tpu.chem.atoms import Atoms


@pytest.fixture(scope="module")
def setup():
    import jax

    from alignn_tpu.ff.calculator import Calculator
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8, gradwise_weight=1.0,
        stresswise_weight=0.0)
    model = ALIGNNAtomWise(cfg=cfg)
    atoms = Atoms(lattice_mat=np.eye(3) * 4.1,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    g = build_graph(atoms, neighbor_strategy="radius_graph", cutoff=5.0)
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    calc = Calculator(model=model, variables=variables, skin=0.0,
                      config={"neighbor_strategy": "radius_graph",
                              "cutoff": 5.0})
    return model, variables, calc, atoms


def _wrapped_cart(atoms):
    """Cartesian coords wrapped into the home cell: trajectories are
    compared modulo lattice translations (the graph builder wraps
    fractional coords, so jit-MD positions may differ from the host
    loop's by whole lattice vectors)."""
    frac = atoms.frac_coords % 1.0
    return frac @ atoms.lattice_mat


def test_jit_md_matches_host_loop(setup):
    from alignn_tpu.ff.md import run_md
    from alignn_tpu.ff.md_jit import run_md_jit

    model, variables, calc, atoms = setup
    steps, dt = 8, 0.5
    host_state, host_log = run_md(
        calc, atoms, ensemble="nve", steps=steps, timestep_fs=dt,
        initial_temperature_K=80.0, seed=3, log_interval=steps)
    jit_atoms, jit_log = run_md_jit(
        model, variables, atoms, steps=steps, timestep_fs=dt,
        ensemble="nve", initial_temperature_K=80.0, seed=3,
        cutoff=5.0, chunk_steps=1)
    np.testing.assert_allclose(_wrapped_cart(jit_atoms),
                               _wrapped_cart(host_state.atoms),
                               rtol=1e-4, atol=1e-5)
    assert jit_log.rows[-1]["etot"] == pytest.approx(
        host_log.rows[-1]["etot"], rel=1e-3)


def test_jit_md_chunked_close_to_stepwise(setup):
    from alignn_tpu.ff.md_jit import run_md_jit

    model, variables, _calc, atoms = setup
    kw = dict(steps=8, timestep_fs=0.5, ensemble="nve",
              initial_temperature_K=80.0, seed=3, cutoff=5.0)
    a1, log1 = run_md_jit(model, variables, atoms, chunk_steps=1, **kw)
    a8, log8 = run_md_jit(model, variables, atoms, chunk_steps=8, **kw)
    # frozen-topology drift over 8 tiny steps must be negligible
    np.testing.assert_allclose(_wrapped_cart(a8), _wrapped_cart(a1),
                               rtol=1e-4, atol=1e-5)


def test_jit_md_langevin_runs(setup):
    from alignn_tpu.ff.md_jit import run_md_jit

    model, variables, _calc, atoms = setup
    a, log = run_md_jit(model, variables, atoms, steps=6,
                        timestep_fs=0.5, ensemble="nvt_langevin",
                        temperature_K=200.0, seed=1, cutoff=5.0,
                        chunk_steps=3)
    assert np.isfinite(log.rows[-1]["T"])
    assert np.isfinite(a.cart_coords).all()


def test_jit_md_dense_asymmetric_chunk_falls_back(setup, monkeypatch):
    """An asymmetric edge set mid-trajectory must not abort the run:
    that chunk uses the sparse layout and the trajectory continues."""
    import alignn_tpu.graph.dense as gd
    from alignn_tpu.ff.md_jit import run_md_jit

    model, variables, _calc, atoms = setup
    real = gd.dense_batch_graphs
    fail = {"n": 1}

    def flaky(*a, **kw):
        if fail["n"]:
            fail["n"] -= 1
            raise gd.AsymmetricEdgesError("injected asymmetry")
        return real(*a, **kw)

    monkeypatch.setattr(gd, "dense_batch_graphs", flaky)
    a, log = run_md_jit(model, variables, atoms, steps=6,
                        timestep_fs=0.5, ensemble="nve",
                        initial_temperature_K=80.0, seed=3, cutoff=5.0,
                        chunk_steps=3, dense=True)
    assert fail["n"] == 0
    assert len(log.rows) == 6       # per-step rows (run_md parity)
    assert np.isfinite(a.cart_coords).all()


def test_jit_md_dense_matches_sparse(setup):
    """Dense-neighborhood layout reproduces the sparse jit-MD trajectory."""
    from alignn_tpu.ff.md_jit import run_md_jit

    model, variables, _calc, atoms = setup
    kw = dict(steps=6, timestep_fs=0.5, ensemble="nve",
              initial_temperature_K=80.0, seed=3, cutoff=5.0,
              chunk_steps=3)
    a_sparse, log_s = run_md_jit(model, variables, atoms, **kw)
    a_dense, log_d = run_md_jit(model, variables, atoms, dense=True, **kw)
    np.testing.assert_allclose(_wrapped_cart(a_dense),
                               _wrapped_cart(a_sparse),
                               rtol=1e-4, atol=1e-5)
    assert log_d.rows[-1]["etot"] == pytest.approx(
        log_s.rows[-1]["etot"], rel=1e-3)
