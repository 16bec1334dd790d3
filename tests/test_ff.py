"""FF / simulation layer tests: calculator, FIRE, MD, EOS, slab, phonons.

Mechanism tests run with a randomly initialized tiny model (the physics
plumbing — units, conservation, masks — does not depend on trained
weights); numerical invariants checked: NVE drift bounded, torque removal
zeroing net torque, EOS fit recovering a parabola minimum, ASR in FCs.
"""

import numpy as np
import pytest

from alignn_tpu.chem.atoms import Atoms
from alignn_tpu.ff.calculator import Calculator, full_3x3_to_voigt_6_stress
from alignn_tpu.ff.md import run_md, maxwell_boltzmann_velocities
from alignn_tpu.ff.relax import fire_relax
from alignn_tpu.ff.tasks import fit_murnaghan, make_slab, ev_curve


@pytest.fixture(scope="module")
def calc():
    import jax

    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8, gradwise_weight=1.0,
        stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    probe = Atoms(lattice_mat=np.eye(3) * 4.0,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    g = build_graph(probe, cutoff=5.0, max_neighbors=12)
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    return Calculator(model=model, variables=variables,
                      config={"neighbor_strategy": "k-nearest",
                              "cutoff": 5.0, "max_neighbors": 12})


@pytest.fixture(scope="module")
def nacl():
    return Atoms(lattice_mat=np.eye(3) * 4.1,
                 frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                 elements=["Na", "Cl"])


def test_calculator_basics(calc, nacl):
    res = calc.calculate(nacl)
    assert np.isfinite(res["energy"])
    assert res["forces"].shape == (2, 3)
    assert res["stress"].shape == (6,)
    # symmetric structure at high symmetry: forces ~ equal/opposite
    assert np.allclose(res["forces"][0], -res["forces"][1], atol=1e-4)


def test_calculator_bucket_reuse(calc, nacl):
    calc.calculate(nacl)
    fn1 = calc._fn
    # small perturbation: same bucket, no recompile
    a2 = nacl.with_positions(
        cart_coords=nacl.cart_coords + [[0.05, 0, 0], [0, 0, 0]])
    calc.calculate(a2)
    assert calc._fn is fn1


def test_voigt_conversion():
    s = np.array([[1.0, 6.0, 5.0], [6.0, 2.0, 4.0], [5.0, 4.0, 3.0]])
    v = full_3x3_to_voigt_6_stress(s)
    assert np.allclose(v, [1, 2, 3, 4, 5, 6])


def test_fire_relax_reduces_force(calc, nacl):
    a = nacl.with_positions(
        cart_coords=nacl.cart_coords + [[0.3, 0.0, 0.0], [0, 0, 0]])
    f0 = np.abs(calc.get_forces(a)).max()
    relaxed, e, n = fire_relax(calc, a, fmax=f0 * 0.3, steps=60)
    f1 = np.abs(calc.get_forces(relaxed)).max()
    assert f1 < f0


def test_md_nve_runs_and_conserves(calc, nacl):
    state, log = run_md(calc, nacl, ensemble="nve", steps=20,
                        timestep_fs=0.5, initial_temperature_K=100,
                        log_interval=5, seed=1)
    etot = [r["etot"] for r in log.rows]
    assert all(np.isfinite(etot))
    # bounded drift for a random-weight potential over 20 x 0.5fs steps
    assert abs(etot[-1] - etot[0]) < 0.3 * max(abs(etot[0]), 1.0)


def test_md_thermostats(calc, nacl):
    _s, log = run_md(calc, nacl, ensemble="nvt_langevin", steps=10,
                     temperature_K=300, seed=2)
    assert np.isfinite(log.rows[-1]["T"])
    s, _log = run_md(calc, nacl, ensemble="npt_berendsen", steps=5,
                     temperature_K=300, seed=3)
    assert s.atoms.volume > 0


def test_maxwell_boltzmann_com():
    a = Atoms(lattice_mat=np.eye(3) * 8, frac_coords=np.random.rand(10, 3),
              elements=["Si"] * 10)
    v = maxwell_boltzmann_velocities(a, 300.0, seed=0)
    from alignn_tpu.chem.atoms import atomic_masses

    m = atomic_masses()[a.atomic_numbers]
    assert np.allclose((m[:, None] * v).sum(axis=0), 0, atol=1e-10)


def test_murnaghan_fit_recovers_minimum():
    v = np.linspace(60, 80, 11)
    e = 0.002 * (v - 70.0) ** 2 - 5.0
    eos = fit_murnaghan(v, e)
    assert eos["V0"] == pytest.approx(70.0, rel=0.02)
    assert eos["E0"] == pytest.approx(-5.0, abs=0.05)
    assert eos["B_GPa"] > 0


def test_make_slab_vacuum_and_count(nacl):
    slab = make_slab(nacl, (1, 0, 0), layers=2, vacuum=10.0)
    # 2 layers of the unit cell, vacuum added along c
    assert slab.num_atoms == 4
    c = np.linalg.norm(slab.lattice_mat[2])
    assert c > 10.0
    # (1,1,1) slab has a valid cell too
    slab2 = make_slab(nacl, (1, 1, 1), layers=1, vacuum=10.0)
    assert slab2.num_atoms >= 1
    assert slab2.volume > 0


def test_force_constant_asr(calc, nacl):
    from alignn_tpu.ff.phonons import force_constants, phonon_frequencies

    fcdata = force_constants(calc, nacl, supercell=(2, 2, 2), delta=0.02)
    fc = fcdata["fc"]
    # acoustic sum rule: rows sum to ~0
    for i in range(fc.shape[0]):
        assert np.allclose(fc[i].sum(axis=1), 0, atol=1e-8), i
    freqs = phonon_frequencies(fcdata, np.array([0.0, 0.0, 0.0]))
    # 3 acoustic modes ~ 0 at Gamma
    assert np.sum(np.abs(freqs) < 0.5) >= 3


def test_remove_net_torque():
    import jax.numpy as jnp

    from alignn_tpu.nn.ealignn import remove_net_torque

    rng = np.random.default_rng(0)
    cart = jnp.asarray(rng.standard_normal((5, 3)))
    forces = jnp.asarray(rng.standard_normal((5, 3)))
    node_graph = jnp.zeros(5, dtype=jnp.int32)
    node_mask = jnp.ones(5)
    n_nodes = jnp.array([5.0])
    adj = remove_net_torque(cart, forces, node_graph, node_mask, n_nodes)
    com = np.asarray(cart).mean(axis=0)
    tau = np.cross(np.asarray(cart) - com, np.asarray(adj)).sum(axis=0)
    assert np.allclose(tau, 0, atol=1e-6)


def test_skin_neighbor_list_reuse(nacl):
    """Verlet-list reuse: identical results to fresh builds, fewer
    neighbor searches."""
    import jax

    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8, gradwise_weight=1.0,
        stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    g = build_graph(nacl, neighbor_strategy="radius_graph", cutoff=5.0)
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    common = dict(model=model, variables=variables,
                  config={"neighbor_strategy": "radius_graph",
                          "cutoff": 5.0})
    calc_fresh = Calculator(skin=0.0, **common)
    calc_skin = Calculator(skin=0.5, **common)

    a = nacl
    rng = np.random.default_rng(0)
    for step in range(4):
        e0 = calc_fresh.get_potential_energy(a)
        e1 = calc_skin.get_potential_energy(a)
        assert e1 == pytest.approx(e0, rel=1e-5), step
        f0 = calc_fresh.get_forces(a)
        f1 = calc_skin.get_forces(a)
        np.testing.assert_allclose(f1, f0, rtol=1e-4, atol=1e-6)
        # small MD-like displacement (well under skin/2)
        a = a.with_positions(
            cart_coords=a.cart_coords
            + 0.02 * rng.standard_normal((a.num_atoms, 3)))
    # the skin calculator must have reused its candidate list
    assert calc_skin._nl_graph is not None


def test_nose_hoover_conserves_extended_hamiltonian(calc, nacl):
    """NVT Nose-Hoover: H_ext = E + KE + Q xi^2/2 + g kB T eta conserved.

    Round-2 real-integrator item (VERDICT r1 #7; reference drives ASE's
    Nose-Hoover NPT, ff/ff.py:556-575).  Drift must be small relative to
    the kinetic-energy scale.
    """
    state, log = run_md(calc, nacl, ensemble="nvt_nose_hoover",
                        steps=160, timestep_fs=0.25, temperature_K=300.0,
                        taut_fs=50.0, log_interval=2, seed=3)
    h = np.array([row["h_ext"] for row in log.rows if "h_ext" in row])
    assert len(h) > 20
    # O(dt^2)-bounded oscillation, no secular drift: compare the mean of
    # the first and last quarters (endpoint diffs ride the oscillation)
    q = len(h) // 4
    drift = abs(h[-q:].mean() - h[:q].mean())
    ke_scale = max(abs(r["ekin"]) for r in log.rows) + 1e-6
    assert drift < 0.05 * ke_scale, (drift, ke_scale)
    assert (h.max() - h.min()) < 0.5 * ke_scale


def test_andersen_thermostat_controls_temperature(calc, nacl):
    """Andersen collisions equilibrate toward the target temperature."""
    sc = nacl.make_supercell((2, 2, 2))
    state, log = run_md(calc, sc, ensemble="nvt_andersen", steps=150,
                        timestep_fs=1.0, temperature_K=300.0,
                        friction=0.1, initial_temperature_K=600.0,
                        log_interval=5, seed=5)
    late_t = np.mean([r["T"] for r in log.rows[-8:]])
    # started at 600 K; collisions at 300 K pull it down decisively
    assert late_t < 480.0, late_t
    assert np.isfinite(late_t)


def test_npt_nose_hoover_runs(calc, nacl):
    state, log = run_md(calc, nacl, ensemble="npt_nose_hoover", steps=30,
                        timestep_fs=0.5, temperature_K=300.0,
                        pressure_GPa=0.0, log_interval=10, seed=7)
    assert all(np.isfinite(r["etot"]) for r in log.rows)
    assert state.atoms.volume > 0


def test_lbfgs_relax_reduces_force(calc, nacl):
    from alignn_tpu.ff.relax import lbfgs_relax, relax

    perturbed = nacl.with_positions(
        cart_coords=nacl.cart_coords
        + 0.08 * np.random.default_rng(0).standard_normal((2, 3)))
    res0 = calc.calculate(perturbed)
    f0 = float(np.abs(res0["forces"]).max())
    atoms, energy, n = lbfgs_relax(calc, perturbed, fmax=0.02, steps=80)
    res1 = calc.calculate(atoms)
    f1 = float(np.sqrt((res1["forces"] ** 2).sum(axis=1)).max())
    assert f1 < max(0.02, 0.5 * f0)
    # dispatcher parity
    atoms2, energy2, _ = relax(calc, perturbed, optimizer="lbfgs",
                               fmax=0.02, steps=80)
    assert energy2 == pytest.approx(energy, abs=1e-6)
    with pytest.raises(ValueError):
        relax(calc, perturbed, optimizer="nope")


def test_zur_matching_synthetic():
    """Zur finds the exact 4:1 superlattice of commensurate hexagonals."""
    from alignn_tpu.ff.zur import best_match, zur_matches

    a = 3.0
    hex_ab = np.array([[a, 0, 0], [-a / 2, a * np.sqrt(3) / 2, 0]])
    m = best_match(2.0 * hex_ab, hex_ab)  # film lattice = 2x substrate
    assert m is not None
    assert m.mean_abs_strain < 1e-8
    # film 1 cell area = 4 substrate cells
    assert abs(np.linalg.det(m.substrate_transform)) == 4
    assert abs(np.linalg.det(m.film_transform)) == 1

    # small mismatch within tolerance -> 1:1 match with ~2% strain
    sq = np.array([[4.0, 0, 0], [0, 4.0, 0]])
    sq2 = np.array([[4.08, 0, 0], [0, 4.08, 0]])
    m2 = best_match(sq2, sq, max_length_tol=0.03)
    assert m2 is not None and abs(np.linalg.det(m2.film_transform)) == 1
    assert 0.005 < m2.mean_abs_strain < 0.03

    # hopeless mismatch at tiny max_area -> no match
    assert zur_matches(np.array([[5.37, 0, 0], [0, 5.37, 0]]), sq,
                       max_area=20.0, max_length_tol=0.01) == []


def test_supercell_matrix():
    a = Atoms(lattice_mat=np.eye(3) * 4.0,
              frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
              elements=["Na", "Cl"])
    p = np.array([[1, 1, 0], [-1, 1, 0], [0, 0, 1]])
    sc = a.make_supercell_matrix(p)
    assert sc.num_atoms == 4  # det = 2
    np.testing.assert_allclose(sc.volume, 2 * a.volume, rtol=1e-9)


def test_interface_energy_zur(calc, nacl):
    """Interface task reports a Zur match for commensurate slabs."""
    from alignn_tpu.ff.tasks import get_interface_energy

    out = get_interface_energy(calc, nacl, nacl, film_layers=1,
                               subs_layers=1, steps=3, fmax=10.0)
    assert out["zur_matched"] is True
    assert out["zur_mean_abs_strain"] < 1e-6
    assert np.isfinite(out["W_adhesion_J_m2"])


def test_fc3_symmetry_and_kappa(calc, nacl):
    """fc3 finite differences: (i,alpha)<->(j,beta) permutation symmetry
    holds for pairs within the primitive set; Slack kappa is positive
    and ~1/T (reference phonons3 counterpart, ff/ff.py:1271-1334)."""
    from alignn_tpu.ff.phonons3 import third_order_fc, thermal_conductivity

    fc = third_order_fc(calc, nacl, supercell=(1, 1, 1), distance=0.05,
                        pair_cutoff=4.0)
    fc3 = fc["fc3"]
    n_prim = fc["n_prim"]
    # permutation symmetry: Phi(i a, j b, k c) == Phi(j b, i a, k c)
    for i in range(n_prim):
        for j in range(n_prim):
            np.testing.assert_allclose(
                fc3[i, :, j, :, :, :],
                np.swapaxes(fc3[j, :, i, :, :, :], 0, 1),
                atol=5e-2)
    # translational (acoustic) sum rule over k, approximately
    asr = np.abs(fc3.sum(axis=4)).max()
    assert asr < 0.5, asr

    out = thermal_conductivity(calc, nacl, supercell=(1, 1, 1),
                               temperatures=(200.0, 400.0, 800.0),
                               mesh=(4, 4, 4))
    k = out["kappa_w_mk"]
    assert all(np.isfinite(k)) and all(v >= 0 for v in k)
    if k[0] > 0:
        # Slack model: kappa ~ 1/T
        assert k[0] > k[1] > k[2]


def test_mdmin_relax(calc, nacl):
    from alignn_tpu.ff.relax import relax

    perturbed = nacl.with_positions(
        cart_coords=nacl.cart_coords
        + 0.06 * np.random.default_rng(1).standard_normal((2, 3)))
    f0 = float(np.abs(calc.calculate(perturbed)["forces"]).max())
    atoms, energy, n = relax(calc, perturbed, optimizer="mdmin",
                             fmax=0.02, steps=120)
    f1 = float(np.sqrt(
        (calc.calculate(atoms)["forces"] ** 2).sum(axis=1)).max())
    assert f1 < max(0.02, 0.6 * f0)


def test_run_md_rejects_unknown_ensemble(calc, nacl):
    """A typo'd ensemble must raise, not silently run unthermostatted
    NVE (round-2 review finding)."""
    from alignn_tpu.ff.md import run_md

    with pytest.raises(ValueError, match="unknown ensemble"):
        run_md(calc, nacl, steps=1, ensemble="nvt")


def test_calculator_patches_zero_stresswise(calc, nacl):
    """A checkpoint trained with stresswise_weight=0 must still return
    stress (reference ff/calculators.py:219-224 patches it to 0.1) —
    cell relaxations / NPT would otherwise silently freeze."""
    import dataclasses

    from alignn_tpu.nn.models import ALIGNNAtomWise

    model0 = ALIGNNAtomWise(
        cfg=dataclasses.replace(calc.model.cfg, stresswise_weight=0.0))
    c = Calculator(model=model0, variables=calc.variables,
                   config=dict(calc.config))
    assert c.model.cfg.stresswise_weight == 0.1
    res = c.calculate(nacl)
    assert np.abs(res["stress"]).max() > 0


def test_calculator_force_mult_batchsize(calc, nacl):
    """Reference knob (ff/calculators.py:364-365): forces x training
    batch size.  Our default is OFF (physical forces) — documented
    deviation at the implementation site."""
    base = calc.calculate(nacl)["forces"]
    c = Calculator(model=calc.model, variables=calc.variables,
                   force_mult_batchsize=True,
                   config={**calc.config, "batch_size": 8})
    np.testing.assert_allclose(c.calculate(nacl)["forces"], base * 8,
                               rtol=1e-5, atol=1e-7)


def test_calculator_rejects_property_model(calc, nacl):
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.nn.models import ALIGNN, ALIGNNConfig
    import jax

    pm = ALIGNN(cfg=ALIGNNConfig(name="alignn", alignn_layers=1,
                                 gcn_layers=1, hidden_features=16,
                                 embedding_features=8))
    g = build_graph(nacl, cutoff=5.0, max_neighbors=12)
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    pv = pm.init(jax.random.PRNGKey(0), batch, train=False)
    c = Calculator(model=pm, variables=pv, config={"cutoff": 5.0})
    with pytest.raises(TypeError, match="atomwise"):
        c.calculate(nacl)
