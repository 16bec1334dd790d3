"""Science pins on the COMMITTED envelope-weighted Si potential.

docs/mlearn_r5/Si_envelope: radius-graph cutoff 4.5 + the strictly
continuous envelope-weighted aggregation (nn/models.py
envelope_edge_weights), 60 epochs on the bundled mlearn Si set.  Test
metrics: energy MAE 0.0171 eV/atom, force MAE 0.0670 eV/A — below the
best published mlearn-Si force MAE (MTP 0.09; Zuo et al. 2020).

Observables pinned against docs/ff_science_r5_envelope.json and
published DFT-PBE anchors:
  a0 = 5.4803 A (PBE 5.469), B = 88.6 GPa (PBE 88.6!),
  Gamma optical 14.93 THz (PBE 15.3), dynamically stable mesh.
"""

import os

import numpy as np
import pytest

MODEL_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "mlearn_r5", "Si_envelope")


@pytest.fixture(scope="module")
def calc():
    from alignn_tpu.ff.calculator import Calculator

    return Calculator(path=MODEL_DIR)


def _diamond(a):
    from alignn_tpu.chem.atoms import Atoms

    frac = np.array([[0, 0, 0], [0.25, 0.25, 0.25],
                     [0, 0.5, 0.5], [0.25, 0.75, 0.75],
                     [0.5, 0, 0.5], [0.75, 0.25, 0.75],
                     [0.5, 0.5, 0], [0.75, 0.75, 0.25]])
    return Atoms(lattice_mat=np.eye(3) * a, frac_coords=frac,
                 elements=["Si"] * 8)


@pytest.fixture(scope="module")
def relaxed(calc):
    from alignn_tpu.ff.relax import fire_relax

    rel, e_rel, steps = fire_relax(calc, _diamond(5.43), fmax=0.01,
                                   steps=200, optimize_lattice=True)
    return rel, e_rel, steps


def test_lattice_constant(relaxed):
    rel, e_rel, steps = relaxed
    a0 = float(np.cbrt(abs(np.linalg.det(rel.lattice_mat))))
    assert a0 == pytest.approx(5.480, abs=0.01)   # regression pin
    assert abs(a0 - 5.469) / 5.469 < 0.01          # within 1% of PBE
    assert steps < 200


def test_bulk_modulus_matches_pbe(calc, relaxed):
    from alignn_tpu.ff.tasks import ev_curve

    ev = ev_curve(calc, relaxed[0], relax_first=False,
                  dx=np.arange(-0.02, 0.0201, 0.005))
    eos = ev["eos"]
    assert eos["residual"] < 5e-3                  # smooth curve
    assert eos["B_GPa"] == pytest.approx(88.6, abs=8.0)
    assert 2.0 < eos["Bp"] < 6.0                   # physical pressure
    bm = ev["eos_birch_murnaghan"]
    assert bm["B_GPa"] == pytest.approx(eos["B_GPa"], abs=5.0)


def test_gamma_phonons_with_skin_reuse(calc, relaxed):
    """Runs through the Verlet skin-reuse path (the default) — also a
    regression pin on the wrap_frac boundary fix, which corrupted FD
    force constants computed via skin reuse."""
    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.ff.phonons import force_constants, phonon_frequencies

    a0 = float(np.cbrt(abs(np.linalg.det(relaxed[0].lattice_mat))))
    lat = np.array([[0, a0 / 2, a0 / 2], [a0 / 2, 0, a0 / 2],
                    [a0 / 2, a0 / 2, 0]])
    prim = Atoms(lattice_mat=lat,
                 frac_coords=np.array([[0.0, 0.0, 0.0],
                                       [0.25, 0.25, 0.25]]),
                 elements=["Si", "Si"])
    fcdata = force_constants(calc, prim, supercell=(2, 2, 2),
                             delta=0.02)
    f = phonon_frequencies(fcdata, np.zeros(3))
    assert np.abs(f[:3]).max() < 0.2               # acoustic ~ 0
    assert np.ptp(f[3:]) < 0.3                     # triple degeneracy
    assert f[3:].mean() == pytest.approx(14.9, abs=1.5)


def test_vacancy_formation_positive_and_sane(calc, relaxed):
    """The k-NN potential got E_f ~ 1 eV on consistent topology and
    nonsense across the degeneracy cliff (BENCH_NOTES round 5); the
    continuous envelope potential gives 2.7 eV unrelaxed vs PBE ~3.6."""
    rel = relaxed[0]
    sc = rel.make_supercell((2, 2, 2))
    e_bulk = calc.get_potential_energy(sc)
    from alignn_tpu.chem.atoms import Atoms

    fr = np.delete(sc.frac_coords, 0, axis=0)
    vac = Atoms(lattice_mat=sc.lattice_mat, frac_coords=fr,
                elements=["Si"] * (sc.num_atoms - 1))
    e_vac = calc.get_potential_energy(vac)
    ef = e_vac - e_bulk + e_bulk / sc.num_atoms
    assert 1.5 < ef < 4.5, ef
