"""Science pins on the COMMITTED trained Si potential (VERDICT r4 #1).

Loads docs/mlearn_r4/Si (f16, in-repo) and asserts the relaxed
observables stay at the values recorded in docs/ff_science_r5.json —
plus coarse physical windows against published DFT-PBE anchors (a0
5.469 A, B 88.6 GPa, Gamma optical 15.3 THz).  This is the "trained
weights drive the FF task layer" guarantee: graph rebuild -> forward ->
forces -> relaxation -> EOS -> FD phonons, end-to-end on real weights.

Slow-ish (~2 min on CPU): one calculator compile + ~50 relax steps +
7 EV points + 12 FD force evaluations.
"""

import os

import numpy as np
import pytest

MODEL_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "mlearn_r4", "Si")


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


def test_relaxed_lattice_constant(relaxed):
    rel, e_rel, steps = relaxed
    a0 = float(np.cbrt(abs(np.linalg.det(rel.lattice_mat))))
    # regression pin (docs/ff_science_r5.json: 5.5101 at fmax 0.005)
    assert a0 == pytest.approx(5.510, abs=0.01)
    # physical window vs PBE 5.469 / expt 5.431: within 2%
    assert abs(a0 - 5.469) / 5.469 < 0.02
    assert e_rel / 8 == pytest.approx(-5.414, abs=0.02)
    assert steps < 200  # converged, not exhausted


def test_bulk_modulus_from_eos(calc, relaxed):
    from alignn_tpu.ff.tasks import ev_curve

    rel = relaxed[0]
    ev = ev_curve(calc, rel, relax_first=False,
                  dx=np.arange(-0.015, 0.0151, 0.005))
    eos = ev["eos"]
    # smooth curve (the tie_tol fix): tiny fit residual
    assert eos["residual"] < 2e-3
    # regression pin around the r5 measurement (62.7 GPa on the wider
    # grid) + honest window: a 50-epoch potential underestimates PBE's
    # 88.6 but must stay in the physically plausible band
    assert 45 < eos["B_GPa"] < 110


def test_gamma_phonons(calc, relaxed):
    from alignn_tpu.ff.phonons import force_constants, phonon_frequencies

    rel = relaxed[0]
    a0 = float(np.cbrt(abs(np.linalg.det(rel.lattice_mat))))
    from alignn_tpu.chem.atoms import Atoms

    lat = np.array([[0, a0 / 2, a0 / 2], [a0 / 2, 0, a0 / 2],
                    [a0 / 2, a0 / 2, 0]])
    prim = Atoms(lattice_mat=lat,
                 frac_coords=np.array([[0.0, 0.0, 0.0],
                                       [0.25, 0.25, 0.25]]),
                 elements=["Si", "Si"])
    fcdata = force_constants(calc, prim, supercell=(2, 2, 2),
                             delta=0.02)
    f = phonon_frequencies(fcdata, np.zeros(3))
    # acoustic branch at Gamma: exactly zero up to FD noise
    assert np.abs(f[:3]).max() < 0.5
    # optical: triply degenerate, near the r5 value 14.29 THz
    # (3x3x3 supercell); the 2x2x2 FC truncation shifts it slightly
    assert f[3:].min() > 12.0 and f[3:].max() < 17.0
    assert np.ptp(f[3:]) < 0.5  # degeneracy survives


def test_committed_energy_reproduces_f32_training(calc):
    # the f16-committed potential reproduces the f32 run's diamond
    # energy to storage precision (tools/commit_potentials.py)
    e = calc.get_potential_energy(_diamond(5.43))
    assert e / 8 == pytest.approx(-5.3774, abs=2e-3)
