#!/usr/bin/env python
"""Validated science from a TRAINED potential (VERDICT r4 next-step #1).

Drives the FF task layer (relax -> EV curve/Murnaghan -> vacancy ->
phonons) with the committed mlearn Si potential and compares the
predicted observables against published DFT values — converting
"machinery complete" into "the framework produces correct physics
end-to-end" (reference task drivers: `alignn/ff/ff.py:762-805` ev_curve,
`:808-897` vacancy, `:1119-1268` phonons; calculator `ff/calculators.py:280`).

Published anchors (DFT-PBE, the level the mlearn training data was
computed at — Zuo et al., J. Phys. Chem. A 124, 731 (2020), the mlearn
benchmark paper; standard PBE values for diamond Si):
  a0   = 5.469 A    (experiment 5.431)
  B    = 88.6 GPa   (experiment 98.8)
  E_vac ~ 3.6 eV    (PBE unrelaxed ~3.6-3.7; ML potentials 3.3-3.7)
  Gamma optical phonon = 15.3 THz PBE (~15.7 experiment)

    PYTHONPATH=/root/repo python tools/ff_science.py \
        [--model docs/mlearn_r4/Si] [--out docs/ff_science_r5.json]
"""

import argparse
import json
import time

import numpy as np


def diamond_si(a: float = 5.43):
    """Conventional 8-atom diamond cell."""
    from alignn_tpu.chem.atoms import Atoms

    frac = np.array([[0, 0, 0], [0.25, 0.25, 0.25],
                     [0, 0.5, 0.5], [0.25, 0.75, 0.75],
                     [0.5, 0, 0.5], [0.75, 0.25, 0.75],
                     [0.5, 0.5, 0], [0.75, 0.75, 0.25]])
    return Atoms(lattice_mat=np.eye(3) * a, frac_coords=frac,
                 elements=["Si"] * 8)


def diamond_si_primitive(a: float = 5.43):
    """2-atom fcc primitive cell."""
    from alignn_tpu.chem.atoms import Atoms

    lat = np.array([[0, a / 2, a / 2], [a / 2, 0, a / 2],
                    [a / 2, a / 2, 0]])
    return Atoms(lattice_mat=lat,
                 frac_coords=np.array([[0.0, 0.0, 0.0],
                                       [0.25, 0.25, 0.25]]),
                 elements=["Si", "Si"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="docs/mlearn_r4/Si")
    ap.add_argument("--out", default="docs/ff_science_r5.json")
    ap.add_argument("--fmax", type=float, default=0.005)
    args = ap.parse_args()

    from alignn_tpu.ff.calculator import Calculator
    from alignn_tpu.ff.phonons import (
        force_constants,
        phonon_frequencies,
    )
    from alignn_tpu.ff.relax import fire_relax
    from alignn_tpu.ff.tasks import ev_curve, vacancy_formation

    t0 = time.time()
    calc = Calculator(path=args.model)
    results = {"model": args.model}

    # 1. lattice relaxation (cell + positions) of the conventional cell
    rel, e_rel, nsteps = fire_relax(calc, diamond_si(5.43),
                                    fmax=args.fmax, steps=500,
                                    optimize_lattice=True)
    lat = rel.lattice_mat
    a0 = float(np.cbrt(np.abs(np.linalg.det(lat))))
    offdiag = float(np.abs(lat - np.diag(np.diag(lat))).max())
    results["relax"] = {
        "a0_A": a0, "E_atom_eV": e_rel / 8, "steps": nsteps,
        "max_offdiag_A": offdiag,
        "published": {"a0_PBE": 5.469, "a0_expt": 5.431}}
    print(f"[relax] a0 = {a0:.4f} A (PBE 5.469, expt 5.431), "
          f"E = {e_rel / 8:.4f} eV/atom, {nsteps} steps, "
          f"offdiag {offdiag:.2e}")

    # 2. EV curve + Murnaghan EOS around the relaxed cell.  +-3%
    # LINEAR strain (~+-9% volume) in 0.5% steps: the reference's +-5%
    # default spans +-15% volume, far outside the harmonic window a
    # 50-epoch potential fits cleanly
    ev = ev_curve(calc, rel, relax_first=False,
                  dx=np.arange(-0.03, 0.0301, 0.005))
    eos = ev["eos"]
    results["eos"] = {**eos, "a0_from_V0_A": float(np.cbrt(eos["V0"])),
                      "birch_murnaghan": ev["eos_birch_murnaghan"],
                      "volumes": ev["volumes"],
                      "energies": ev["energies"],
                      "published": {"B_PBE_GPa": 88.6,
                                    "B_expt_GPa": 98.8}}
    bm = ev["eos_birch_murnaghan"]
    print(f"[eos] Murnaghan B = {eos['B_GPa']:.1f} GPa "
          f"(Bp {eos['Bp']:.2f}, res {eos['residual']:.2e}) | "
          f"Birch-Murnaghan B = {bm['B_GPa']:.1f} GPa "
          f"(Bp {bm['Bp']:.2f}, res {bm['residual']:.2e}) | "
          f"PBE 88.6, expt 98.8")

    # 3. vacancy formation energy (2x2x2 of the relaxed conventional
    # cell: 64 -> 63 atoms)
    vac = vacancy_formation(calc, rel, supercell=(2, 2, 2),
                            fmax=0.02, steps=300)
    results["vacancy"] = {
        **{k: v for k, v in vac[0].items()},
        "published": {"E_vac_PBE_eV": 3.6,
                      "note": "PBE relaxed ~3.6; GAP/MTP on mlearn "
                              "give 3.3-3.7"}}
    print(f"[vacancy] E_f = {vac[0]['E_formation']:.3f} eV "
          f"(PBE ~3.6)")

    # 4. phonons on the relaxed PRIMITIVE cell, 3x3x3 supercell
    a_prim = diamond_si_primitive(a0)
    prim_rel, _e, _n = fire_relax(calc, a_prim, fmax=args.fmax,
                                  steps=200)
    fcdata = force_constants(calc, prim_rel, supercell=(3, 3, 3),
                             delta=0.015)
    f_gamma = phonon_frequencies(fcdata, np.zeros(3))
    f_x = phonon_frequencies(fcdata, np.array([0.5, 0.0, 0.5]))
    # stability scan over a coarse mesh
    mesh = [(i / 4, j / 4, k / 4) for i in range(4) for j in range(4)
            for k in range(4)]
    fmin = min(float(phonon_frequencies(fcdata, np.array(q)).min())
               for q in mesh)
    results["phonons"] = {
        "gamma_THz": f_gamma.tolist(),
        "gamma_optical_THz": float(f_gamma.max()),
        "X_THz": f_x.tolist(),
        "min_freq_mesh_THz": fmin,
        "published": {"gamma_optical_PBE_THz": 15.3,
                      "gamma_optical_expt_THz": 15.7}}
    print(f"[phonons] Gamma: acoustic {f_gamma[:3].round(3).tolist()} "
          f"optical {f_gamma[3:].round(2).tolist()} THz "
          f"(PBE optical 15.3); min over mesh {fmin:.3f} THz")

    results["wall_s"] = time.time() - t0
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out} ({results['wall_s']:.0f}s)")


if __name__ == "__main__":
    main()
