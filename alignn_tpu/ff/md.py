"""Molecular dynamics: NVE / NVT (Langevin, Berendsen) / NPT (Berendsen).

Framework-owned replacement for the ASE dynamics the reference drives in
`ForceField` (`alignn/ff/ff.py:419-617`: VelocityVerlet NVE, Langevin /
Andersen / Berendsen NVT, Berendsen / Nose-Hoover NPT), with the same
task names exposed by the FF CLI (reference run_alignn_ff.py:100-257).

Units: eV / Angstrom / amu; time input in fs.  Internal time unit
t0 = sqrt(amu A^2 / eV) = 10.1805 fs (ASE convention: units.fs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

from alignn_tpu.chem.atoms import Atoms, atomic_masses

FS = 1.0 / 10.180505  # fs -> internal time units (ASE units.fs)
KB = 8.617333262e-5  # eV / K


@dataclass
class MDState:
    atoms: Atoms
    velocities: np.ndarray  # [N, 3] Angstrom / t0
    masses: np.ndarray      # [N] amu

    @property
    def kinetic_energy(self) -> float:
        return float(0.5 * (self.masses[:, None]
                            * self.velocities ** 2).sum())

    @property
    def temperature(self) -> float:
        n = self.atoms.num_atoms
        return 2.0 * self.kinetic_energy / (3.0 * n * KB)


def maxwell_boltzmann_velocities(atoms: Atoms, temperature_K: float,
                                 seed: int = 0) -> np.ndarray:
    """Initial velocities at `temperature_K`, COM-motion removed."""
    rng = np.random.default_rng(seed)
    m = atomic_masses()[atoms.atomic_numbers]
    sigma = np.sqrt(KB * temperature_K / m)[:, None]
    v = rng.standard_normal((atoms.num_atoms, 3)) * sigma
    v -= (m[:, None] * v).sum(axis=0) / m.sum()
    return v


@dataclass
class MDLog:
    """Per-interval MD observables (reference MDLogger attach,
    ff/ff.py:311-322)."""

    rows: List[Dict[str, float]] = field(default_factory=list)

    def append(self, step, time_fs, epot, ekin, temp):
        self.rows.append({"step": step, "time_fs": time_fs,
                          "epot": epot, "ekin": ekin,
                          "etot": epot + ekin, "T": temp})


def run_md(calc, atoms: Atoms,
           ensemble: str = "nve",
           steps: int = 100,
           timestep_fs: float = 1.0,
           temperature_K: float = 300.0,
           pressure_GPa: float = 0.0,
           taut_fs: Optional[float] = None,
           taup_fs: Optional[float] = None,
           friction: float = 0.02,
           compressibility_GPa: float = 5e-3,
           initial_temperature_K: Optional[float] = None,
           seed: int = 0,
           log_interval: int = 10,
           trajectory: Optional[list] = None,
           callback: Optional[Callable] = None):
    """Run MD; returns (final MDState, MDLog).

    ensembles: nve | nvt_langevin | nvt_berendsen | npt_berendsen
    (reference task names, run_alignn_ff.py:100-257; Andersen and
    Nose-Hoover map to langevin / berendsen equivalents).
    """
    ensemble = ensemble.lower()
    if ensemble in ("nvt_andersen",):
        ensemble = "nvt_langevin"
    if ensemble in ("npt_nose_hoover", "npt"):
        ensemble = "npt_berendsen"
    dt = timestep_fs * FS
    taut = (taut_fs or 100.0 * timestep_fs) * FS
    taup = (taup_fs or 1000.0 * timestep_fs) * FS
    rng = np.random.default_rng(seed + 1)

    m = atomic_masses()[atoms.atomic_numbers].astype(np.float64)
    t_init = initial_temperature_K if initial_temperature_K is not None \
        else temperature_K
    state = MDState(
        atoms=atoms,
        velocities=maxwell_boltzmann_velocities(atoms, t_init, seed),
        masses=m)
    log = MDLog()

    res = calc.calculate(state.atoms)
    forces = res["forces"]
    epot = res["energy"]

    for step in range(steps):
        v = state.velocities
        a_t = forces / m[:, None]

        if ensemble == "nvt_langevin":
            # ASE-style Langevin (BAOAB-ish splitting, sufficient for FF
            # sampling parity): deterministic VV + OU collision kick
            gamma = friction / FS  # friction given in 1/fs
            c1 = np.exp(-gamma * dt)
            sigma = np.sqrt(KB * temperature_K / m)[:, None] * np.sqrt(
                1 - c1 ** 2)
            v = c1 * v + sigma * rng.standard_normal(v.shape)

        # velocity Verlet
        v_half = v + 0.5 * dt * a_t
        cart = state.atoms.cart_coords + dt * v_half
        new_atoms = state.atoms.with_positions(cart_coords=cart)
        res = calc.calculate(new_atoms)
        forces = res["forces"]
        epot = res["energy"]
        v = v_half + 0.5 * dt * (forces / m[:, None])

        if ensemble in ("nvt_berendsen", "npt_berendsen"):
            state_T = 2.0 * float(
                0.5 * (m[:, None] * v ** 2).sum()) / (
                3.0 * new_atoms.num_atoms * KB)
            lam = np.sqrt(max(
                1.0 + (dt / taut) * (temperature_K / max(state_T, 1e-12)
                                     - 1.0), 1e-12))
            v = v * lam

        if ensemble == "npt_berendsen":
            # isotropic Berendsen barostat on the instantaneous pressure:
            # P = (2 Ekin/3 - virial)/V; use model stress trace instead
            from alignn_tpu.nn.models import EV_A3_TO_GPA

            stress = res["stress_3x3"] * EV_A3_TO_GPA  # eV/A^3 -> GPa
            p_inst = float(-np.trace(stress) / 3.0)
            mu = (1.0 - (dt / taup) * compressibility_GPa
                  * (pressure_GPa - p_inst)) ** (1.0 / 3.0)
            new_atoms = Atoms(
                lattice_mat=new_atoms.lattice_mat * mu,
                frac_coords=new_atoms.frac_coords,
                elements=new_atoms.elements)
            res = calc.calculate(new_atoms)
            forces = res["forces"]
            epot = res["energy"]

        state = MDState(atoms=new_atoms, velocities=v, masses=m)
        if step % log_interval == 0 or step == steps - 1:
            log.append(step, step * timestep_fs, float(epot),
                       state.kinetic_energy, state.temperature)
            if trajectory is not None:
                trajectory.append(new_atoms.to_dict())
        if callback is not None:
            callback(step, state, epot, forces)
    return state, log
