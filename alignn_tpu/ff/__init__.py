"""Force-field / simulation layer (reference L6: `alignn/ff/`).

The reference wraps ASE for dynamics and phonopy for phonons
(`ff/ff.py:271-1430`).  Neither exists in this environment, so the whole
simulation stack is framework-owned and TPU-first:

- :class:`Calculator` — energy/forces/stress for an
  :class:`~alignn_tpu.chem.atoms.Atoms` from a trained model, with a
  persistent padded bucket so MD/relaxation steps never recompile
  (reference rebuilds the DGL graph per call, ff/calculators.py:284-291);
- :mod:`relax` — FIRE optimizer + cell relaxation (ExpCellFilter
  equivalent);
- :mod:`md` — NVE / Langevin + Berendsen NVT / Berendsen NPT;
- :mod:`tasks` — E-V curve + Vinet/Murnaghan EOS fit, vacancy formation,
  surface energy, interface energy;
- :mod:`phonons` — finite-displacement force constants + Gamma-point and
  band-path frequencies (framework-owned phonopy-lite).
"""

from alignn_tpu.ff.calculator import Calculator, default_path
from alignn_tpu.ff.relax import fire_relax, lbfgs_relax, relax
from alignn_tpu.ff.md import run_md

__all__ = ["Calculator", "default_path", "fire_relax",
           "lbfgs_relax", "relax", "run_md"]
