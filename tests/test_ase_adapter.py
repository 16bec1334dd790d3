"""ASE adapter (ff/ase_adapter.py) against a FORGED minimal ASE.

ASE isn't in this image, so the test forges the two pieces the adapter
touches — ``ase.calculators.calculator.Calculator``/``all_changes`` and
an Atoms-like object (cell / get_scaled_positions /
get_chemical_symbols) — then checks the adapter wires the framework
engine into the ASE results protocol, and that the no-ASE path raises
the helpful ImportError.
"""

import importlib
import sys
import types

import numpy as np
import pytest


def _forge_ase(monkeypatch):
    ase = types.ModuleType("ase")
    calcs = types.ModuleType("ase.calculators")
    calcmod = types.ModuleType("ase.calculators.calculator")

    class Calculator:
        def __init__(self, **kwargs):
            self.results = {}

        def calculate(self, atoms=None, properties=None,
                      system_changes=None):
            if atoms is not None:
                self.atoms = atoms

    calcmod.Calculator = Calculator
    calcmod.all_changes = ["positions", "numbers", "cell", "pbc"]
    ase.calculators = calcs
    calcs.calculator = calcmod
    monkeypatch.setitem(sys.modules, "ase", ase)
    monkeypatch.setitem(sys.modules, "ase.calculators", calcs)
    monkeypatch.setitem(sys.modules, "ase.calculators.calculator",
                        calcmod)


class _FakeAseAtoms:
    def __init__(self, cell, frac, symbols):
        self.cell = np.asarray(cell)
        self._frac = np.asarray(frac)
        self._symbols = list(symbols)

    def get_scaled_positions(self):
        return self._frac

    def get_chemical_symbols(self):
        return self._symbols


def _tiny_ff_model():
    import jax

    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8,
        gradwise_weight=1.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    probe = Atoms(lattice_mat=np.eye(3) * 4.0,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    g = build_graph(probe, cutoff=6.0, max_neighbors=12)
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    return model, variables, {"model": cfg.__dict__}


def test_adapter_requires_ase(monkeypatch):
    monkeypatch.delitem(sys.modules, "ase", raising=False)
    import alignn_tpu.ff.ase_adapter as ad

    ad = importlib.reload(ad)
    assert not ad.HAVE_ASE
    with pytest.raises(ImportError, match="ase is not installed"):
        ad.AlignnAtomWiseCalculator()


def test_adapter_with_forged_ase(monkeypatch):
    _forge_ase(monkeypatch)
    import alignn_tpu.ff.ase_adapter as ad

    ad = importlib.reload(ad)
    assert ad.HAVE_ASE
    try:
        model, variables, cfg = _tiny_ff_model()
        calc = ad.AlignnAtomWiseCalculator(
            model=model, variables=variables,
            config={"model": {"name": "alignn_atomwise"}})

        atoms = _FakeAseAtoms(np.eye(3) * 4.0,
                              [[0, 0, 0], [0.5, 0.5, 0.5]],
                              ["Na", "Cl"])
        res = calc.calculate(atoms)
        assert set(res) == {"energy", "free_energy", "forces", "stress"}
        assert np.isfinite(res["energy"])
        assert res["forces"].shape == (2, 3)
        assert res["stress"].shape == (6,)
        assert res["energy"] == res["free_energy"]
        # ASE results protocol populated on the instance too
        assert calc.results["energy"] == res["energy"]
    finally:
        # restore the real (no-ASE) module state for later tests
        monkeypatch.delitem(sys.modules, "ase", raising=False)
        monkeypatch.delitem(sys.modules, "ase.calculators",
                            raising=False)
        monkeypatch.delitem(sys.modules, "ase.calculators.calculator",
                            raising=False)
        importlib.reload(ad)
