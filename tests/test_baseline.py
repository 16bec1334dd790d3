"""Per-species reference-energy baseline (data/baseline.py).

The extension that fixes the combined-mlearn `all` energy head
(VERDICT r4 #2): elemental offsets fit on the train split, residual
training targets, predict-time add-back.
"""

import numpy as np
import pytest

from alignn_tpu.data.baseline import (
    baseline_per_atom,
    composition_fractions,
    fit_species_baseline,
    residualize_records,
)


def _rec(elements, target):
    return {"jid": "x", "atoms": {"elements": list(elements)},
            "target": float(target)}


def test_composition_fractions():
    f = composition_fractions(["Si", "Si", "Ge", "Ge", "Ge", "Ge"])
    assert f == {"Si": pytest.approx(1 / 3), "Ge": pytest.approx(2 / 3)}


def test_fit_recovers_exact_offsets():
    # targets that ARE pure composition-weighted offsets must be
    # recovered exactly (up to the tiny ridge)
    mu_true = {"Si": -5.2, "Ge": -4.4, "Li": -1.8}
    rng = np.random.default_rng(0)
    recs = []
    for _ in range(50):
        els = rng.choice(list(mu_true), size=rng.integers(2, 9)).tolist()
        t = baseline_per_atom(els, mu_true)
        recs.append(_rec(els, t))
    mu = fit_species_baseline(recs)
    for el, v in mu_true.items():
        assert mu[el] == pytest.approx(v, abs=1e-5)


def test_fit_least_squares_residual_smaller_than_raw():
    rng = np.random.default_rng(1)
    mu_true = {"Cu": -3.9, "Mo": -10.5}
    recs = []
    for _ in range(80):
        els = rng.choice(list(mu_true), size=8).tolist()
        t = baseline_per_atom(els, mu_true) + rng.normal(0, 0.05)
        recs.append(_rec(els, t))
    mu = fit_species_baseline(recs)
    res = residualize_records(recs, mu)
    raw = np.array([r["target"] for r in recs])
    rr = np.array([r["target"] for r in res])
    assert np.abs(rr).mean() < 0.1          # offsets removed
    assert np.abs(raw).mean() > 3.0          # they dominated before
    # originals untouched (residualize copies)
    assert recs[0]["target"] == pytest.approx(raw[0])


def test_unseen_species_contributes_zero():
    mu = {"Si": -5.0}
    assert baseline_per_atom(["Si", "Xx"], mu) == pytest.approx(-2.5)


def test_multi_output_target_rejected():
    with pytest.raises(ValueError):
        fit_species_baseline(
            [{"atoms": {"elements": ["Si"]}, "target": [1.0, 2.0]}])


def test_loader_residualizes_and_persists(tmp_path):
    # integration: get_train_val_loaders with the flag fits on train,
    # residualizes every split, and writes species_baseline.json
    import json
    import os

    from alignn_tpu.data.loader import get_train_val_loaders

    rng = np.random.default_rng(2)
    mu_true = {"Si": -5.2, "Ge": -4.4}
    records = []
    for i in range(20):
        el = ["Si", "Ge"][i % 2]
        lat = np.eye(3) * (5.4 if el == "Si" else 5.7)
        fr = np.array([[0, 0, 0], [0.25, 0.25, 0.25]]) \
            + rng.normal(0, 0.005, (2, 3))
        records.append({
            "jid": f"{el}-{i}",
            "atoms": {"lattice_mat": lat.tolist(),
                      "coords": fr.tolist(), "elements": [el, el],
                      "cartesian": False},
            "target": mu_true[el] + rng.normal(0, 0.01)})
    tr, va, te, _mad = get_train_val_loaders(
        records, n_train=14, n_val=3, n_test=3,
        keep_data_order=True, batch_size=2,
        output_dir=str(tmp_path), cache_dir=None, progress=False,
        per_species_energy_baseline=True)
    sb_path = os.path.join(str(tmp_path), "species_baseline.json")
    assert os.path.exists(sb_path)
    with open(sb_path) as f:
        sb = json.load(f)
    assert sb["per_atom"] is True
    assert sb["elements"]["Si"] == pytest.approx(-5.2, abs=0.05)
    assert sb["elements"]["Ge"] == pytest.approx(-4.4, abs=0.05)
    # residual targets are near zero across all splits
    for ds in (tr.dataset, va.dataset, te.dataset):
        t = ds.targets()
        assert np.abs(t).max() < 0.2, t
