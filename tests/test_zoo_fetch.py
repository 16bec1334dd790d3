"""Hermetic tests of the zoo/figshare FETCH machinery (VERDICT r2 #5).

`zoo.download_checkpoint` and `data/figshare.load_dataset` were the only
untested paths in the pretrained pipeline because they hit the network —
but `urllib.request.urlretrieve` accepts ``file://`` URLs, so the whole
fetch → unzip(nested) → convert → predict chain is testable with forged
local fixtures.  After these, the only untested lines are the literal
HTTP URLs in the registries.

Mirrors reference behavior at `alignn/pretrained.py:243-329` (zip fetch,
nested extraction, cached re-use) and `alignn/data.py` figshare dataset
fetch (zip-or-json payload).
"""

import json
import os
import zipfile

import numpy as np
import pytest


def _forge_model_zip(tmp_path, nested="checkpoint_dir"):
    """A figshare-style checkpoint zip: NESTED dir with config.json +
    torch best_model.pt (reference zips extract into subdirectories)."""
    torch = pytest.importorskip("torch")
    from test_checkpoint_convert import _reference_torch_alignn

    tmodel = _reference_torch_alignn(hidden=32, embedding=16, layers=1)
    pt_path = tmp_path / "best_model.pt"
    torch.save(tmodel.state_dict(), str(pt_path))
    cfg = {
        "atom_features": "cgcnn",
        "model": {"name": "alignn", "alignn_layers": 1, "gcn_layers": 1,
                  "hidden_features": 32, "embedding_features": 16,
                  "output_features": 1},
    }
    zpath = tmp_path / "model.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr(f"{nested}/config.json", json.dumps(cfg))
        z.write(str(pt_path), f"{nested}/best_model.pt")
    return zpath, tmodel


def test_download_checkpoint_file_url_unzips_and_caches(tmp_path,
                                                        monkeypatch):
    import alignn_tpu.zoo as zoo

    zpath, _ = _forge_model_zip(tmp_path)
    monkeypatch.setattr(zoo, "get_all_models", lambda: {
        "forged_model": {"url": f"file://{zpath}", "output_features": 1}})

    cache = tmp_path / "cache"
    out_dir = zoo.download_checkpoint("forged_model", cache_dir=str(cache))
    # nested extraction happened, archive removed
    assert os.path.isfile(
        os.path.join(out_dir, "checkpoint_dir", "best_model.pt"))
    assert not os.path.exists(os.path.join(out_dir, "model.zip"))

    # cache hit: source gone, second call must NOT re-fetch
    os.remove(zpath)
    again = zoo.download_checkpoint("forged_model", cache_dir=str(cache))
    assert again == out_dir

    with pytest.raises(KeyError):
        zoo.download_checkpoint("no_such_model", cache_dir=str(cache))


def test_get_figshare_model_end_to_end_prediction(tmp_path, monkeypatch):
    """fetch → unzip → torch-convert → jitted predict, all hermetic."""
    import alignn_tpu.zoo as zoo
    from alignn_tpu.chem.atoms import Atoms

    zpath, tmodel = _forge_model_zip(tmp_path)
    monkeypatch.setattr(zoo, "get_all_models", lambda: {
        "forged_model": {"url": f"file://{zpath}", "output_features": 1}})

    model, variables, cfg = zoo.get_figshare_model(
        "forged_model", cache_dir=str(tmp_path / "cache"))
    assert cfg["model"]["hidden_features"] == 32

    # converted weights actually landed (not random init)
    w_ref = tmodel.atom_embedding.layer[0].weight.detach().numpy().T
    w_got = np.asarray(
        variables["params"]["embeddings"]["atom_embedding"]["linear"]
        ["kernel"])
    np.testing.assert_allclose(w_got, w_ref, rtol=1e-6)

    atoms = Atoms(lattice_mat=np.eye(3) * 4.0,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    out = zoo.predict_structures(model, variables, [atoms])
    assert out.shape == (1, 1) and np.isfinite(out).all()


def _records(n=3):
    return [{"jid": f"x-{i}", "atoms": {"lattice_mat": np.eye(3).tolist(),
             "coords": [[0, 0, 0]], "elements": ["Si"]},
             "formation_energy_peratom": 0.1 * i} for i in range(n)]


def test_load_dataset_file_url_zip_payload(tmp_path):
    from alignn_tpu.data.figshare import load_dataset

    zpath = tmp_path / "ds.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("inner/records.json", json.dumps(_records()))

    cache = tmp_path / "dcache"
    data = load_dataset("toy_zip_ds", url=f"file://{zpath}",
                        cache_dir=str(cache))
    assert len(data) == 3 and data[2]["jid"] == "x-2"
    # cached as plain json; re-load must not touch the source
    os.remove(zpath)
    again = load_dataset("toy_zip_ds", url=f"file://{zpath}",
                         cache_dir=str(cache))
    assert again == data


def test_load_dataset_file_url_plain_json(tmp_path):
    from alignn_tpu.data.figshare import load_dataset

    jpath = tmp_path / "ds.json"
    jpath.write_text(json.dumps(_records(2)))
    data = load_dataset("toy_json_ds", url=f"file://{jpath}",
                        cache_dir=str(tmp_path / "dcache2"))
    assert [r["jid"] for r in data] == ["x-0", "x-1"]


def test_load_dataset_unknown_name_raises(tmp_path):
    from alignn_tpu.data.figshare import load_dataset

    with pytest.raises(ValueError, match="no known figshare url"):
        load_dataset("definitely_not_a_dataset",
                     cache_dir=str(tmp_path / "dcache3"))


def test_predict_db_all_hermetic(tmp_path, monkeypatch):
    """The predict_db_all campaign script end to end on forged fixtures:
    local model dir + patched dataset loader -> per-prop CSVs + MAE."""
    import alignn_tpu.zoo as zoo
    import alignn_tpu.data.figshare as figshare
    from alignn_tpu.scripts import predict_db_all as pda

    zpath, _ = _forge_model_zip(tmp_path)
    monkeypatch.setattr(zoo, "get_all_models", lambda: {
        "forged_model": {"url": f"file://{zpath}", "output_features": 1}})
    model_dir = zoo.download_checkpoint("forged_model",
                                        cache_dir=str(tmp_path / "cache"))

    records = [{"id": f"s-{i}",
                "atoms": {"lattice_mat": (np.eye(3) * (4 + 0.1 * i)
                                          ).tolist(),
                          "coords": [[0, 0, 0], [0.5, 0.5, 0.5]],
                          "elements": ["Na", "Cl"]},
                "e_form": 0.1 * i, "gap pbe": "na"} for i in range(4)]
    monkeypatch.setattr(figshare, "load_dataset",
                        lambda name, **kw: records)
    monkeypatch.setattr(pda, "DATASET_PROPS",
                        {"megnet": ("id", ["e_form", "gap pbe"])})

    pda.main(["--form_model", model_dir, "--gap_model", model_dir,
              "--datasets", "megnet", "--output_dir", str(tmp_path)])
    csv = tmp_path / "megnet_e_formpredictions.csv"
    assert csv.exists()
    lines = csv.read_text().strip().splitlines()
    assert lines[0] == "id,target,prediction,difference"
    assert len(lines) == 5  # header + 4 rows


def test_alignn_evac_hermetic(tmp_path, monkeypatch):
    """alignn_evac on a forged total-energy model + local POSCAR."""
    import alignn_tpu.zoo as zoo
    from alignn_tpu.scripts import alignn_evac

    zpath, _ = _forge_model_zip(tmp_path)
    monkeypatch.setattr(zoo, "get_all_models", lambda: {
        "forged_model": {"url": f"file://{zpath}", "output_features": 1}})
    model_dir = zoo.download_checkpoint("forged_model",
                                        cache_dir=str(tmp_path / "cache"))

    poscar = tmp_path / "POSCAR"
    poscar.write_text(
        "NaCl\n1.0\n4.0 0 0\n0 4.0 0\n0 0 4.0\nNa Cl\n1 1\ndirect\n"
        "0.0 0.0 0.0\n0.5 0.5 0.5\n")
    (tmp_path / "mu.json").write_text(json.dumps({"Na": -1.0,
                                                  "Cl": -2.0}))
    out = tmp_path / "evac.json"
    mem = alignn_evac.main([str(poscar), "--model", model_dir,
                            "--chem_pot_json", str(tmp_path / "mu.json"),
                            "--supercell", "1,1,1",
                            "--output", str(out)])
    assert len(mem) == 2  # one vacancy per distinct element
    assert {m["symb"] for m in mem} == {"Na", "Cl"}
    assert all(np.isfinite(m["Ef2"]) for m in mem)
    assert out.exists()
