"""End-to-end matrix over the reference's example-data variants.

Mirrors reference tests/test_prop.py + test_eprop.py coverage:
folder training with regression, multi-output, classification, FF with
forces+stress, extra-features, additional-output, and the eALIGNN model
— each as a tiny `train_for_folder` run over bundled example data.
"""

import csv
import json
import os
import shutil

import numpy as np
import pytest

from alignn_tpu.cli.train import train_for_folder

SAMPLE_DATA = "/root/reference/alignn/examples/sample_data"
SAMPLE_DATA_FF = "/root/reference/alignn/examples/sample_data_ff"
SAMPLE_MULTI = "/root/reference/alignn/examples/sample_data_multi_prop"
SAMPLE_FF_FEATS = "/root/reference/alignn/examples/sample_data_ff_feats"
SAMPLE_FF_ADD = ("/root/reference/alignn/examples/"
                 "sample_data_ff_additional/DataDir")


def _mini_folder(tmp_path, n=10, multi=False):
    """Copy a small slice of sample_data into a temp training folder."""
    src_csv = os.path.join(
        SAMPLE_MULTI if multi else SAMPLE_DATA, "id_prop.csv")
    with open(src_csv) as f:
        rows = [r for r in csv.reader(f)][:n]
    d = tmp_path / "data"
    d.mkdir()
    for r in rows:
        shutil.copy(os.path.join(SAMPLE_DATA, r[0]), d / r[0])
    with open(d / "id_prop.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return str(d)


def _config(tmp_path, model: dict, **kw):
    cfg = {
        "epochs": 2, "batch_size": 4, "n_train": 6, "n_val": 2,
        "n_test": 2, "learning_rate": 1e-3, "keep_data_order": True,
        "model": model,
    }
    cfg.update(kw)
    p = tmp_path / "config.json"
    with open(p, "w") as f:
        json.dump(cfg, f)
    return str(p)


SMALL_PROP = {"name": "alignn", "alignn_layers": 1, "gcn_layers": 1,
              "hidden_features": 32, "embedding_features": 16}
SMALL_FF = {"name": "alignn_atomwise", "alignn_layers": 1, "gcn_layers": 1,
            "hidden_features": 32, "embedding_features": 16,
            "graphwise_weight": 1.0, "gradwise_weight": 5.0,
            "stresswise_weight": 0.01}


def test_regression_folder(tmp_path):
    root = _mini_folder(tmp_path)
    out = str(tmp_path / "out")
    s = train_for_folder(root_dir=root,
                         config_name=_config(tmp_path, SMALL_PROP),
                         output_dir=out)
    assert np.isfinite(s["best_val_loss"])
    assert os.path.exists(os.path.join(out, "Test_results.json"))


def test_multi_output_folder(tmp_path):
    root = _mini_folder(tmp_path, multi=True)
    out = str(tmp_path / "out")
    s = train_for_folder(root_dir=root,
                         config_name=_config(tmp_path, dict(SMALL_PROP)),
                         output_dir=out)
    assert np.isfinite(s["best_val_loss"])
    res = json.load(open(os.path.join(out, "Test_results.json")))
    # multi-prop sample data has many targets per structure
    assert len(res[0]["predictions"]) > 1


def test_classification_folder(tmp_path):
    root = _mini_folder(tmp_path)
    out = str(tmp_path / "out")
    model = dict(SMALL_PROP, classification=True)
    s = train_for_folder(
        root_dir=root,
        config_name=_config(tmp_path, model,
                            classification_threshold=0.01),
        output_dir=out)
    assert np.isfinite(s["best_val_loss"])


def test_ff_folder(tmp_path):
    out = str(tmp_path / "out")
    cfgp = _config(tmp_path, SMALL_FF, neighbor_strategy="radius_graph",
                   cutoff=4.0, n_train=4, n_val=2, n_test=2, batch_size=2)
    s = train_for_folder(root_dir=SAMPLE_DATA_FF, config_name=cfgp,
                        target_key="total_energy", output_dir=out)
    assert np.isfinite(s["best_val_loss"])
    res = json.load(open(os.path.join(out, "Test_results.json")))
    assert "pred_grad" in res[0]


def test_ealignn_folder(tmp_path):
    out = str(tmp_path / "out")
    model = {"name": "ealignn_atomwise", "alignn_layers": 1,
             "gcn_layers": 1, "hidden_features": 32,
             "embedding_features": 16, "graphwise_weight": 1.0,
             "gradwise_weight": 5.0, "inner_cutoff": 4.0,
             "remove_torque": False}
    cfgp = _config(tmp_path, model, neighbor_strategy="radius_graph",
                   cutoff=4.0, n_train=4, n_val=2, n_test=2, batch_size=2)
    s = train_for_folder(root_dir=SAMPLE_DATA_FF, config_name=cfgp,
                        target_key="total_energy", output_dir=out)
    assert np.isfinite(s["best_val_loss"])


@pytest.mark.skipif(not os.path.exists(SAMPLE_FF_ADD),
                    reason="additional-output sample data missing")
def test_additional_output_folder(tmp_path):
    out = str(tmp_path / "out")
    model = dict(SMALL_FF, additional_output_features=400,
                 additional_output_weight=0.1, gradwise_weight=3.0,
                 stresswise_weight=0.0)
    cfgp = _config(tmp_path, model, neighbor_strategy="radius_graph",
                   cutoff=4.0, n_train=4, n_val=2, n_test=2, batch_size=2)
    # reference CMD file: --target_key energy --additional_output_key dos
    s = train_for_folder(root_dir=SAMPLE_FF_ADD, config_name=cfgp,
                        target_key="energy",
                        additional_output_key="dos",
                        output_dir=out)
    assert np.isfinite(s["best_val_loss"])


def test_extra_features_folder(tmp_path):
    """Gong et al. extra-features path (sample_data_ff_feats, 6 extras)."""
    root = "/root/reference/alignn/examples/sample_data_ff_feats"
    out = str(tmp_path / "out")
    model = dict(SMALL_FF, extra_features=6, gradwise_weight=3.0,
                 stresswise_weight=0.0)
    cfgp = _config(tmp_path, model, neighbor_strategy="radius_graph",
                   cutoff=4.0, n_train=4, n_val=2, n_test=2, batch_size=2)
    s = train_for_folder(root_dir=root, config_name=cfgp,
                        target_key="total_energy", output_dir=out)
    assert np.isfinite(s["best_val_loss"])


def test_gcn_only_model(tmp_path):
    """alignn_layers=0: pure GCN stack, no line-graph compute needed."""
    root = _mini_folder(tmp_path)
    out = str(tmp_path / "out")
    model = dict(SMALL_PROP, alignn_layers=0)
    s = train_for_folder(root_dir=root,
                         config_name=_config(tmp_path, model),
                         output_dir=out)
    assert np.isfinite(s["best_val_loss"])


def test_predict_with_local_model(tmp_path):
    """zoo.load_model_dir + predict_structures on a trained output dir."""
    root = _mini_folder(tmp_path)
    out = str(tmp_path / "out")
    train_for_folder(root_dir=root, config_name=_config(tmp_path,
                                                        SMALL_PROP),
                     output_dir=out)
    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.zoo import load_model_dir, predict_structures

    model, variables, cfgd = load_model_dir(out)
    atoms = Atoms(lattice_mat=np.eye(3) * 4,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    pred = predict_structures(model, variables, [atoms, atoms])
    assert pred.shape[0] == 2
    assert np.isfinite(pred).all()
    np.testing.assert_allclose(pred[0], pred[1], rtol=1e-5)


def test_molecular_xyz_folder(tmp_path):
    """Open-boundary molecules (QM9-style): xyz input, radius graph."""
    rng = np.random.default_rng(0)
    d = tmp_path / "mols"
    d.mkdir()
    rows = []
    for i in range(8):
        # perturbed water molecule
        pos = np.array([[0.0, 0.0, 0.0], [0.96, 0.0, 0.0],
                        [-0.24, 0.93, 0.0]]) + \
            0.05 * rng.standard_normal((3, 3))
        name = f"mol{i}.xyz"
        with open(d / name, "w") as f:
            f.write("3\nwater\n")
            for el, p in zip("OHH", pos):
                f.write(f"{el} {p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")
        rows.append([name, f"{rng.standard_normal():.4f}"])
    with open(d / "id_prop.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    out = str(tmp_path / "out")
    cfgp = _config(tmp_path, SMALL_PROP, neighbor_strategy="radius_graph",
                   cutoff=3.0, n_train=4, n_val=2, n_test=2, batch_size=2)
    s = train_for_folder(root_dir=str(d), config_name=cfgp,
                        file_format="xyz", output_dir=out)
    assert np.isfinite(s["best_val_loss"])
