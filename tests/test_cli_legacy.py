"""Legacy config-file CLI (cli/legacy.py vs reference alignn/cli.py).

Hermetic: the dataset fetch is monkeypatched with synthetic records, so
the test pins the CLI surface (config load, scratch checkpoint_dir,
artifact copy-back, metrics/fullconfig dumps) end to end.
"""

import json
import os

import numpy as np


def _records(n=16):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        a = 4.0 + 0.1 * rng.standard_normal()
        out.append({
            "jid": f"t-{i}",
            "atoms": {"lattice_mat": (np.eye(3) * a).tolist(),
                      "coords": [[0, 0, 0], [0.5, 0.5, 0.5]],
                      "elements": ["Na", "Cl"]},
            "formation_energy_peratom": float(rng.standard_normal()),
        })
    return out


def test_legacy_cli_trains_from_config(tmp_path, monkeypatch):
    import alignn_tpu.data.figshare as figshare
    from alignn_tpu.cli import legacy

    monkeypatch.setattr(figshare, "load_dataset",
                        lambda name, **kw: _records())

    cfg = {
        "dataset": "dft_3d", "target": "formation_energy_peratom",
        "epochs": 1, "batch_size": 4, "n_train": 8, "n_val": 4,
        "n_test": 4, "keep_data_order": True, "num_workers": 0,
        "progress": False,
        "model": {"name": "alignn", "alignn_layers": 1, "gcn_layers": 1,
                  "hidden_features": 16, "embedding_features": 8},
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    ckpt_dir = tmp_path / "scratch"

    hist = legacy.main([str(cfg_path), "--checkpoint_dir",
                        str(ckpt_dir)])
    assert hist is not None
    # artifacts in the CONFIG's directory (reference cli.py:58-70)
    metrics = json.loads((tmp_path / "metrics.json").read_text())
    assert metrics
    full = json.loads((tmp_path / "fullconfig.json").read_text())
    assert full["model"]["hidden_features"] == 16
    # checkpoints copied back from the scratch dir
    copied = [f for f in os.listdir(tmp_path) if f.endswith(".mpk")]
    assert "best_model.mpk" in copied


def test_legacy_cli_profile_route(tmp_path, monkeypatch):
    import alignn_tpu.data.figshare as figshare
    from alignn_tpu.cli import legacy

    monkeypatch.setattr(figshare, "load_dataset",
                        lambda name, **kw: _records())
    cfg = {
        "dataset": "dft_3d", "target": "formation_energy_peratom",
        "epochs": 1, "batch_size": 4, "n_train": 8, "n_val": 4,
        "n_test": 4, "keep_data_order": True, "num_workers": 0,
        "progress": False,
        "model": {"name": "alignn", "alignn_layers": 1, "gcn_layers": 1,
                  "hidden_features": 16, "embedding_features": 8},
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    out = legacy.main([str(cfg_path), "--profile",
                       "--checkpoint_dir", str(tmp_path / "scratch")])
    assert out["step_time_s"] > 0
    assert os.path.isdir(tmp_path / "jax_trace")
