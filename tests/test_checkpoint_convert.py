"""Torch checkpoint conversion: reference state_dict layout -> flax tree.

Builds a torch module skeleton with the reference's EXACT attribute
naming (models/alignn.py:69-76 bn_nodes/bn_edges, :176-184
MLPLayer.layer Sequential, Sequential embeddings with RBF at index 0)
and checks `convert_torch_checkpoint` + `merge_converted` cover the
whole ALIGNN parameter tree — the path used to load the figshare zoo.
"""

import numpy as np
import pytest


def _reference_torch_alignn(hidden=32, embedding=16, layers=1):
    import torch.nn as nn

    class MLPLayer(nn.Module):
        def __init__(self, fin, fout):
            super().__init__()
            self.layer = nn.Sequential(
                nn.Linear(fin, fout), nn.BatchNorm1d(fout), nn.SiLU())

    class RBF(nn.Module):  # no params
        pass

    class EGGC(nn.Module):
        def __init__(self, f):
            super().__init__()
            self.src_gate = nn.Linear(f, f)
            self.dst_gate = nn.Linear(f, f)
            self.edge_gate = nn.Linear(f, f)
            self.bn_edges = nn.BatchNorm1d(f)
            self.src_update = nn.Linear(f, f)
            self.dst_update = nn.Linear(f, f)
            self.bn_nodes = nn.BatchNorm1d(f)

    class ALIGNNConv(nn.Module):
        def __init__(self, f):
            super().__init__()
            self.node_update = EGGC(f)
            self.edge_update = EGGC(f)

    class ALIGNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.atom_embedding = MLPLayer(92, hidden)
            self.edge_embedding = nn.Sequential(
                RBF(), MLPLayer(80, embedding),
                MLPLayer(embedding, hidden))
            self.angle_embedding = nn.Sequential(
                RBF(), MLPLayer(40, embedding),
                MLPLayer(embedding, hidden))
            self.alignn_layers = nn.ModuleList(
                [ALIGNNConv(hidden) for _ in range(layers)])
            self.gcn_layers = nn.ModuleList(
                [EGGC(hidden) for _ in range(layers)])
            self.fc = nn.Linear(hidden, 1)

    return ALIGNN()


def test_convert_reference_state_dict(tmp_path):
    import torch

    import jax

    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.nn.models import ALIGNN, ALIGNNConfig
    from alignn_tpu.train.checkpoint import (
        convert_torch_checkpoint,
        merge_converted,
    )

    tmodel = _reference_torch_alignn()
    pt = str(tmp_path / "best_model.pt")
    torch.save(tmodel.state_dict(), pt)

    cparams, cstats = convert_torch_checkpoint(pt)

    cfg = ALIGNNConfig(name="alignn", alignn_layers=1, gcn_layers=1,
                       hidden_features=32, embedding_features=16)
    model = ALIGNN(cfg=cfg)
    atoms = Atoms(lattice_mat=np.eye(3) * 4,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    g = build_graph(atoms, cutoff=6.0)
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    merged, report = merge_converted(variables["params"], cparams)
    assert report["missing"] == [], report["missing"]
    assert report["mismatched"] == [], report["mismatched"]
    assert report["unused"] == [], report["unused"]

    merged_bs, bs_report = merge_converted(variables["batch_stats"],
                                           cstats)
    assert bs_report["missing"] == [], bs_report["missing"]

    # spot-check a value lands on the right leaf (transposed)
    w = tmodel.atom_embedding.layer[0].weight.detach().numpy()
    got = np.asarray(jax.tree_util.tree_leaves(
        {"k": merged["embeddings"]["atom_embedding"]["linear"]["kernel"]}
    )[0])
    np.testing.assert_allclose(got, w.T)
    rm = tmodel.alignn_layers[0].edge_update.bn_edges.running_mean.numpy()
    got_rm = np.asarray(
        merged_bs["trunk"]["alignn_layers_0"]["edge_update"]
        ["norm_edges"]["mean"])
    np.testing.assert_allclose(got_rm, rm)

    # converted weights run end-to-end
    out = model.apply({"params": merged, "batch_stats": merged_bs},
                      batch, train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_extra_features_fc_mlp(tmp_path):
    """Reference extra-features checkpoints declare fc1/fc2 as MLPLayers
    (alignn.py:260-267) — their Linear+Norm weights must convert, not
    silently keep random init (round-2 review finding)."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from alignn_tpu.train.checkpoint import convert_torch_checkpoint

    class MLPLayer(nn.Module):
        def __init__(self, fin, fout):
            super().__init__()
            self.layer = nn.Sequential(
                nn.Linear(fin, fout), nn.BatchNorm1d(fout), nn.SiLU())

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = MLPLayer(8, 8)
            self.fc2 = MLPLayer(8, 8)
            self.fc3 = nn.Linear(8, 1)

    net = Net()
    path = str(tmp_path / "m.pt")
    torch.save(net.state_dict(), path)
    params, stats = convert_torch_checkpoint(path)
    assert np.asarray(params["fc1"]["linear"]["kernel"]).shape == (8, 8)
    np.testing.assert_allclose(
        np.asarray(params["fc1"]["linear"]["kernel"]),
        net.fc1.layer[0].weight.detach().numpy().T)
    assert "norm" in params["fc2"]
    assert "mean" in stats["fc2"]["norm"]
    assert np.asarray(params["fc3"]["kernel"]).shape == (8, 1)
