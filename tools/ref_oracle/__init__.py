"""Parity oracle: run the reference's own model source files on CPU torch.

`load_reference_models()` installs three import shims —

- ``dgl``              -> :mod:`tools.ref_oracle.fake_dgl` (torch-backed)
- ``pydantic_settings`` -> pydantic v2 ``BaseModel``
- ``jarvis.*``          -> attribute stubs (only imported names, never called)

— puts `/root/reference` on sys.path, and imports
``alignn.models.alignn``, ``alignn.models.alignn_atomwise`` and
``alignn.models.utils`` UNMODIFIED.  The tests in
tests/test_ref_oracle.py then execute the reference's own forward (incl.
its torch.autograd force/stress path) as the golden oracle against this
framework's models, with weights transferred through
`alignn_tpu.train.checkpoint.convert_torch_checkpoint`.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

import numpy as np

REFERENCE_ROOT = "/root/reference"

_cache = None


class _StubModule(types.ModuleType):
    """Module whose every attribute exists (import-time only, never called)."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _StubSymbol


class _StubSymbol:
    def __init__(self, *args, **kwargs):
        raise RuntimeError(
            "jarvis stub symbol called — the oracle only supports code "
            "paths that do not invoke jarvis")


def _install_shims():
    from tools.ref_oracle import fake_dgl

    fake_dgl.install()

    if "pydantic_settings" not in sys.modules:
        import pydantic

        ps = types.ModuleType("pydantic_settings")
        ps.BaseSettings = pydantic.BaseModel
        sys.modules["pydantic_settings"] = ps

    for name in ("jarvis", "jarvis.core", "jarvis.core.atoms",
                 "jarvis.core.specie", "jarvis.core.utils", "jarvis.db",
                 "jarvis.db.figshare", "jarvis.db.jsonutils",
                 "jarvis.analysis", "jarvis.analysis.structure",
                 "jarvis.analysis.structure.neighbors"):
        if name not in sys.modules:
            sys.modules[name] = _StubModule(name)


def load_reference_models():
    """Import and return the reference model modules (cached)."""
    global _cache
    if _cache is not None:
        return _cache

    _install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import alignn.models.alignn as ref_alignn
    import alignn.models.alignn_atomwise as ref_atomwise
    import alignn.models.utils as ref_model_utils

    _cache = SimpleNamespace(alignn=ref_alignn, atomwise=ref_atomwise,
                             utils=ref_model_utils)
    return _cache


def fake_graphs_from_graphdata(graphs, feat_table, dtype=None):
    """Batched (g, lg, lat) fake-DGL graphs from our GraphData list.

    Mirrors `alignn_tpu.graph.batch.batch_graphs` WITHOUT padding, so the
    reference model sees exactly the real atoms/edges.  Feature/edge
    ordering is identical to the padded batch's leading rows, which is
    what the parity tests compare against.
    """
    import torch

    from tools.ref_oracle import fake_dgl

    dtype = dtype or torch.float64

    srcs, dsts, lgs_src, lgs_dst = [], [], [], []
    n_off = e_off = 0
    bnn, bne, bln = [], [], []
    feats, rs, images, vols_per_node, fracs = [], [], [], [], []
    lats = []
    for g in graphs:
        srcs.append(torch.as_tensor(np.asarray(g.src) + n_off))
        dsts.append(torch.as_tensor(np.asarray(g.dst) + n_off))
        lgs_src.append(torch.as_tensor(np.asarray(g.lg_src) + e_off))
        lgs_dst.append(torch.as_tensor(np.asarray(g.lg_dst) + e_off))
        feats.append(torch.as_tensor(feat_table[np.asarray(g.z)],
                                     dtype=dtype))
        rs.append(torch.as_tensor(np.asarray(g.r), dtype=dtype))
        images.append(torch.as_tensor(np.asarray(g.images), dtype=dtype))
        fracs.append(torch.as_tensor(np.asarray(g.frac_coords), dtype=dtype))
        vols_per_node.append(
            torch.full((g.num_nodes,), float(g.volume), dtype=dtype))
        lats.append(torch.as_tensor(np.asarray(g.lattice), dtype=dtype))
        bnn.append(g.num_nodes)
        bne.append(g.num_edges)
        bln.append(g.num_lg_edges)
        n_off += g.num_nodes
        e_off += g.num_edges

    num_nodes, num_edges = n_off, e_off
    fg = fake_dgl.DGLGraph(torch.cat(srcs), torch.cat(dsts), num_nodes,
                           bnn, bne)
    fg.ndata["atom_features"] = torch.cat(feats)
    fg.ndata["frac_coords"] = torch.cat(fracs)
    fg.ndata["V"] = torch.cat(vols_per_node)
    fg.edata["r"] = torch.cat(rs)
    fg.edata["images"] = torch.cat(images)

    flg = fake_dgl.DGLGraph(torch.cat(lgs_src), torch.cat(lgs_dst),
                            num_edges, bne, bln)
    flg.ndata["r"] = fg.edata["r"]
    # precomputed angle cosines (the models read lg.edata["h"] up front;
    # the lg_on_fly path then overwrites it in-graph)
    r_all = torch.cat(rs)
    r1 = -r_all[torch.cat(lgs_src)]
    r2 = r_all[torch.cat(lgs_dst)]
    cos = (r1 * r2).sum(dim=1) / (r1.norm(dim=1) * r2.norm(dim=1))
    flg.edata["h"] = cos.clamp(-1.0, 1.0)

    lat = torch.stack(lats)
    return fg, flg, lat
