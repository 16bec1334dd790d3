"""Minimal torch-backed `dgl` shim so the reference's OWN model source runs.

This is NOT a DGL reimplementation — it is the ~15-call surface that
`/root/reference/alignn/models/{alignn.py,alignn_atomwise.py,utils.py}`
actually touch (`ndata`/`edata`, `local_var`/`local_scope`,
`apply_edges`, `update_all` with `u_add_v`/`u_mul_e`/`copy_e`/`sum`,
`AvgPooling`, `batch`/`unbatch`/`reverse`/`graph`/`line_graph`), built on
plain torch tensors with differentiable index_add scatter.  It exists so
the parity tests (tests/test_ref_oracle.py) can execute the reference's
unmodified model files as the numeric oracle for this framework.
"""

from __future__ import annotations

import contextlib
import sys
import types

import torch

__version__ = "0.0-fake"


# ---------------------------------------------------------------------------
# builtin message/reduce function specs (dgl.function)
# ---------------------------------------------------------------------------


class _BuiltinFn:
    def __init__(self, kind, fields):
        self.kind = kind
        self.fields = fields


def u_add_v(u_field, v_field, out_field):
    return _BuiltinFn("u_add_v", (u_field, v_field, out_field))


def u_mul_e(u_field, e_field, out_field):
    return _BuiltinFn("u_mul_e", (u_field, e_field, out_field))


def copy_e(e_field, out_field):
    return _BuiltinFn("copy_e", (e_field, out_field))


def fn_sum(msg_field, out_field):
    return _BuiltinFn("sum", (msg_field, out_field))


class _EdgeBatch:
    """The `edges` argument to a user-defined apply_edges function."""

    def __init__(self, graph):
        src, dst = graph.edges()
        self.src = {k: v[src] for k, v in graph.ndata.items()}
        self.dst = {k: v[dst] for k, v in graph.ndata.items()}
        self.data = graph.edata


class DGLGraph:
    """Directed multigraph: src/dst index tensors + feature dicts."""

    def __init__(self, src, dst, num_nodes, batch_num_nodes=None,
                 batch_num_edges=None):
        self._src = torch.as_tensor(src, dtype=torch.long)
        self._dst = torch.as_tensor(dst, dtype=torch.long)
        self._n = int(num_nodes)
        self.ndata = {}
        self.edata = {}
        self._bnn = list(batch_num_nodes) if batch_num_nodes is not None \
            else [self._n]
        self._bne = list(batch_num_edges) if batch_num_edges is not None \
            else [int(self._src.shape[0])]

    # -- structure queries ------------------------------------------------
    def edges(self):
        return self._src, self._dst

    def num_nodes(self):
        return self._n

    number_of_nodes = num_nodes

    def num_edges(self):
        return int(self._src.shape[0])

    number_of_edges = num_edges

    @property
    def batch_size(self):
        return len(self._bnn)

    def batch_num_nodes(self):
        return torch.tensor(self._bnn, dtype=torch.long)

    def batch_num_edges(self):
        return torch.tensor(self._bne, dtype=torch.long)

    @property
    def device(self):
        return self._src.device

    def to(self, device):
        return self

    # -- scoping ----------------------------------------------------------
    def local_var(self):
        g = DGLGraph(self._src, self._dst, self._n, self._bnn, self._bne)
        g.ndata = dict(self.ndata)
        g.edata = dict(self.edata)
        return g

    @contextlib.contextmanager
    def local_scope(self):
        ndata, edata = dict(self.ndata), dict(self.edata)
        try:
            yield self
        finally:
            self.ndata, self.edata = ndata, edata

    # -- message passing --------------------------------------------------
    def apply_edges(self, func):
        if isinstance(func, _BuiltinFn):
            if func.kind != "u_add_v":
                raise NotImplementedError(func.kind)
            u_field, v_field, out_field = func.fields
            self.edata[out_field] = (self.ndata[u_field][self._src]
                                     + self.ndata[v_field][self._dst])
        else:
            self.edata.update(func(_EdgeBatch(self)))

    def update_all(self, message_func, reduce_func):
        if message_func.kind == "u_mul_e":
            u_field, e_field, _ = message_func.fields
            messages = self.ndata[u_field][self._src] * self.edata[e_field]
        elif message_func.kind == "copy_e":
            e_field, _ = message_func.fields
            messages = self.edata[e_field]
        else:
            raise NotImplementedError(message_func.kind)
        if reduce_func.kind != "sum":
            raise NotImplementedError(reduce_func.kind)
        out_field = reduce_func.fields[1]
        out = torch.zeros((self._n,) + tuple(messages.shape[1:]),
                          dtype=messages.dtype, device=messages.device)
        self.ndata[out_field] = out.index_add(0, self._dst, messages)

    # -- derived graphs ---------------------------------------------------
    def line_graph(self, shared=True, backtracking=True):
        """L-edge (e1 -> e2) iff dst[e1] == src[e2] (DGL semantics)."""
        pair = self._dst[:, None] == self._src[None, :]
        if not backtracking:
            pair &= ~((self._src[:, None] == self._dst[None, :]) & pair)
        lg_src, lg_dst = torch.nonzero(pair, as_tuple=True)
        lg = DGLGraph(lg_src, lg_dst, self.num_edges())
        if shared:
            lg.ndata = dict(self.edata)
        return lg


def graph(edges, num_nodes=None, device=None):
    src, dst = edges
    if num_nodes is None:
        num_nodes = int(max(int(src.max()), int(dst.max())) + 1) \
            if len(src) else 0
    return DGLGraph(src, dst, num_nodes)


def batch(graphs):
    n_off = 0
    srcs, dsts = [], []
    for g in graphs:
        s, d = g.edges()
        srcs.append(s + n_off)
        dsts.append(d + n_off)
        n_off += g.num_nodes()
    out = DGLGraph(torch.cat(srcs), torch.cat(dsts), n_off,
                   [g.num_nodes() for g in graphs],
                   [g.num_edges() for g in graphs])
    for key in graphs[0].ndata:
        out.ndata[key] = torch.cat([g.ndata[key] for g in graphs])
    for key in graphs[0].edata:
        out.edata[key] = torch.cat([g.edata[key] for g in graphs])
    return out


def unbatch(g):
    out = []
    n_off = e_off = 0
    src, dst = g.edges()
    for nn, ne in zip(g._bnn, g._bne):
        sub = DGLGraph(src[e_off:e_off + ne] - n_off,
                       dst[e_off:e_off + ne] - n_off, nn)
        sub.ndata = {k: v[n_off:n_off + nn] for k, v in g.ndata.items()}
        sub.edata = {k: v[e_off:e_off + ne] for k, v in g.edata.items()}
        out.append(sub)
        n_off += nn
        e_off += ne
    return out


def reverse(g, copy_ndata=True, copy_edata=False):
    rg = DGLGraph(g._dst, g._src, g._n, g._bnn, g._bne)
    if copy_ndata:
        rg.ndata = dict(g.ndata)
    if copy_edata:
        rg.edata = dict(g.edata)
    return rg


class AvgPooling(torch.nn.Module):
    """Per-graph mean over node features -> [batch_size, F]."""

    def forward(self, g, feat):
        return torch.stack([part.mean(dim=0)
                            for part in torch.split(feat, g._bnn, dim=0)])


def install():
    """Register this shim as `dgl` (+ submodules) in sys.modules."""
    dgl_mod = sys.modules[__name__]

    fn_mod = types.ModuleType("dgl.function")
    fn_mod.u_add_v = u_add_v
    fn_mod.u_mul_e = u_mul_e
    fn_mod.copy_e = copy_e
    fn_mod.sum = fn_sum

    nn_mod = types.ModuleType("dgl.nn")
    nn_mod.AvgPooling = AvgPooling

    data_mod = types.ModuleType("dgl.data")
    data_mod.DGLDataset = type("DGLDataset", (), {})

    dgl_mod.function = fn_mod
    dgl_mod.nn = nn_mod
    dgl_mod.data = data_mod
    sys.modules["dgl"] = dgl_mod
    sys.modules["dgl.function"] = fn_mod
    sys.modules["dgl.nn"] = nn_mod
    sys.modules["dgl.data"] = data_mod
