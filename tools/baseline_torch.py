"""Reference-equivalent torch baseline for the bench.py workload.

The reference (usnistgov/alignn) cannot run in this image — DGL is not
installed — so this script measures the same training-step computation
(4+4-layer ALIGNN-FF, 256 hidden, energy+force+stress heads with
create_graph=True double backward) in plain PyTorch with index_select /
index_add message passing, which is what DGL's CPU SpMM reduces to.
Same batch construction as bench.py (32 x 8-atom rocksalt cells).

Prints one JSON line {"edges_per_s": ...} used to set
bench.py:BASELINE_EDGES_PER_S (see BENCH_NOTES.md).
"""

import json
import sys
import time

import numpy as np
import torch
import torch.nn as nn

sys.path.insert(0, "/root/repo")

from bench import build_batch  # noqa: E402  (same workload)


class EGGC(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.src_gate = nn.Linear(f, f)
        self.dst_gate = nn.Linear(f, f)
        self.edge_gate = nn.Linear(f, f)
        self.src_update = nn.Linear(f, f)
        self.dst_update = nn.Linear(f, f)
        self.norm_nodes = nn.LayerNorm(f)
        self.norm_edges = nn.LayerNorm(f)

    def forward(self, x, e, src, dst):
        m = (self.src_gate(x).index_select(0, src)
             + self.dst_gate(x).index_select(0, dst)
             + self.edge_gate(e))
        sigma = torch.sigmoid(m)
        bh = self.dst_update(x).index_select(0, src)
        num = torch.zeros_like(x).index_add_(0, dst, sigma * bh)
        den = torch.zeros_like(x).index_add_(0, dst, sigma)
        h = num / (den + 1e-6)
        x_new = x + torch.nn.functional.silu(
            self.norm_nodes(self.src_update(x) + h))
        e_new = e + torch.nn.functional.silu(self.norm_edges(m))
        return x_new, e_new


class Model(nn.Module):
    def __init__(self, f=256, n_alignn=4, n_gcn=4, fin=92, frbf=80,
                 fang=40):
        super().__init__()
        self.embed_x = nn.Sequential(nn.Linear(fin, f), nn.LayerNorm(f),
                                     nn.SiLU())
        self.embed_y = nn.Sequential(nn.Linear(frbf, 64), nn.LayerNorm(64),
                                     nn.SiLU(), nn.Linear(64, f),
                                     nn.LayerNorm(f), nn.SiLU())
        self.embed_z = nn.Sequential(nn.Linear(fang, 64), nn.LayerNorm(64),
                                     nn.SiLU(), nn.Linear(64, f),
                                     nn.LayerNorm(f), nn.SiLU())
        self.alignn = nn.ModuleList(
            [nn.ModuleList([EGGC(f), EGGC(f)]) for _ in range(n_alignn)])
        self.gcn = nn.ModuleList([EGGC(f) for _ in range(n_gcn)])
        self.fc = nn.Linear(f, 1)
        centers_b = torch.linspace(0, 8, frbf)
        centers_a = torch.linspace(-1, 1, fang)
        self.register_buffer("cb", centers_b)
        self.register_buffer("ca", centers_a)
        self.gb = 1.0 / (8 / (frbf - 1))
        self.ga = 1.0 / (2 / (fang - 1))

    def forward(self, feats, r, src, dst, lg_src, lg_dst, node_graph,
                n_graphs, n_nodes_per_graph):
        bl = torch.norm(r, dim=1)
        rbf = torch.exp(-self.gb * (bl[:, None] - self.cb) ** 2)
        r1 = -r.index_select(0, lg_src)
        r2 = r.index_select(0, lg_dst)
        cos = (r1 * r2).sum(1) / (torch.norm(r1, dim=1)
                                  * torch.norm(r2, dim=1))
        cos = torch.clamp(cos, -1, 1)
        ang = torch.exp(-self.ga * (cos[:, None] - self.ca) ** 2)
        x = self.embed_x(feats)
        y = self.embed_y(rbf)
        z = self.embed_z(ang)
        for a, b in self.alignn:
            x, m = a(x, y, src, dst)
            y, z = b(m, z, lg_src, lg_dst)
        for gcn in self.gcn:
            x, y = gcn(x, y, src, dst)
        pooled = torch.zeros(n_graphs, x.shape[1], dtype=x.dtype).index_add_(
            0, node_graph, x)
        pooled = pooled / n_nodes_per_graph[:, None].clamp(min=1)
        out = self.fc(pooled)[:, 0]
        return out


def main():
    torch.set_num_threads(torch.get_num_threads())
    batch = build_batch(batch_size=32)
    feats = torch.tensor(np.asarray(batch.atom_features))
    r = torch.tensor(np.asarray(batch.r), requires_grad=True)
    src = torch.tensor(np.asarray(batch.src), dtype=torch.long)
    dst = torch.tensor(np.asarray(batch.dst), dtype=torch.long)
    lg_src = torch.tensor(np.asarray(batch.lg_src), dtype=torch.long)
    lg_dst = torch.tensor(np.asarray(batch.lg_dst), dtype=torch.long)
    node_graph = torch.tensor(np.asarray(batch.node_graph),
                              dtype=torch.long)
    n_nodes = torch.tensor(np.asarray(batch.n_nodes))
    target = torch.tensor(np.asarray(batch.target))[:, 0]
    forces_t = torch.tensor(np.asarray(batch.forces))
    n_graphs = n_nodes.shape[0]

    model = Model()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    n_edges = src.shape[0] + lg_src.shape[0]

    def step():
        opt.zero_grad()
        out = model(feats, r, src, dst, lg_src, lg_dst, node_graph,
                    n_graphs, n_nodes)
        en = out * n_nodes
        pair_forces = -torch.autograd.grad(
            en.sum(), r, create_graph=True)[0]
        num_nodes = feats.shape[0]
        fji = torch.zeros(num_nodes, 3).index_add_(0, dst, pair_forces)
        fij = torch.zeros(num_nodes, 3).index_add_(0, src, pair_forces)
        forces = fji - fij
        loss = torch.abs(out - target).mean() + \
            10 * torch.abs(forces - forces_t).mean()
        loss.backward()
        opt.step()
        return loss

    step()  # warmup
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    print(json.dumps({"edges_per_s": n_edges * iters / dt,
                      "step_time_s": dt / iters,
                      "n_edges": int(n_edges),
                      "threads": torch.get_num_threads()}))


if __name__ == "__main__":
    main()
