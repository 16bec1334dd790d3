#!/usr/bin/env python
"""Closed-form energy-head recalibration for the combined `all` model.

The FF energy readout is LINEAR in the mean-pooled node features
(`nn/models.py atomwise_heads`: h = graph_readout_mean(x),
out = Dense(1, "fc")(h), identity link) — so with the trunk FROZEN the
energy fit is ridge regression, solvable exactly on the host.
Regularizing toward the force-trained head (w0, b0):

    min_w ||H w - t||^2 + lam ||w - w0||^2

sweeps the energy<->force trade continuously with ZERO training steps:
lam -> inf recovers the shipped force model (energy uncalibrated),
lam -> 0 is the energy-optimal head on the frozen trunk.  Forces are
linear in w too (F = -N w . dx/dr), so intermediate lam interpolates
the force field between the trained one and the energy-optimal one.

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
        tools/energy_head_refit.py --model runs/mlearn_r5/all \
        --data runs/mlearn_r5/all_data/id_prop.json
"""

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="runs/mlearn_r5/all")
    ap.add_argument("--data",
                    default="runs/mlearn_r5/all_data/id_prop.json")
    ap.add_argument("--out", default="docs/mlearn_r5/head_refit.json")
    ap.add_argument("--force_lams", default="1e-2,1e-1,1,10")
    args = ap.parse_args()

    import jax

    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.data.baseline import baseline_per_atom
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.nn.models import atomwise_forward
    from alignn_tpu.ops.segment import graph_readout_mean
    from alignn_tpu.zoo import load_model_dir

    model, variables, cfg = load_model_dir(args.model)
    sb = (cfg.get("species_baseline") or {}).get("elements", {})
    with open(os.path.join(args.model,
                           "ids_train_val_test.json")) as f:
        ids = json.load(f)
    rows = {r["jid"]: r for r in json.load(open(args.data))}

    gkw = dict(neighbor_strategy=cfg.get("neighbor_strategy",
                                         "k-nearest"),
               cutoff=float(cfg.get("cutoff", 8.0)),
               max_neighbors=int(cfg.get("max_neighbors", 12)),
               use_canonize=bool(cfg.get("use_canonize", True)))

    def graphs_for(split):
        out = []
        for jid in ids[split]:
            r = rows[jid]
            a = Atoms.from_dict(r["atoms"])
            g = build_graph(a, **gkw)
            t = float(r["total_energy"]) - baseline_per_atom(
                a.elements, sb)
            fr = np.asarray(r["forces"], dtype=np.float64)
            out.append((jid, g, t, fr, a.num_atoms))
        return out

    # shared per-structure bucket so ONE compile covers every forward
    print("building graphs...")
    tr = graphs_for("id_train")
    te = graphs_for("id_test")
    all_gs = [g for _, g, _, _, _ in tr + te]
    spec = BucketSpec(
        n_nodes=max(g.num_nodes for g in all_gs) + 8,
        n_edges=max(g.num_edges for g in all_gs) + 8,
        n_lg_edges=max(g.num_lg_edges for g in all_gs) + 8,
        n_graphs=2)

    @jax.jit
    def pooled(batch):
        res, state = model.apply(
            variables, batch, batch.r, train=False, mutable=[],
            capture_intermediates=True)
        inter = state["intermediates"]
        # the trunk module's OWN __call__ output (x, y): x is the
        # final [N, F] node table feeding the readout (a nested search
        # wrongly grabbed a mid-trunk layer output first)
        x = inter["trunk"]["__call__"][0][0]
        h = graph_readout_mean(x, batch.node_graph, batch.n_nodes)
        return h[0], res["out"][0, 0]

    def features(split_rows, label):
        hs, outs = [], []
        for i, (jid, g, t, fr, n) in enumerate(split_rows):
            b = batch_graphs([g], spec)
            h, o = jax.device_get(pooled(b))
            hs.append(np.asarray(h, dtype=np.float64))
            outs.append(float(o))
            if (i + 1) % 200 == 0:
                print(f"  {label} {i + 1}/{len(split_rows)}")
        return np.stack(hs), np.array(outs)

    print("extracting pooled features (train)...")
    h_tr, out_tr = features(tr, "train")
    print("extracting pooled features (test)...")
    h_te, out_te = features(te, "test")
    t_tr = np.array([t for _, _, t, _, _ in tr])
    t_te = np.array([t for _, _, t, _, _ in te])

    # sanity: h @ w0 + b0 must reproduce the model's own out
    p = variables["params"]["fc"]
    w0 = np.asarray(p["kernel"], dtype=np.float64).reshape(-1)
    b0 = float(np.asarray(p["bias"]).reshape(()))
    recon = h_tr @ w0 + b0
    rec_err = np.abs(recon - out_tr).max()
    print(f"linear-head reconstruction max err: {rec_err:.2e}")
    assert rec_err < 1e-3, "head is not linear in pooled features?"

    lams = [10 ** e for e in range(-4, 5)]
    sweep = []
    d = h_tr.shape[1]
    hth = h_tr.T @ h_tr
    # bias handled by centering against the ridge target w0/b0
    for lam in lams:
        a = hth + lam * np.eye(d)
        # augment bias: solve jointly [H 1]
        ha = np.concatenate([h_tr, np.ones((len(h_tr), 1))], axis=1)
        aa = ha.T @ ha + lam * np.eye(d + 1)
        rhs = ha.T @ t_tr + lam * np.concatenate([w0, [b0]])
        wb = np.linalg.solve(aa, rhs)
        w, b = wb[:-1], wb[-1]
        e_tr = np.abs(h_tr @ w + b - t_tr).mean()
        e_te = np.abs(h_te @ w + b - t_te).mean()
        dw = float(np.linalg.norm(w - w0) / np.linalg.norm(w0))
        sweep.append({"lam": lam, "train_energy_mae": float(e_tr),
                      "test_energy_mae": float(e_te),
                      "rel_head_change": dw})
        print(f"lam={lam:g}: E_tr {e_tr:.4f} E_te {e_te:.4f} "
              f"|dw|/|w0| {dw:.3f}")

    # force evaluation for selected lams
    @jax.jit
    def eval_full(variables, batch):
        res = atomwise_forward(model, variables, batch, train=False)
        return res["out"], res["grad"]

    force_checks = []
    for lam in [float(x) for x in args.force_lams.split(",")]:
        ha = np.concatenate([h_tr, np.ones((len(h_tr), 1))], axis=1)
        aa = ha.T @ ha + lam * np.eye(d + 1)
        rhs = ha.T @ t_tr + lam * np.concatenate([w0, [b0]])
        wb = np.linalg.solve(aa, rhs)
        w, b = wb[:-1], wb[-1]
        v2 = jax.tree_util.tree_map(lambda x: x, variables)
        import flax

        v2 = flax.core.unfreeze(v2) if hasattr(
            flax.core, "unfreeze") else dict(v2)
        v2["params"] = dict(v2["params"])
        v2["params"]["fc"] = {
            "kernel": w.reshape(-1, 1).astype(np.float32),
            "bias": np.array([b], dtype=np.float32)}
        e_err, f_err = [], []
        for jid, g, t, fr, n in te:
            b1 = batch_graphs([g], spec)
            o, grad = jax.device_get(eval_full(v2, b1))
            e_err.append(abs(float(o[0, 0]) - t))
            f_err.append(np.abs(np.asarray(grad)[:n] - fr).ravel())
        force_checks.append({
            "lam": lam,
            "test_energy_mae": float(np.mean(e_err)),
            "test_force_mae": float(np.mean(np.concatenate(f_err)))})
        print(f"FORCE lam={lam:g}: E {force_checks[-1]['test_energy_mae']:.4f} "
              f"F {force_checks[-1]['test_force_mae']:.4f}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"sweep": sweep, "force_checks": force_checks,
                   "model": args.model}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
