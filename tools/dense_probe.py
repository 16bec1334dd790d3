"""TPU probe: dense-neighborhood layout vs sparse, full E/F/S train step.

Sparse round-3 ledger (tools/step_probe.py): b64 49.1 ms / b128 110.2 /
b256 287.5.  Dense should cut the gather/scatter traffic (~half the
step) to near zero.

Usage: python -u -m tools.dense_probe [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import time


def build_dense(batch_size, seed=0):
    import numpy as np

    from bench import build_batch  # noqa: F401  (reuse graph recipe)
    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.graph.dense import (
        dense_batch_graphs,
        dense_spec_for_batch,
    )

    rng = np.random.default_rng(seed)
    graphs = []
    elems = ["Na", "Cl", "K", "Br", "Mg", "O", "Ca", "S"]
    for i in range(batch_size):
        a = 4.2 + 0.3 * rng.standard_normal()
        base = np.array([
            [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
            [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5]])
        frac = base + 0.02 * rng.standard_normal((8, 3))
        atoms = Atoms(lattice_mat=np.eye(3) * a, frac_coords=frac,
                      elements=[elems[j % len(elems)] for j in range(8)])
        g = build_graph(atoms, cutoff=8.0, max_neighbors=12)
        g.target = np.array([rng.standard_normal()])
        g.forces = rng.standard_normal((8, 3)) * 0.1
        g.stress = np.eye(3) * 0.01
        graphs.append(g)
    spec = dense_spec_for_batch(graphs)
    return dense_batch_graphs(graphs, spec, target_width=1)


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[64, 128, 256])
    ap.add_argument("--variants", nargs="*", default=["unfused"],
                    help="unfused (production default) | fused "
                         "(ALIGNN_TPU_FUSED_LSTAGE=1) | fwdonly "
                         "(fused fwd kernel, XLA backward)")
    ap.add_argument("--fwd-only", action="store_true",
                    help="measure the pure forward (no autodiff)")
    ap.add_argument("--ef-only", action="store_true",
                    help="measure atomwise_forward (E/F/S, first-order "
                         "force VJP, no training grad)")
    ap.add_argument("--no-analysis", action="store_true",
                    help="skip XLA cost/memory analysis (avoids a second "
                         "compile per config on the remote service)")
    args = ap.parse_args()

    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state, make_train_step

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=4, gcn_layers=4,
        hidden_features=256, embedding_features=64,
        gradwise_weight=10.0, stresswise_weight=0.1, graphwise_weight=1.0)
    model = ALIGNNAtomWise(cfg=cfg, dtype=jnp.bfloat16)
    tx = build_optimizer("adamw", 1e-3, 1e-5)

    import os

    import numpy as np

    for bs in args.batches:
        # build + upload the batch ONCE per size (the remote tunnel
        # makes transfers expensive); variants share it
        batch = jax.device_put(build_dense(bs))
        # count REAL edges+L-edges for comparable edges/s
        n_edges = int(np.asarray(batch.edge_mask).sum()
                      + np.asarray(batch.lg_mask).sum())
        n_rows = batch.src.shape[0] + batch.lg_src.shape[0]
        for variant in args.variants:
            # the fused-L-stage gate is read at trace time, so flipping
            # the env between freshly-built step fns A/Bs it in ONE
            # process
            os.environ.pop("ALIGNN_TPU_FUSED_LSTAGE", None)
            os.environ.pop("ALIGNN_TPU_DISABLE_FUSED_BWD", None)
            if variant == "fused":
                os.environ["ALIGNN_TPU_FUSED_LSTAGE"] = "1"
            elif variant == "fwdonly":
                os.environ["ALIGNN_TPU_FUSED_LSTAGE"] = "1"
                os.environ["ALIGNN_TPU_DISABLE_FUSED_BWD"] = "1"
            _run_variant(args, model, tx, batch, bs, variant,
                         n_edges, n_rows)


def _run_variant(args, model, tx, batch, bs, variant, n_edges, n_rows):
    import json
    import time

    import jax
    import jax.numpy as jnp

    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.train.state import create_train_state, make_train_step

    if args.fwd_only:
        # pure forward (energy head only, no autodiff): isolates
        # the forward-kernel cost from the backward/recompute story
        fcfg = ALIGNNAtomWiseConfig(
            name="alignn_atomwise", alignn_layers=4, gcn_layers=4,
            hidden_features=256, embedding_features=64,
            calculate_gradient=False, gradwise_weight=0.0)
        fmodel = ALIGNNAtomWise(cfg=fcfg, dtype=jnp.bfloat16)
        variables = fmodel.init(jax.random.PRNGKey(0), batch,
                                batch.r, train=False)
        fwd = jax.jit(lambda v, bt: fmodel.apply(
            v, bt, bt.r, train=False)["out"])
        out = fwd(variables, batch)
        float(jax.device_get(out).sum())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(variables, batch)
        float(jax.device_get(out).sum())
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "probe": f"dense_fwd_b{bs}_{variant}",
            "ms": round(1e3 * dt, 2),
            "real_edges_per_s": round(n_edges / dt)}), flush=True)
        return
    if args.ef_only:
        # E + forces + stress (the MD/inference workload): first-order
        # force VJP only — decomposes the train step's outer-grad share
        from alignn_tpu.nn.models import atomwise_forward

        variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                               train=False)

        def ef(v, bt):
            res = atomwise_forward(model, v, bt, train=False)
            return res["out"], res["grad"], res["stresses"]

        eff = jax.jit(ef)
        out = eff(variables, batch)
        float(jax.device_get(out[1]).sum())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = eff(variables, batch)
        float(jax.device_get(out[1]).sum())
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "probe": f"dense_ef_b{bs}_{variant}",
            "ms": round(1e3 * dt, 2),
            "real_edges_per_s": round(n_edges / dt)}), flush=True)
        return
    state = create_train_state(model, batch, tx)
    step = make_train_step(model, criterion="l1", donate=False)

    state, losses = step(state, batch)  # compile
    float(jax.device_get(losses["loss"]))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, losses = step(state, batch)
    float(jax.device_get(losses["loss"]))
    dt = (time.perf_counter() - t0) / args.iters
    rec = {"probe": f"dense_step_b{bs}_{variant}",
           "ms": round(1e3 * dt, 1),
           "real_edges_per_s": round(n_edges / dt),
           "rows": n_rows, "D": batch.dense_D}
    if args.no_analysis:
        print(json.dumps(rec), flush=True)
        return
    try:
        compiled = jax.jit(step.__wrapped__
                           if hasattr(step, "__wrapped__") else step,
                           donate_argnums=()).lower(
            state, batch).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        ma = compiled.memory_analysis()
        rec["gflops"] = round(float(ca.get("flops", 0)) / 1e9, 1)
        rec["gbytes"] = round(
            float(ca.get("bytes accessed", 0)) / 1e9, 2)
        if ma is not None:
            rec["temp_mb"] = round(ma.temp_size_in_bytes / 1e6)
    except Exception as exc:  # noqa: BLE001
        rec["analysis_error"] = str(exc)[:120]
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
