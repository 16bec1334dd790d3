"""Worker for the multi-process DP rendezvous test (test_multiprocess.py).

Run modes:
  python multiproc_worker.py <rank> <port> <outdir>     # 2-process leg
  python multiproc_worker.py single - <outdir>          # 8-device baseline

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent);
the 2-process leg rendezvouses through
`alignn_tpu.parallel.mesh.initialize_distributed` (the NCCL
init_process_group analogue, reference `alignn/train_alignn.py:27-38`)
into one 8-device global mesh, shards the input stream with
`BucketedLoader(host_id, num_hosts)` (DistributedSampler parity,
reference `alignn/data.py:357-364`), and runs the production
`make_dp_train_step` with per-host shards lifted to global arrays via
`jax.make_array_from_process_local_data`.  Gradient pmean is
assignment-order invariant, so the resulting params must match the
single-process 8-device baseline to float tolerance.
"""

import json
import os
import sys


def build_records(n=16, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        frac = np.array([[0, 0, 0], [0.5, 0.5, 0.5],
                         [0.5, 0, 0], [0, 0.5, 0.5],
                         [0, 0.5, 0], [0.5, 0, 0.5],
                         [0, 0, 0.5], [0.5, 0.5, 0]], dtype=np.float64)
        frac = frac + rng.normal(0, 0.01, frac.shape)
        recs.append({
            "jid": f"s{i}",
            "lattice": (np.eye(3) * (4.2 + 0.05 * rng.standard_normal())
                        ).tolist(),
            "frac": frac.tolist(),
            "elements": ["Na", "Cl"] * 4,
            "target": float(rng.normal(0, 1))})
    return recs


def main():
    rank_arg, port, outdir = sys.argv[1], sys.argv[2], sys.argv[3]
    single = rank_arg == "single"

    if not single:
        from alignn_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(f"localhost:{port}", num_processes=2,
                               process_id=int(rank_arg))

    import jax
    import numpy as np

    if single:
        host_id, num_hosts, local_shards = 0, 1, 8
        assert len(jax.devices()) == 8
    else:
        host_id, num_hosts, local_shards = int(rank_arg), 2, 4
        assert jax.process_count() == 2, jax.process_count()
        assert len(jax.devices()) == 8, len(jax.devices())
        assert len(jax.local_devices()) == 4

    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.data.dataset import GraphDataset
    from alignn_tpu.data.loader import BucketedLoader, worst_case_spec
    from alignn_tpu.graph.batch import batch_graphs
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.parallel.dp import make_dp_train_step
    from alignn_tpu.parallel.mesh import make_mesh
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state

    recs = build_records()
    graphs = []
    for r in recs:
        a = Atoms(lattice_mat=np.array(r["lattice"]),
                  frac_coords=np.array(r["frac"]),
                  elements=r["elements"])
        g = build_graph(a, cutoff=5.0, max_neighbors=8)
        g.target = np.array([r["target"]])
        graphs.append(g)
    # spec over the FULL dataset: hosts must agree on padded shapes
    spec = worst_case_spec(graphs, 1)
    ds = GraphDataset(graphs=graphs, ids=[r["jid"] for r in recs])
    loader = BucketedLoader(ds, 1, shuffle=False, drop_last=True,
                            spec=spec, num_shards=local_shards,
                            host_id=host_id, num_hosts=num_hosts,
                            prefetch=0)

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=32, embedding_features=16,
        calculate_gradient=False, gradwise_weight=0.0,
        stresswise_weight=0.0, atomwise_weight=0.0)
    model = ALIGNNAtomWise(cfg=cfg, axis_name=None)
    init_batch = batch_graphs([graphs[0]], spec)
    tx = build_optimizer("adamw", 1e-3, 1e-5)
    state = create_train_state(model, init_batch, tx, seed=11)

    # global mesh over ALL devices (both processes' devices in the
    # 2-process leg)
    devices = np.asarray(jax.devices()).reshape(8)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(devices, ("data",))
    step = make_dp_train_step(model, mesh, criterion="l1", donate=False)
    batch_sharding = NamedSharding(mesh, P("data"))

    # static gather windows must be identical program constants across
    # processes (SPMD = same compiled program everywhere); zero them ->
    # full-range gathers on every host
    zero_wins = {k: 0 for k in BucketedLoader._WIN_FIELDS}

    losses_log = []
    for si, local in enumerate(loader):
        local = local.replace(**zero_wins)
        if single:
            gbatch = local
        else:
            gbatch = jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    batch_sharding, np.asarray(x)), local)
        state, losses = step(state, gbatch)
        losses_log.append({k: float(v)
                           for k, v in jax.device_get(losses).items()})
    if host_id == 0:
        flat = jax.tree_util.tree_leaves(jax.device_get(state.params))
        digest = [float(np.asarray(leaf, dtype=np.float64).sum())
                  for leaf in flat]
        out = {"losses": losses_log, "param_sums": digest,
               "n_steps": len(losses_log),
               "param_concat": np.concatenate(
                   [np.asarray(leaf).ravel() for leaf in flat]
               ).tolist()}
        name = "single.json" if single else "multi.json"
        with open(os.path.join(outdir, name), "w") as f:
            json.dump(out, f)
    print("worker done", rank_arg)


if __name__ == "__main__":
    main()
