"""Scaling sweep: DP and edge-partitioned throughput across mesh sizes.

With one real TPU chip available, multi-chip scaling efficiency cannot
be measured on hardware; this harness runs the SAME shard_map programs
over a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N)
to (a) prove the collectives compile+run at every mesh size and (b)
record the per-size step times for regression tracking.  On a real pod
slice, run it unmodified with JAX_PLATFORMS unset.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/scaling_sweep.py --sizes 1,2,4,8
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="1,2,4,8")
    p.add_argument("--iters", default=5, type=int)
    p.add_argument("--batch_per_device", default=4, type=int)
    args = p.parse_args()

    import os

    import jax

    # the axon TPU plugin registers itself as default; honor an explicit
    # JAX_PLATFORMS=cpu request (same dance as tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from bench import build_batch
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.parallel.dp import make_dp_train_step
    from alignn_tpu.parallel.graph_parallel import (
        GRAPH_AXIS,
        check_divisible,
        make_gp_forward,
    )
    from alignn_tpu.parallel.mesh import make_mesh
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state

    sizes = [int(s) for s in args.sizes.split(",")
             if int(s) <= len(jax.devices())]
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=2, gcn_layers=2,
        hidden_features=128, embedding_features=64,
        gradwise_weight=1.0, stresswise_weight=0.1)

    shard = build_batch(batch_size=args.batch_per_device)
    n_edges = shard.src.shape[0] + shard.lg_src.shape[0]
    tx = build_optimizer("adamw", 1e-3, 0.0)

    results = {"dp": {}, "gp": {}}
    for n in sizes:
        mesh = make_mesh(n)
        model = ALIGNNAtomWise(cfg=cfg, axis_name="data")
        state = create_train_state(model, shard, tx)
        stacked = jax.tree_util.tree_map(
            lambda x: np.stack([np.asarray(x)] * n, axis=0), shard)
        step = make_dp_train_step(model, mesh, donate=False)
        state, losses = step(state, stacked)
        jax.block_until_ready(losses["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, losses = step(state, stacked)
        jax.block_until_ready(losses["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        results["dp"][n] = {"step_s": dt,
                            "edges_per_s": n_edges * n / dt}

    for n in sizes:
        try:
            check_divisible(shard, n)
        except ValueError:
            continue
        mesh = make_mesh(n, axis_names=(GRAPH_AXIS,))
        model = ALIGNNAtomWise(cfg=cfg)
        state = create_train_state(model, shard, tx)
        fwd = make_gp_forward(cfg, mesh, state.variables())
        out = fwd(shard)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(shard)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        results["gp"][n] = {"step_s": dt, "edges_per_s": n_edges / dt}

    print(json.dumps({"backend": jax.default_backend(),
                      "n_edges_per_shard": int(n_edges),
                      **results}))


if __name__ == "__main__":
    main()
