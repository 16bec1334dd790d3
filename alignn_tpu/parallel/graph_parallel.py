"""Edge-partitioned graph parallelism (the pod-scale mode).

Beyond the reference's capabilities (it has data parallelism only,
SURVEY.md §2): the quadratic line-graph term |L(g)| ~ sum_i deg(i)^2 is
the memory/compute bottleneck for large crystals, so the edge and L-edge
index spaces of one (batched) graph are partitioned across the mesh —
the graph analogue of sequence/context parallelism:

- node features x: replicated; every EGGC aggregation psums its partial
  segment sums over ICI (`edge_gated_aggregate(edge_axis=...)`);
- edge index arrays + bond features y: sharded [E/D]; bond messages m
  are all-gathered between the g-stage and L(g)-stage of each ALIGNN
  layer (the halo exchange; ALIGNNConv.edge_axis);
- L-edge arrays + angle features z: sharded [L/D], never gathered;
- forces: dE/dr is psum'd, the +/- scatter runs on local shards and
  psums into the replicated [N, 3] force table.

Per-layer ICI traffic: psum([N,F]) + all_gather([E,F]) + psum([E,F]);
per-chip memory for the dominant L terms drops by D.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
# jax.shard_map (0.8+) renamed check_rep; stay on the experimental
# entry point whose signature we pin (check_rep=False)
from jax.experimental.shard_map import shard_map

from alignn_tpu.graph.batch import GraphBatch
from alignn_tpu.nn.models import (
    ALIGNNAtomWise,
    ALIGNNAtomWiseConfig,
    EV_A3_TO_GPA,
)
from alignn_tpu.ops.segment import segment_sum

GRAPH_AXIS = "graph"

# which GraphBatch fields shard over the edge axis
_EDGE_FIELDS = {"src", "dst", "r", "images", "edge_graph", "edge_mask"}
_LG_FIELDS = {"lg_src", "lg_dst", "lg_mask"}


def batch_specs() -> GraphBatch:
    """PartitionSpec pytree for a GraphBatch in edge-partitioned mode."""
    fields = {}
    for name in GraphBatch.__dataclass_fields__:
        if name in _EDGE_FIELDS or name in _LG_FIELDS:
            fields[name] = P(GRAPH_AXIS)
        else:
            fields[name] = P()
    return GraphBatch(**fields)


def check_divisible(batch: GraphBatch, n_devices: int):
    e = batch.src.shape[0]
    lg = batch.lg_src.shape[0]
    if e % n_devices or lg % n_devices:
        raise ValueError(
            f"edge ({e}) / L-edge ({lg}) counts must divide the mesh "
            f"size {n_devices}; adjust bucket quanta")


def make_gp_forward(model_cfg: ALIGNNAtomWiseConfig, mesh: Mesh,
                    variables):
    """Jitted edge-partitioned FF forward: batch -> (out, forces, stress).

    The returned function takes an UNsharded GraphBatch; shard_map
    splits the edge/L-edge fields across `mesh` and returns replicated
    outputs.  `batch.r` must be the full edge displacement table (it is
    passed replicated as the autograd point for forces).
    """
    model = ALIGNNAtomWise(cfg=model_cfg, edge_axis=GRAPH_AXIS)

    def per_device(batch: GraphBatch):
        r_full = batch.r  # replicated [E, 3]

        def energy_fn(r):
            res = model.apply(variables, batch, r, train=False)
            return jnp.sum(res["en_out"] * batch.graph_mask), res

        (_, res), g_r = jax.value_and_grad(
            energy_fn, has_aux=True)(r_full)
        # JAX transposes psum to psum (not pbroadcast), so each chip's
        # grad is D x its local-edge contribution; pmean over the axis
        # (= psum / D) yields the exact full dE/dr.  Verified against
        # the unpartitioned forward in tests/test_graph_parallel.py.
        g_r = jax.lax.pmean(g_r, GRAPH_AXIS)
        pair_forces = model_cfg.grad_multiplier * g_r  # full [E, 3]
        if model_cfg.force_mult_natoms:
            pair_forces = pair_forces * jnp.sum(batch.n_nodes)

        # scatter on the local shard, reduce across chips
        n_local = batch.src.shape[0]
        d = jax.lax.axis_index(GRAPH_AXIS)
        pf_local = jax.lax.dynamic_slice_in_dim(
            pair_forces, d * n_local, n_local, 0)
        num_nodes = batch.z.shape[0]
        forces_ji = segment_sum(pf_local, batch.dst, num_nodes)
        if model_cfg.add_reverse_forces:
            forces_ij = segment_sum(pf_local, batch.src, num_nodes)
            forces_local = forces_ji - forces_ij
        else:
            forces_local = forces_ji
        forces = jax.lax.psum(forces_local, GRAPH_AXIS)

        if model_cfg.stresswise_weight != 0:
            r_local = jax.lax.dynamic_slice_in_dim(
                r_full, d * n_local, n_local, 0)
            outer = jnp.einsum("ei,ej->eij", r_local, pf_local)
            per_graph = segment_sum(outer, batch.edge_graph,
                                    batch.graph_mask.shape[0])
            per_graph = jax.lax.psum(per_graph, GRAPH_AXIS)
            stress = (-model_cfg.stress_multiplier * EV_A3_TO_GPA
                      * per_graph
                      / jnp.maximum(batch.volume, 1e-12)[:, None, None])
        else:
            stress = jnp.zeros_like(batch.stress)
        return res["out"], forces, stress

    specs = batch_specs()
    # r is consumed replicated (full table) even though it's edge-indexed
    specs = specs.replace(r=P())
    sharded = shard_map(per_device, mesh=mesh, in_specs=(specs,),
                        out_specs=(P(), P(), P()), check_rep=False)
    return jax.jit(sharded)


def edges_per_second_scaling(model_cfg, batch: GraphBatch,
                             mesh_sizes=(1, 2, 4, 8),
                             iters: int = 5) -> Dict[int, float]:
    """Edges/s of the gp forward at several mesh sizes (benchmark aid)."""
    import time

    from alignn_tpu.parallel.mesh import make_mesh
    from alignn_tpu.train.state import create_train_state
    from alignn_tpu.train.optim import build_optimizer

    model = ALIGNNAtomWise(cfg=model_cfg)
    tx = build_optimizer("adamw", 1e-3, 0.0)
    state = create_train_state(model, batch, tx)
    n_edges = batch.src.shape[0] + batch.lg_src.shape[0]
    out = {}
    for n in mesh_sizes:
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(n, axis_names=(GRAPH_AXIS,))
        check_divisible(batch, n)
        fwd = make_gp_forward(model.cfg, mesh, state.variables())
        res = fwd(batch)
        jax.block_until_ready(res)
        t0 = time.perf_counter()
        for _ in range(iters):
            res = fwd(batch)
        jax.block_until_ready(res)
        dt = (time.perf_counter() - t0) / iters
        out[n] = n_edges / dt
    return out
