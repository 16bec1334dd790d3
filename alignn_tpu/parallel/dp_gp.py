"""Combined data x graph parallelism over a 2-D mesh.

The pod-scale configuration: the mesh is ("data", "graph") — each data
row holds a different micro-batch; within a row, the micro-batch's edge
and L-edge index spaces shard over the "graph" axis (the
edge-partitioned mode of :mod:`alignn_tpu.parallel.graph_parallel`).
Gradients pmean over BOTH axes; the force/stress heads run the
edge-partitioned reduction per data row.

Batch layout: stacked GraphBatch with leading axis = data mesh size
(built by `BucketedLoader(num_shards=data_size)`); edge/L-edge fields
shard over ("data", "graph"), everything else over ("data",).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
# jax.shard_map (0.8+) renamed check_rep; stay on the experimental
# entry point whose signature we pin (check_rep=False)
from jax.experimental.shard_map import shard_map

from alignn_tpu.graph.batch import GraphBatch
from alignn_tpu.nn.models import ALIGNNAtomWise, EV_A3_TO_GPA
from alignn_tpu.ops.segment import segment_sum
from alignn_tpu.parallel.graph_parallel import _EDGE_FIELDS, _LG_FIELDS
from alignn_tpu.train.losses import atomwise_loss
from alignn_tpu.train.state import TrainState

DATA_AXIS = "data"
GRAPH_AXIS = "graph"


def stacked_batch_specs(batch: GraphBatch) -> GraphBatch:
    """PartitionSpecs for a [D, ...]-stacked batch on the 2-D mesh.

    V2: r shards over the graph axis like every other edge field.
    Derived from `batch` via `.replace` so static fields (win_*)
    match between the spec tree and the data tree.
    """
    from alignn_tpu.parallel.graph_parallel import _pytree_field_names

    fields = {}
    for name in _pytree_field_names():
        if name in _EDGE_FIELDS or name in _LG_FIELDS:
            fields[name] = P(DATA_AXIS, GRAPH_AXIS)
        else:
            fields[name] = P(DATA_AXIS)
    return batch.replace(**fields)


def stacked_ring_specs(ring):
    from alignn_tpu.parallel.gp_batch import RingIndex

    return RingIndex(lg_src=P(DATA_AXIS, GRAPH_AXIS),
                     lg_dst=P(DATA_AXIS, GRAPH_AXIS),
                     lg_mask=P(DATA_AXIS, GRAPH_AXIS),
                     steps=ring.steps, n_shards=ring.n_shards)


def make_dp_gp_train_step(model_cfg, mesh: Mesh,
                          classification: bool = False,
                          donate: bool = True) -> Callable:
    """Jitted (state, stacked_batch, ring) -> (state, losses), 2-D mesh.

    V2 (ring pipeline): per data row, the micro-batch runs the
    edge-sharded GPALIGNNAtomWise with ring halo exchange
    (parallel/gp_model.py); the `ring` argument comes from
    `gp_batch.make_stacked_ring(batch, gp_size)`.
    """
    from alignn_tpu.parallel.gp_model import GPALIGNNAtomWise
    from alignn_tpu.parallel.graph_parallel import gp_device_outputs

    model = GPALIGNNAtomWise(cfg=model_cfg, axis_name=GRAPH_AXIS)
    gp_size = mesh.devices.shape[mesh.axis_names.index(GRAPH_AXIS)]

    def per_device_step(state: TrainState, batch: GraphBatch, ring):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        ring = ring.replace(
            lg_src=ring.lg_src[0], lg_dst=ring.lg_dst[0],
            lg_mask=ring.lg_mask[0])

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, forces, stress, res = gp_device_outputs(
                model, model_cfg, variables, batch, ring, gp_size,
                train=True)
            res["grad"] = forces
            res["stresses"] = stress
            losses = atomwise_loss(res, batch, model_cfg,
                                   classification=classification)
            return losses["loss"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
        # graph axis: per-chip grads are Dg x local share -> pmean;
        # data axis: average micro-batch gradients
        grads = jax.lax.pmean(jax.lax.pmean(grads, GRAPH_AXIS), DATA_AXIS)
        losses = jax.lax.pmean(jax.lax.pmean(losses, GRAPH_AXIS),
                               DATA_AXIS)
        updates, opt_state = state.tx.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, losses

    from alignn_tpu.parallel.gp_batch import make_stacked_ring

    compiled = {}
    steps_floor = [None]  # monotone ring-step floor -> bounded recompiles

    def step(state: TrainState, batch: GraphBatch, ring=None):
        if ring is None:
            ring = make_stacked_ring(batch, gp_size,
                                     min_steps=steps_floor[0])
            steps_floor[0] = ring.steps
        key = (ring.steps, ring.n_shards, batch.static_windows)
        if key not in compiled:
            compiled[key] = jax.jit(shard_map(
                per_device_step, mesh=mesh,
                in_specs=(P(), stacked_batch_specs(batch),
                          stacked_ring_specs(ring)),
                out_specs=(P(), P()),
                check_rep=False,
            ), donate_argnums=(0,) if donate else ())
        return compiled[key](state, batch, ring)

    return step
