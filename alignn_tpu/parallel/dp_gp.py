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


def stacked_batch_specs() -> GraphBatch:
    """PartitionSpecs for a [D, ...]-stacked batch on the 2-D mesh."""
    fields = {}
    for name in GraphBatch.__dataclass_fields__:
        if name == "r":
            # full edge table per data row (autograd point), replicated
            # over the graph axis
            fields[name] = P(DATA_AXIS)
        elif name in _EDGE_FIELDS or name in _LG_FIELDS:
            fields[name] = P(DATA_AXIS, GRAPH_AXIS)
        else:
            fields[name] = P(DATA_AXIS)
    return GraphBatch(**fields)


def make_dp_gp_train_step(model_cfg, mesh: Mesh,
                          classification: bool = False,
                          donate: bool = True) -> Callable:
    """Jitted (state, stacked_batch) -> (state, losses) on a 2-D mesh."""
    model = ALIGNNAtomWise(cfg=model_cfg, edge_axis=GRAPH_AXIS)

    def per_device_step(state: TrainState, batch: GraphBatch):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats

            def energy_fn(r):
                res = model.apply(variables, batch, r, train=True)
                return jnp.sum(res["en_out"] * batch.graph_mask), res

            (_, res), g_r = jax.value_and_grad(
                energy_fn, has_aux=True)(batch.r)
            # psum-transpose semantics: per-chip grad is Dg x its local
            # contribution (see graph_parallel.make_gp_forward)
            g_r = jax.lax.pmean(g_r, GRAPH_AXIS)
            pair_forces = model_cfg.grad_multiplier * g_r
            if model_cfg.force_mult_natoms:
                pair_forces = pair_forces * jnp.sum(batch.n_nodes)

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
            res["grad"] = jax.lax.psum(forces_local, GRAPH_AXIS)

            if model_cfg.stresswise_weight != 0:
                r_local = jax.lax.dynamic_slice_in_dim(
                    batch.r, d * n_local, n_local, 0)
                outer = jnp.einsum("ei,ej->eij", r_local, pf_local)
                per_graph = jax.lax.psum(
                    segment_sum(outer, batch.edge_graph,
                                batch.graph_mask.shape[0]), GRAPH_AXIS)
                res["stresses"] = (
                    -model_cfg.stress_multiplier * EV_A3_TO_GPA
                    * per_graph
                    / jnp.maximum(batch.volume, 1e-12)[:, None, None])
            else:
                res["stresses"] = jnp.zeros_like(batch.stress)

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

    sharded = shard_map(
        per_device_step, mesh=mesh,
        in_specs=(P(), stacked_batch_specs()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
