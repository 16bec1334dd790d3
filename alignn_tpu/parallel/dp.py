"""Data-parallel training step via shard_map + gradient pmean.

Replaces PyTorch DDP (reference `train.py:205-207`: allreduce hooks inside
`loss.backward()`) with an explicit SPMD program: the batch arrives
stacked `[D, ...]` (one micro-batch per device, built by
`BucketedLoader(num_shards=D)`), the state is replicated, gradients are
`pmean`-ed over the mesh's ICI, and every device applies the identical
update.  BatchNorm statistics reduce across the mesh through the model's
`axis_name` (strictly better than DDP's per-device stats — SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax
from jax.sharding import Mesh, PartitionSpec as P
# jax.shard_map (0.8+) renamed check_rep; stay on the experimental
# entry point whose signature we pin (check_rep=False)
from jax.experimental.shard_map import shard_map

from alignn_tpu.train.state import TrainState, _forward_and_loss


AXIS = "data"


def make_dp_train_step(model, mesh: Mesh, criterion: str = "l1",
                       classification: bool = False,
                       donate: bool = True) -> Callable:
    """Jitted (state, stacked_batch) -> (state, metrics) over the mesh."""

    def per_device_step(state: TrainState, batch):
        # batch leaves arrive [1, ...] on each device; drop the shard axis
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)

        def loss_fn(params):
            return _forward_and_loss(
                model, params, state.batch_stats, batch, criterion,
                classification, train=True)

        grads, (losses, _res, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, AXIS)
        losses = jax.lax.pmean(losses, AXIS)
        if state.batch_stats:
            new_stats = jax.lax.pmean(new_stats, AXIS)
        updates, opt_state = state.tx.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state)
        return new_state, losses

    sharded = shard_map(
        per_device_step, mesh=mesh,
        in_specs=(P(), P(AXIS)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def train_model_dp(config, train_loader, val_loader, test_loader=None,
                   n_devices: Optional[int] = None,
                   restart_params_path: Optional[str] = None,
                   restart_state_path: Optional[str] = None):
    """Data-parallel variant of :func:`alignn_tpu.train.trainer.train_model`.

    Reuses the single-device trainer loop but swaps in the shard_map
    step; the train loader must be built with `num_shards=<data size>`.
    With ``config.mesh_shape == {"data": D, "graph": G}`` (G > 1) the
    combined 2-D step of :mod:`alignn_tpu.parallel.dp_gp` is used: each
    data row additionally edge-partitions its micro-batch over G chips.
    """
    from alignn_tpu.parallel.mesh import make_mesh
    from alignn_tpu.train import trainer as _trainer

    mesh_shape = getattr(config, "mesh_shape", None) or {}
    g_size = int(mesh_shape.get("graph", 1))
    d_size = int(mesh_shape.get("data",
                                (n_devices or len(jax.devices())) //
                                max(g_size, 1)))
    if g_size > 1:
        from alignn_tpu.parallel.dp_gp import (
            DATA_AXIS,
            GRAPH_AXIS,
            make_dp_gp_train_step,
        )

        mesh = make_mesh(d_size * g_size, axis_names=(DATA_AXIS,
                                                      GRAPH_AXIS),
                         shape=(d_size, g_size))
        if train_loader.num_shards != d_size:
            raise ValueError(
                f"train loader num_shards={train_loader.num_shards} != "
                f"data mesh size {d_size}")

        def step_factory(model, criterion, classification, donate):
            from alignn_tpu.nn.models import ALIGNNAtomWise

            if not isinstance(model, ALIGNNAtomWise):
                raise ValueError(
                    "graph-axis parallelism requires an atomwise model "
                    "(the property model has no edge-partitioned step)")
            if getattr(train_loader.spec, "dense_D", 0):
                # dense-layout batches shard with the halo-exchange GP
                # (parallel/dense_gp.py) instead of the sparse ring
                from alignn_tpu.parallel.dense_gp import (
                    make_dp_dense_gp_train_step,
                )

                return make_dp_dense_gp_train_step(
                    model.cfg, mesh, classification=classification,
                    donate=donate)
            return make_dp_gp_train_step(model.cfg, mesh,
                                         classification=classification,
                                         donate=donate)

        return _trainer.train_model(
            config, train_loader, val_loader, test_loader,
            restart_params_path=restart_params_path,
            restart_state_path=restart_state_path,
            train_step_factory=step_factory)

    # 1-D DP: a configured mesh_shape["data"] wins over "all devices"
    # (it was previously parsed and then silently ignored)
    mesh = make_mesh(n_devices if n_devices is not None
                     else (d_size if "data" in mesh_shape else None))
    n = mesh.devices.size
    if train_loader.num_shards != n:
        raise ValueError(
            f"train loader num_shards={train_loader.num_shards} != mesh "
            f"size {n}; build loaders with num_shards={n}")

    def step_factory(model, criterion, classification, donate):
        return make_dp_train_step(model, mesh, criterion=criterion,
                                  classification=classification,
                                  donate=donate)

    return _trainer.train_model(
        config, train_loader, val_loader, test_loader,
        restart_params_path=restart_params_path,
        restart_state_path=restart_state_path,
        train_step_factory=step_factory,
        model_axis_name=AXIS)
