"""Train state pytree + jitted train/eval step factories.

The whole optimization step — forward (with force/stress autograd),
loss, backward, optimizer update, BatchNorm stat update — is ONE jitted
function over statically-shaped :class:`GraphBatch` pytrees.  This
replaces the reference's per-batch Python loop body
(`alignn/train.py:258-388`) and DDP gradient hooks with a single XLA
program; under data parallelism the same step runs inside `shard_map`
with `psum` gradient reduction (see :mod:`alignn_tpu.parallel`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from alignn_tpu.graph.batch import GraphBatch
from alignn_tpu.nn.models import (
    ALIGNN,
    ALIGNNAtomWise,
    atomwise_forward,
)
from alignn_tpu.train.losses import atomwise_loss, property_loss


@struct.dataclass
class TrainState:
    """Parameters + mutable collections + optimizer state."""

    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def set_lr(self, lr: float) -> "TrainState":
        """Write the injected learning rate (host-side, per epoch)."""
        hp = dict(self.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
        opt_state = self.opt_state._replace(hyperparams=hp)
        return self.replace(opt_state=opt_state)


def create_train_state(model, sample_batch: GraphBatch, tx,
                       seed: int = 123) -> TrainState:
    """Initialize parameters on the sample batch shape."""
    from alignn_tpu.nn.ealignn import eALIGNNAtomWise

    rng = jax.random.PRNGKey(seed)
    # jit the init: eager initialization issues hundreds of small
    # per-op compiles (minutes through a remote TPU compile service);
    # under jit it is ONE compile.
    if isinstance(model, eALIGNNAtomWise):
        variables = jax.jit(
            lambda r, b: model.init(r, b, b.frac_coords, train=False))(
            rng, sample_batch)
    elif isinstance(model, ALIGNNAtomWise):
        variables = jax.jit(
            lambda r, b: model.init(r, b, b.r, train=False))(
            rng, sample_batch)
    else:
        variables = jax.jit(
            lambda r, b: model.init(r, b, train=False))(rng, sample_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def _forward_and_loss(model, params, batch_stats, batch: GraphBatch,
                      criterion: str, classification: bool,
                      train: bool):
    """Returns (loss, (aux_losses, predictions, new_batch_stats))."""
    variables = {"params": params}
    mutable = []
    if batch_stats:
        variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if train else []

    from alignn_tpu.nn.ealignn import eALIGNNAtomWise, ealignn_forward

    if isinstance(model, eALIGNNAtomWise):
        res = ealignn_forward(model, variables, batch, train=train)
        losses = atomwise_loss(res, batch, model.cfg,
                               classification=classification)
        return losses["loss"], (losses, res, batch_stats)

    if isinstance(model, ALIGNNAtomWise):
        if mutable:
            # thread batch_stats mutation through the force autograd:
            # run once mutating to collect stats, then the grad pass uses
            # the frozen stats (LayerNorm default makes this a no-op for
            # the standard FF config).
            _, updates = model.apply(variables, batch, batch.r,
                                     train=train, mutable=mutable)
            new_stats = updates["batch_stats"]
        else:
            new_stats = batch_stats
        res = atomwise_forward(model, variables, batch, train=train)
        losses = atomwise_loss(res, batch, model.cfg,
                               classification=classification)
        return losses["loss"], (losses, res, new_stats)

    if mutable:
        out, updates = model.apply(variables, batch, train=train,
                                   mutable=mutable)
        new_stats = updates["batch_stats"]
    else:
        out = model.apply(variables, batch, train=train)
        new_stats = batch_stats
    loss = property_loss(out, batch, criterion, classification)
    losses = {"loss": loss}
    return loss, (losses, {"out": out}, new_stats)


def make_train_step(model, criterion: str = "l1",
                    classification: bool = False,
                    axis_name: Optional[str] = None,
                    donate: bool = True) -> Callable:
    """Jitted (state, batch) -> (state, metrics) training step."""

    def step(state: TrainState, batch: GraphBatch):
        def loss_fn(params):
            return _forward_and_loss(
                model, params, state.batch_stats, batch, criterion,
                classification, train=True)

        grads, (losses, _res, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            losses = jax.lax.pmean(losses, axis_name)
        updates, opt_state = state.tx.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state)
        return new_state, losses

    if axis_name is not None:
        return step  # caller wraps in shard_map
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, criterion: str = "l1",
                   classification: bool = False) -> Callable:
    """Jitted (state, batch) -> (losses, predictions) eval step."""

    def step(state: TrainState, batch: GraphBatch):
        _, (losses, res, _) = _forward_and_loss(
            model, state.params, state.batch_stats, batch, criterion,
            classification, train=False)
        return losses, res

    return jax.jit(step)
