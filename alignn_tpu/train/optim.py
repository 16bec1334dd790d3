"""Optimizer construction: parameter-group decay + AdamW/SGD + OneCycle.

Replaces reference `group_decay`/`setup_optimizer`
(`alignn/utils.py:77-108`) and the OneCycleLR wiring
(`alignn/train.py:217-227`).  The reference steps OneCycle **per epoch**
(train.py:395) with `steps_per_epoch=len(train_loader)` — so the schedule
horizon is `epochs * steps_per_epoch` but only `epochs` steps are ever
taken; reproduced exactly via `onecycle_lr(..., per_epoch=True)`.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def no_decay_mask(params) -> Any:
    """True where weight decay applies.

    Parity with reference `group_decay` (utils.py:77-90): biases and all
    norm-layer parameters (scale/bias of Batch/LayerNorm) are excluded.
    """
    def decide(path, leaf) -> bool:
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys and keys[-1] == "bias":
            return False
        if any("norm" in str(k) for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def onecycle_lr(max_lr: float, total_steps: int, pct_start: float = 0.3,
                div_factor: float = 25.0,
                final_div_factor: float = 1e4) -> Callable[[int], float]:
    """torch OneCycleLR (cos anneal) as a schedule fn of the step index."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_steps = max(int(pct_start * total_steps) - 1, 1)
    down_steps = max(total_steps - up_steps - 1, 1)

    def schedule(step):
        step = jnp.minimum(step, total_steps - 1)
        up_frac = jnp.clip(step / up_steps, 0.0, 1.0)
        lr_up = initial_lr + (max_lr - initial_lr) * 0.5 * (
            1 - jnp.cos(math.pi * up_frac))
        down_frac = jnp.clip((step - up_steps) / down_steps, 0.0, 1.0)
        lr_down = min_lr + (max_lr - min_lr) * 0.5 * (
            1 + jnp.cos(math.pi * down_frac))
        return jnp.where(step <= up_steps, lr_up, lr_down)

    return schedule


def build_optimizer(
    optimizer: str = "adamw",
    learning_rate: float = 1e-2,
    weight_decay: float = 0.0,
    params=None,
) -> optax.GradientTransformation:
    """AdamW/SGD with decay masking and an *injected* learning rate.

    The LR lives in the optimizer state as data
    (`opt_state.hyperparams['learning_rate']`), so the trainer can follow
    the reference's per-epoch OneCycle stepping (train.py:395) by writing
    the schedule value from the host each epoch — no recompile, no traced
    Python state.
    """
    mask = no_decay_mask(params) if params is not None else None
    if optimizer == "adamw":
        tx = optax.inject_hyperparams(
            lambda learning_rate: optax.adamw(
                learning_rate=learning_rate, weight_decay=weight_decay,
                mask=mask))(learning_rate=learning_rate)
    elif optimizer == "sgd":
        tx = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(weight_decay, mask=mask),
                optax.sgd(learning_rate=learning_rate, momentum=0.9),
            ))(learning_rate=learning_rate)
    else:
        raise ValueError(f"unknown optimizer: {optimizer}")
    return tx


def epoch_lr(scheduler: str, learning_rate: float, epochs: int,
             epoch: int) -> float:
    """Host-side LR for `epoch` under the reference's stepping convention."""
    if scheduler == "onecycle":
        return float(onecycle_lr(learning_rate, max(epochs, 1))(epoch))
    return float(learning_rate)
