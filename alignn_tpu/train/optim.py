"""Optimizer construction: parameter-group decay + AdamW/SGD + OneCycle.

Replaces reference `group_decay`/`setup_optimizer`
(`alignn/utils.py:77-108`) and the OneCycleLR wiring
(`alignn/train.py:217-227`).

Scheduler parity note: the reference builds `OneCycleLR` over a horizon of
``epochs * steps_per_epoch`` (train.py:219-227) but calls
``scheduler.step()`` once per **epoch** (train.py:395), so a real reference
run only ever traverses the first ``1/steps_per_epoch`` of the cycle — in
practice a slow cosine LR ramp that never reaches ``max_lr`` unless
``pct_start * steps_per_epoch <= 1``.  ``scheduler="onecycle"`` reproduces
that behavior exactly (`epoch_lr(..., steps_per_epoch=N)`), pinned against
``torch.optim.lr_scheduler.OneCycleLR`` in
tests/test_train.py::test_onecycle_matches_torch_per_epoch_stepping.
``scheduler="onecycle_full"`` instead traverses the whole cycle over
``epochs`` — what the reference author plausibly intended — and is the
better default for from-scratch convergence runs.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
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
    """torch OneCycleLR (cos anneal, three_phase=False) as a fn of step.

    Mirrors torch's phase arithmetic bit-for-bit: the warm-up phase ends at
    the *float* ``pct_start * total_steps - 1`` (torch does not round), and
    each phase anneals with ``end + (start - end)/2 * (cos(pi*pct) + 1)``.
    """
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_end = max(float(pct_start * total_steps) - 1.0, 1e-12)
    down_end = float(total_steps) - 1.0
    down_span = max(down_end - up_end, 1e-12)

    def _cos(start, end, pct):
        return end + (start - end) / 2.0 * (math.cos(math.pi * pct) + 1.0)

    def schedule(step):
        # host-side (the trainer injects the LR value per epoch), so plain
        # float64 python math — bit-parity with torch needs the precision
        step = min(float(step), down_end)
        if step <= up_end:
            return _cos(initial_lr, max_lr,
                        min(max(step / up_end, 0.0), 1.0))
        return _cos(max_lr, min_lr,
                    min(max((step - up_end) / down_span, 0.0), 1.0))

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
             epoch: int, steps_per_epoch: int = 1) -> float:
    """Host-side LR for `epoch` under the reference's stepping convention.

    ``"onecycle"`` — parity with `alignn/train.py:219-227` + `:395`: the
    schedule horizon is ``epochs * steps_per_epoch`` but it is stepped once
    per epoch, so only the first ``1/steps_per_epoch`` of the cycle is ever
    traversed.  ``"onecycle_full"`` — traverse the complete cycle over
    ``epochs`` (round-1 behavior, kept as an explicit option).
    """
    if scheduler == "onecycle":
        horizon = max(epochs, 1) * max(steps_per_epoch, 1)
        return float(onecycle_lr(learning_rate, horizon)(epoch))
    if scheduler == "onecycle_full":
        return float(onecycle_lr(learning_rate, max(epochs, 1))(epoch))
    return float(learning_rate)
