"""Masked loss functions and the multi-head weighted training loss.

Replaces the criterion selection + 5-component loss assembly of the
reference training loop (`alignn/train.py:240-242,286-386`).  All means
are computed over *real* (mask=1) rows only, so the padded slots of the
static-shape batches never perturb gradients.

Parity quirks reproduced:
- the `alignn_atomwise` branch hard-codes L1 regardless of
  `config.criterion` (reference train.py:240);
- classification uses NLL over log-softmax outputs (train.py:242);
- stress / additional targets are per-graph (first node's row in the
  reference's node-data encoding, train.py:345-352 / :361-372).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def masked_mean(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of `err` rows where mask==1 (err may have trailing dims)."""
    while mask.ndim < err.ndim:
        mask = mask[..., None]
    num = jnp.sum(err * mask)
    # den counts masked *elements*: mask rows broadcast over trailing dims
    den = jnp.maximum(jnp.sum(jnp.broadcast_to(mask, err.shape)), 1.0)
    return num / den


def l1_loss(pred, target, mask):
    return masked_mean(jnp.abs(pred - target), mask)


def mse_loss(pred, target, mask):
    return masked_mean((pred - target) ** 2, mask)


def poisson_loss(pred, target, mask):
    """torch.nn.PoissonNLLLoss(log_input=True) parity: exp(pred)-target*pred."""
    return masked_mean(jnp.exp(pred) - target * pred, mask)


def zig_loss(pred, target, mask):
    """Zero-inflated loss for sparse targets — a stated EXTENSION.

    NOT a parity pin: the reference declares ``criterion: "zig"``
    (`alignn/config.py:180`) but never routes it — its only training
    loop is the ``"alignn_" in model.name`` branch, which hard-codes
    ``nn.L1Loss()`` / ``NLLLoss()`` (`alignn/train.py:238-242`), so
    "zig" (like "mse"/"poisson" there) is a vestigial config option
    with no reference semantics to reproduce.  We implement the
    standard zero-inflated decomposition — BCE on the zero indicator +
    L1 on the positive magnitudes — and document the deviation in
    docs/PARITY.md.
    """
    p_zero = jax.nn.sigmoid(pred)
    is_pos = (target > 0).astype(pred.dtype)
    bce = -(is_pos * jnp.log(p_zero + 1e-10)
            + (1 - is_pos) * jnp.log(1 - p_zero + 1e-10))
    mag = jnp.abs(pred - target) * is_pos
    return masked_mean(bce + mag, mask)


def nll_loss(log_probs, labels, mask):
    """NLLLoss over log-softmax rows; labels int [G]."""
    picked = jnp.take_along_axis(
        log_probs, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    return -masked_mean(picked, mask)


CRITERIA = {"l1": l1_loss, "mse": mse_loss, "poisson": poisson_loss,
            "zig": zig_loss}


def _sanitize(pred: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero padded rows BEFORE any nonlinearity.

    The batch's trash slot can carry large values (it pools every padded
    node); `exp`/`log` criteria would turn them into inf, and
    inf * mask(0) is NaN — masking must happen on the inputs.
    """
    m = mask
    while m.ndim < pred.ndim:
        m = m[..., None]
    return jnp.where(m > 0, pred, jnp.zeros_like(pred))


def property_loss(out: jnp.ndarray, batch, criterion: str,
                  classification: bool) -> jnp.ndarray:
    """Loss for the property model (reference train.py 'alignn' branch)."""
    if classification:
        labels = batch.target[:, 0]
        return nll_loss(out, labels, batch.graph_mask)
    fn = CRITERIA[criterion]
    tw = batch.target.shape[1]
    return fn(_sanitize(out[:, :tw], batch.graph_mask), batch.target,
              batch.graph_mask)


def atomwise_loss(result: Dict[str, jnp.ndarray], batch,
                  model_cfg: Any, classification: bool = False
                  ) -> Dict[str, jnp.ndarray]:
    """5-component weighted loss (reference train.py:286-386).

    Returns dict with total `loss` and components `loss1..loss5`.
    """
    crit = l1_loss  # hard-coded L1 parity (train.py:240)
    zero = jnp.zeros((), dtype=jnp.float32)
    loss1 = loss2 = loss3 = loss4 = loss5 = zero

    if model_cfg.output_features is not None and \
            model_cfg.graphwise_weight != 0:
        if classification:
            labels = batch.target[:, 0]
            # atomwise classification emits sigmoid probs [G, 1]
            p = result["out"][:, 0]
            bce = -(labels * jnp.log(p + 1e-10)
                    + (1 - labels) * jnp.log(1 - p + 1e-10))
            loss1 = model_cfg.graphwise_weight * masked_mean(
                bce, batch.graph_mask)
        else:
            tw = batch.target.shape[1]
            loss1 = model_cfg.graphwise_weight * crit(
                result["out"][:, :tw], batch.target, batch.graph_mask)
    if model_cfg.atomwise_output_features > 0 and \
            model_cfg.atomwise_weight != 0:
        aw = batch.atomwise_target.shape[1]
        loss2 = model_cfg.atomwise_weight * crit(
            result["atomwise_pred"][:, :aw], batch.atomwise_target,
            batch.node_mask)
    if model_cfg.calculate_gradient and model_cfg.gradwise_weight != 0:
        loss3 = model_cfg.gradwise_weight * crit(
            result["grad"], batch.forces, batch.node_mask)
    if model_cfg.stresswise_weight != 0:
        loss4 = model_cfg.stresswise_weight * crit(
            result["stresses"], batch.stress, batch.graph_mask)
    if getattr(model_cfg, "additional_output_weight", 0) != 0 and \
            getattr(model_cfg, "additional_output_features", 0) > 0:
        fw = batch.additional.shape[1]
        loss5 = model_cfg.additional_output_weight * crit(
            result["additional"][:, :fw], batch.additional,
            batch.graph_mask)
    total = loss1 + loss2 + loss3 + loss4 + loss5
    return {"loss": total, "loss1": loss1, "loss2": loss2, "loss3": loss3,
            "loss4": loss4, "loss5": loss5}
