"""Forward-over-reverse training step for the E/F/S loss (VERDICT r2 #2).

The standard train step differentiates the 5-part loss with reverse-mode
AD; since forces F = -dE/dr are *themselves* a gradient, the force/
stress terms cost reverse-over-reverse — measured 64% of the b64 step
(BENCH_NOTES "Step decomposition": 28.5 of 44.2 ms).

This module restructures that outer gradient using two exact identities:

1. **L1 curvature vanishes a.e.** For `l1` criteria the loss gradient
   through any head H is d(loss)/dθ = ⟨u_H, dH/dθ⟩ with
   u_H = w·sign(H - H*)·mask/den **piecewise-constant** in θ, so
   treating u_H as a constant of the first-order pass changes nothing
   (the same constants appear inside standard reverse-mode AD; sign'
   contributes only on a measure-zero set where JAX also returns 0).

2. **Force/stress heads are linear in the pair-force table.**
   F = A·pf (±segment sums) and S = C·(r ⊗ pf), so
   ⟨u_F, F⟩ + ⟨u_S, S⟩ = ⟨v, dE/dr⟩ for a cheap closed-form cotangent
   v [E, 3] — and ⟨v, dE/dr⟩ = d/ds E(r + s·v)|₀ is a **single
   forward-mode JVP** of the energy, no inner reverse pass at all.

The training gradient becomes

    grads = ∇_θ [ ⟨u_out, out(θ)⟩ + ⟨u_aw, aw(θ)⟩ + ⟨u_add, add(θ)⟩
                  + jvp_r(E(θ, ·); v) ]

i.e. ONE reverse sweep over (forward + tangent-forward) instead of a
reverse sweep over (forward + reverse).

**MEASURED RESULT: this LOSES — reverse-over-reverse is pass-optimal
for this loss.** Exact-parity validated (tests/test_fjvp.py), then
measured at 2+2/128 b32 (XLA path, compiled cost analysis, in units of
one energy forward = 5.04e9 flops):

    std  = fwd(1.00) + rev_r(1.11) + outer sweep(4.07)        = 6.18
    fjvp = fwd(1.00) + rev_r(1.11) + tangent(1.00) + sweep(4) = 7.36

The catch the VERDICT-r2 arithmetic missed: the loss needs F's *value*
(for u and the loss metrics), so the first-order reverse pass is
mandatory in BOTH variants — reverse-over-reverse *shares* it with the
derivative computation, while forward-over-reverse must pay it (stop-
gradiented, via linear_transpose of the linearized forward) *plus* a
separate tangent pass.  The outer sweeps cost the same (2x the swept
graph, Hessian symmetry): std sweeps fwd+rev_r (2x2.11=4.07), fjvp
sweeps fwd+tangent (2x2=4.0).  Net: fjvp = +19% flops, +25% HBM bytes,
+15% CPU wall — and the std sweep is already at the theoretical floor
(the mixed term ⟨u, ∂²E/∂θ∂r⟩ requires differentiating through a
rev_r-sized graph no matter the mode).  Full numbers in BENCH_NOTES.md
round 3.  Kept as an opt-in research artifact + the parity tests that
pin the exactness identity.

Scope: ALIGNNAtomWise, criterion="l1", calculate_gradient=True,
include_pos_deriv=False, no classification — exactly the ALIGNN-FF
training recipe (reference alignn_atomwise.py:529-539 double backward +
train.py:240 L1-forced criterion). Other configs use the standard step.

Requires jvp through the model, so it runs the XLA scatter path (the
Pallas kernels' custom_vjp blocks forward mode).  Opt-in surfaces:
`make_train_step_fjvp` (API, drop-in for make_train_step) and
`ALIGNN_TPU_BENCH_FJVP=1` (bench.py device A/B).  It is deliberately
NOT wired into the trainer: it measured slower (below).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from alignn_tpu.graph.batch import GraphBatch
from alignn_tpu.nn.models import ALIGNNAtomWise, EV_A3_TO_GPA
from alignn_tpu.train.losses import atomwise_loss
from alignn_tpu.train.state import TrainState


def _l1_cotangent(pred, target, mask, weight):
    """d(weight * masked_mean(|pred-target|)) / d(pred) — the exact
    constants reverse-mode AD uses (losses.masked_mean semantics)."""
    m = mask
    while m.ndim < pred.ndim:
        m = m[..., None]
    m = jnp.broadcast_to(m, pred.shape)
    den = jnp.maximum(jnp.sum(m), 1.0)
    return weight * jnp.sign(pred - target) * m / den


def pairforce_cotangent(res, batch: GraphBatch, cfg) -> jnp.ndarray:
    """v [E, 3] with ⟨v, dE/dr⟩ = ⟨u_F, F⟩ + ⟨u_S, S⟩.

    Transposes the (linear) force-assembly and virial maps of
    atomwise_forward onto the dE/dr table, folding grad_multiplier /
    force_mult_natoms / stress prefactors in.
    """
    u_f = _l1_cotangent(res["grad"], batch.forces,
                        batch.node_mask, cfg.gradwise_weight)

    num_nodes = batch.z.shape[0]
    if batch.dense_D:
        # dense layout: in-edges of node i are block i; out-edges are
        # rev of block i (see atomwise_forward dense branch)
        d = batch.dense_D
        v_pf = jnp.repeat(u_f, d, axis=0)
        if cfg.add_reverse_forces:
            v_pf = v_pf - jnp.repeat(u_f, d, axis=0)[batch.rev]
    else:
        v_pf = u_f[batch.dst]
        if cfg.add_reverse_forces:
            v_pf = v_pf - u_f[batch.src]

    if cfg.stresswise_weight != 0:
        u_s = _l1_cotangent(res["stresses"], batch.stress,
                            batch.graph_mask, cfg.stresswise_weight)
        div = 2.0 if not getattr(cfg, "batch_stress", True) else 1.0
        scale = (-cfg.stress_multiplier * EV_A3_TO_GPA
                 / (div * jnp.maximum(batch.volume, 1e-12)))
        # ⟨u_S, S⟩ = Σ_e pf_e · (scale_g(e) * r_eᵀ u_S[g(e)])
        u_s_e = (u_s * scale[:, None, None])[batch.edge_graph]
        v_pf = v_pf + jnp.einsum("ei,eij->ej", batch.r, u_s_e)

    # pf = grad_multiplier * dE/dr (* total nodes)
    v_gr = cfg.grad_multiplier * v_pf
    if cfg.force_mult_natoms:
        v_gr = v_gr * jnp.sum(batch.n_nodes)
    return v_gr


def make_train_step_fjvp(model, criterion: str = "l1",
                         classification: bool = False,
                         axis_name: Optional[str] = None,
                         donate: bool = True) -> Callable:
    """Jitted (state, batch) -> (state, metrics), forward-over-reverse.

    Drop-in for make_train_step on the ALIGNN-FF recipe; raises on
    configs outside the exactness conditions (non-L1 criterion, direct
    position derivative, classification)."""
    if not isinstance(model, ALIGNNAtomWise):
        raise ValueError("fjvp step supports ALIGNNAtomWise only")
    cfg = model.cfg
    if classification:
        raise ValueError("fjvp step is for regression (L1) training")
    if criterion != "l1":
        # parity quirk: the atomwise trainer hard-codes L1 anyway
        # (reference train.py:240); be explicit about the assumption
        raise ValueError("fjvp step requires the (L1) a.e.-linearity")
    if cfg.include_pos_deriv or not cfg.calculate_gradient:
        raise ValueError("fjvp step requires r-gradient forces")

    force_on = (cfg.gradwise_weight != 0 or cfg.stresswise_weight != 0)

    def _post_force(res, g_r, batch):
        """forces/stress from dE/dr — mirrors atomwise_forward exactly
        (kept in sync with nn/models.py:469-515)."""
        pair_forces = cfg.grad_multiplier * g_r
        if cfg.force_mult_natoms:
            pair_forces = pair_forces * jnp.sum(batch.n_nodes)
        num_nodes = batch.z.shape[0]
        if batch.dense_D:
            from alignn_tpu.ops.pallas_eggc import permute_rows

            d = batch.dense_D
            forces = pair_forces.reshape(num_nodes, d, 3).sum(axis=1)
            if cfg.add_reverse_forces:
                pf_rev = permute_rows(pair_forces, batch.rev, batch.rev)
                forces = forces - pf_rev.reshape(
                    num_nodes, d, 3).sum(axis=1)
        else:
            from alignn_tpu.ops.segment import segment_sum

            forces = segment_sum(pair_forces, batch.dst, num_nodes)
            if cfg.add_reverse_forces:
                forces = forces - segment_sum(pair_forces, batch.src,
                                              num_nodes)
        res = dict(res)
        res["grad"] = forces
        if cfg.stresswise_weight != 0:
            from alignn_tpu.ops.segment import segment_sum

            outer = jnp.einsum("ei,ej->eij", batch.r, pair_forces)
            per_graph = segment_sum(outer, batch.edge_graph,
                                    batch.graph_mask.shape[0])
            div = 2.0 if not getattr(cfg, "batch_stress", True) else 1.0
            res["stresses"] = (
                -cfg.stress_multiplier * EV_A3_TO_GPA * per_graph
                / (div * jnp.maximum(batch.volume,
                                     1e-12)[:, None, None]))
        else:
            res["stresses"] = jnp.zeros_like(batch.stress)
        return res

    def step(state: TrainState, batch: GraphBatch):
        new_stats = state.batch_stats
        if state.batch_stats:
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            _, updates = model.apply(variables, batch, batch.r,
                                     train=True,
                                     mutable=["batch_stats"])
            new_stats = updates["batch_stats"]

        def phi(params):
            vars2 = {"params": params}
            if state.batch_stats:
                # gradient pass sees the PRE-update stats, matching
                # _forward_and_loss (state.py:104-114); unreachable for
                # the LayerNorm-only ALIGNNAtomWise, kept consistent
                vars2["batch_stats"] = state.batch_stats

            def f(r):
                return model.apply(vars2, batch, r, train=True)

            # ONE primal forward; f_jvp reuses its residuals for the
            # tangent pass, and its linear_transpose IS the reverse
            # force pass — no second forward anywhere
            res2, f_jvp = jax.linearize(f, batch.r)

            sg = jax.lax.stop_gradient
            if force_on:
                # dE/dr under stop_gradient: the cotangent-constants
                # branch — the outer reverse sweep never enters it
                cot = {k: jnp.zeros_like(v) for k, v in res2.items()}
                cot["en_out"] = batch.graph_mask.astype(
                    res2["en_out"].dtype)
                vjp = jax.linear_transpose(f_jvp, batch.r)
                g_r = sg(vjp(cot)[0])
                res_sg = _post_force(sg(res2), g_r, batch)
            else:
                res_sg = dict(sg(res2))
                res_sg["grad"] = jnp.zeros_like(batch.forces)
                res_sg["stresses"] = jnp.zeros_like(batch.stress)
            losses = atomwise_loss(res_sg, batch, cfg,
                                   classification=classification)

            s = jnp.zeros((), jnp.float32)
            if force_on:
                v_gr = pairforce_cotangent(res_sg, batch, cfg)
                dres2 = f_jvp(v_gr)
                s = s + jnp.sum(dres2["en_out"] * batch.graph_mask)
            if cfg.output_features is not None and \
                    cfg.graphwise_weight != 0:
                tw = batch.target.shape[1]
                u = _l1_cotangent(sg(res2["out"][:, :tw]), batch.target,
                                  batch.graph_mask, cfg.graphwise_weight)
                s = s + jnp.sum(u * res2["out"][:, :tw])
            if cfg.atomwise_output_features > 0 and \
                    cfg.atomwise_weight != 0:
                aw = batch.atomwise_target.shape[1]
                u = _l1_cotangent(sg(res2["atomwise_pred"][:, :aw]),
                                  batch.atomwise_target,
                                  batch.node_mask, cfg.atomwise_weight)
                s = s + jnp.sum(u * res2["atomwise_pred"][:, :aw])
            if getattr(cfg, "additional_output_weight", 0) != 0 and \
                    getattr(cfg, "additional_output_features", 0) > 0:
                fw = batch.additional.shape[1]
                u = _l1_cotangent(sg(res2["additional"][:, :fw]),
                                  batch.additional, batch.graph_mask,
                                  cfg.additional_output_weight)
                s = s + jnp.sum(u * res2["additional"][:, :fw])
            # the stop-gradiented first-order results double as the
            # loss metrics (aux is not differentiated)
            return s, losses

        grads, losses = jax.grad(phi, has_aux=True)(state.params)
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
