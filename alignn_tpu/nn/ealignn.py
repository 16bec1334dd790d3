"""eALIGNN: the equivariant-ish atomwise variant.

TPU-native re-design of reference `alignn/models/ealignn_atomwise.py`:

- bond vectors are ALWAYS recomputed from fractional coords + lattice
  inside the forward (reference :306-312 `compute_cartesian_coordinates`),
  so the same graph indices serve perturbed geometries (MD-friendly);
- edges longer than `inner_cutoff` are pruned before the line-graph
  stage (reference `lightweight_line_graph`, models/utils.py:129-222).
  Static TPU shapes forbid dynamic edge removal, so pruning is a *mask*:
  pruned edges contribute zero gate weight to every aggregation on g,
  and L-edges touching a pruned edge are masked out of the L(g)
  aggregations — numerically identical to removing them;
- pair forces are multiplied by the batch-total node count
  (reference :394 `pair_forces *= g.num_nodes()`);
- optional net-torque removal (reference `remove_net_torque`,
  models/utils.py:319-398).  Deviation: the reference computes ONE
  center of mass / net torque over the whole batch (mixing graphs);
  here both are per-graph segment reductions, which is the physically
  intended behavior and identical for batch size 1 (the calculator path).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from alignn_tpu.graph.batch import GraphBatch
from alignn_tpu.nn.layers import ALIGNNConv, Dense, EdgeGatedGraphConv, \
    MLPLayer, RBFExpansion
from alignn_tpu.nn.models import (
    EV_A3_TO_GPA,
    _apply_link,
    _link_init_bias,
)
from alignn_tpu.ops.basis import bond_cosines
from alignn_tpu.ops.segment import graph_readout_mean, segment_sum


@dataclasses.dataclass(frozen=True)
class eALIGNNAtomWiseConfig:
    """Reference ealignn_atomwise.py:31-72 field parity."""

    name: str = "ealignn_atomwise"
    alignn_layers: int = 2
    gcn_layers: int = 2
    atom_input_features: int = 92
    edge_input_features: int = 80
    triplet_input_features: int = 40
    embedding_features: int = 64
    hidden_features: int = 64
    output_features: int = 1
    calculate_gradient: bool = True
    atomwise_output_features: int = 0
    graphwise_weight: float = 1.0
    gradwise_weight: float = 1.0
    stresswise_weight: float = 0.0
    atomwise_weight: float = 0.0
    classification: bool = False
    energy_mult_natoms: bool = True
    remove_torque: bool = True
    inner_cutoff: float = 4.0
    use_penalty: bool = True
    extra_features: int = 0
    penalty_factor: float = 0.1
    penalty_threshold: float = 1.0
    additional_output_features: int = 0
    additional_output_weight: float = 0.0
    stress_multiplier: float = 1.0
    grad_multiplier: float = -1.0
    link: str = "identity"
    zero_inflated: bool = False
    force_mult_natoms: bool = False
    include_pos_deriv: bool = False
    use_cutoff_function: bool = False
    add_reverse_forces: bool = True
    lg_on_fly: bool = True
    batch_stress: bool = True
    multiply_cutoff: bool = False
    exponent: int = 5

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "eALIGNNAtomWiseConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def remove_net_torque(cart: jnp.ndarray, forces: jnp.ndarray,
                      node_graph: jnp.ndarray, node_mask: jnp.ndarray,
                      n_nodes: jnp.ndarray) -> jnp.ndarray:
    """Per-graph least-norm correction zeroing the net torque.

    Solves (S - s I) mu = -tau per graph, correction = r x mu
    (reference models/utils.py:319-398, per-graph variant).
    """
    g = n_nodes.shape[0]
    w = node_mask[:, None]
    com = segment_sum(cart * w, node_graph, g) / \
        jnp.maximum(n_nodes, 1.0)[:, None]
    r = (cart - com[node_graph]) * w
    tau = segment_sum(jnp.cross(r, forces * w), node_graph, g)  # [G, 3]
    s = segment_sum(jnp.sum(r * r, axis=1, keepdims=True) * w,
                    node_graph, g)[:, 0]  # [G]
    outer = jnp.einsum("ni,nj->nij", r, r) * w[:, :, None]
    S = segment_sum(outer, node_graph, g)  # [G, 3, 3]
    M = S - s[:, None, None] * jnp.eye(3)
    # regularized solve (pinv fallback parity via ridge)
    M = M + 1e-8 * jnp.eye(3)
    mu = jnp.linalg.solve(M, -tau[..., None])[..., 0]  # [G, 3]
    delta = jnp.cross(r, mu[node_graph])
    return forces + delta * w


class eALIGNNAtomWise(nn.Module):
    """Equivariant-ish FF model (LayerNorm flavor)."""

    cfg: eALIGNNAtomWiseConfig
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, batch: GraphBatch, frac_coords, train: bool = True,
                 r_override=None):
        cfg = self.cfg
        kw = dict(norm="layernorm", axis_name=self.axis_name,
                  dtype=self.dtype)
        # recompute bond vectors from positions (reference :306-312)
        from alignn_tpu.nn.models import compute_cartesian_r

        if r_override is not None:
            r = r_override
        else:
            r = compute_cartesian_r(batch, frac_coords=frac_coords)
        bondlength = jnp.linalg.norm(r, axis=1)
        # inner-cutoff pruning as masks (lightweight_line_graph parity)
        keep = (bondlength <= cfg.inner_cutoff).astype(r.dtype) * \
            batch.edge_mask
        lg_keep = keep[batch.lg_src] * keep[batch.lg_dst] * batch.lg_mask

        # dense-neighborhood layout: node-local cosines, block-reduction
        # aggregations (the soft inner-cutoff weights ride the layers'
        # XLA weight branches — the Pallas/fused paths require binary
        # masks, which `keep` is not at the layer API level)
        from alignn_tpu.ops.basis import bond_cosines_dense

        cosines = bond_cosines_dense(r, batch.dense_D) \
            if batch.dense_D else \
            bond_cosines(r, batch.lg_src, batch.lg_dst)

        x = MLPLayer(cfg.hidden_features, name="atom_embedding", **kw)(
            batch.atom_features, mask=batch.node_mask, train=train)
        rb = RBFExpansion(vmin=0.0, vmax=8.0,
                          bins=cfg.edge_input_features,
                          name="edge_rbf")(bondlength)
        y = MLPLayer(cfg.embedding_features, name="edge_embedding_0", **kw)(
            rb, mask=keep, train=train)
        y = MLPLayer(cfg.hidden_features, name="edge_embedding_1", **kw)(
            y, mask=keep, train=train)
        ab = RBFExpansion(vmin=-1.0, vmax=1.0,
                          bins=cfg.triplet_input_features,
                          name="angle_rbf")(cosines)
        z = MLPLayer(cfg.embedding_features, name="angle_embedding_0",
                     **kw)(ab, mask=lg_keep, train=train)
        z = MLPLayer(cfg.hidden_features, name="angle_embedding_1", **kw)(
            z, mask=lg_keep, train=train)

        for i in range(cfg.alignn_layers):
            x, y, z = ALIGNNConv(cfg.hidden_features,
                                 dense_D=batch.dense_D,
                                 name=f"alignn_layers_{i}", **kw)(
                x, y, z, batch.src, batch.dst, batch.lg_src, batch.lg_dst,
                node_mask=batch.node_mask, edge_mask=keep,
                lg_mask=lg_keep, train=train, edge_weight=keep,
                lg_weight=lg_keep,
                src_perm=batch.src_perm, src_perm_inv=batch.src_perm_inv,
                lg_src_perm=batch.lg_src_perm,
                lg_src_perm_inv=batch.lg_src_perm_inv, rev=batch.rev)
        for i in range(cfg.gcn_layers):
            x, y = EdgeGatedGraphConv(cfg.hidden_features,
                                      dense_D=batch.dense_D,
                                      name=f"gcn_layers_{i}", **kw)(
                x, y, batch.src, batch.dst, node_mask=batch.node_mask,
                edge_mask=keep, train=train, edge_weight=keep,
                src_perm=batch.src_perm,
                src_perm_inv=batch.src_perm_inv)

        result: Dict[str, jnp.ndarray] = {}
        h = graph_readout_mean(x, batch.node_graph, batch.n_nodes)

        if cfg.extra_features != 0:
            from alignn_tpu.nn.models import extra_features_head

            out = extra_features_head(h, batch, cfg, kw, train)
        else:
            out = Dense(cfg.output_features, name="fc",
                        bias_init_value=_link_init_bias(cfg.link))(h)

        if cfg.additional_output_features > 0:
            result["additional"] = Dense(
                cfg.additional_output_features,
                name="fc_additional_output")(h)
        else:
            result["additional"] = jnp.zeros((h.shape[0], 1),
                                             dtype=out.dtype)
        if cfg.atomwise_output_features > 0:
            result["atomwise_pred"] = Dense(
                cfg.atomwise_output_features, name="fc_atomwise")(x)
        else:
            result["atomwise_pred"] = jnp.zeros((x.shape[0], 1),
                                                dtype=out.dtype)

        en_out = out[:, 0] if cfg.output_features == 1 else out.sum(axis=1)
        if cfg.energy_mult_natoms:
            en_out = en_out * batch.n_nodes
        if cfg.use_penalty:
            penalties = jnp.where(
                bondlength < cfg.penalty_threshold,
                cfg.penalty_factor * (cfg.penalty_threshold - bondlength),
                jnp.zeros_like(bondlength)) * batch.edge_mask
            en_out = en_out + jnp.sum(penalties)

        out = _apply_link(out, cfg.link)
        if cfg.classification:
            out = jax.nn.log_softmax(out, axis=1)
        result["out"] = out
        result["en_out"] = en_out
        result["bondlength"] = bondlength
        result["r"] = r
        result["keep"] = keep
        return result


def ealignn_forward(model: eALIGNNAtomWise, variables, batch: GraphBatch,
                    train: bool = True) -> Dict[str, jnp.ndarray]:
    """Energy + forces + stress with position-derivative autograd.

    Reference ealignn_atomwise.py:394-432: pair forces w.r.t. the
    recomputed bond vectors, x batch node count, scatter +/-, optional
    torque removal, per-graph virial stress.

    Differentiates w.r.t. fractional coordinates (the model recomputes r
    from them), then scatters dE/dr as in the reference.  For exact
    reference parity of the pair-force path, the energy is differentiated
    w.r.t. an explicit perturbation delta added to r.
    """
    cfg = model.cfg
    if not cfg.calculate_gradient:
        res = model.apply(variables, batch, batch.frac_coords, train=train)
        res["grad"] = jnp.zeros_like(batch.forces)
        res["stresses"] = jnp.zeros_like(batch.stress)
        return res

    # ONE joint backward pass for forces AND pair forces:
    # r_used = r(frac) + delta with delta == 0, so
    #   dE/dfrac  -> atomic forces (chain-ruled to cartesian)
    #   dE/ddelta -> dE/dr pair forces for the virial stress
    from alignn_tpu.nn.models import compute_cartesian_r

    def energy_fn(frac, delta):
        r = compute_cartesian_r(batch, frac_coords=frac) + delta
        res = model.apply(variables, batch, frac, train=train,
                          r_override=r)
        return jnp.sum(res["en_out"] * batch.graph_mask), res

    delta0 = jnp.zeros_like(batch.r)
    (_, res), (g_frac, g_delta) = jax.value_and_grad(
        energy_fn, argnums=(0, 1), has_aux=True)(
        batch.frac_coords, delta0)
    # chain rule: dE/dcart = dE/dfrac @ lat^{-T} per node
    inv_lat = jnp.linalg.inv(batch.lattice)[batch.node_graph]
    forces_cart = -jnp.einsum("ni,nji->nj", g_frac, inv_lat)
    total_nodes = jnp.sum(batch.n_nodes)
    forces = forces_cart * total_nodes * batch.node_mask[:, None]

    if cfg.remove_torque:
        lat_per_node = batch.lattice[batch.node_graph]
        cart = jnp.einsum("ni,nij->nj", batch.frac_coords, lat_per_node)
        forces = remove_net_torque(cart, forces, batch.node_graph,
                                   batch.node_mask, batch.n_nodes)
    res["grad"] = forces

    if cfg.stresswise_weight != 0:
        # virial: per-graph outer product of r and pair forces dE/dr
        pair = -g_delta * total_nodes
        outer = jnp.einsum("ei,ej->eij", res["r"], pair)
        per_graph = segment_sum(outer, batch.edge_graph,
                                batch.graph_mask.shape[0])
        stress = (-cfg.stress_multiplier * EV_A3_TO_GPA * per_graph
                  / jnp.maximum(batch.volume, 1e-12)[:, None, None])
        res["stresses"] = stress
    else:
        res["stresses"] = jnp.zeros_like(batch.stress)
    return res
