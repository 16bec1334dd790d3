"""Graph parallelism for the dense-neighborhood layout (GP-dense).

Closes the round-3 layout seam (VERDICT r3 #3): the ring pipeline of
:mod:`alignn_tpu.parallel.gp_model` shards the *sparse* layout while the
production single-chip layout is dense (graph/dense.py, +52% on device).
This module shards the dense layout itself.

Design — node-block sharding + compact halo exchange:

The dense layout is node-aligned by construction: node ``j`` owns edge
rows ``j*D..(j+1)*D`` and L-pair rows ``j*D^2..(j+1)*D^2``.  Sharding
nodes in contiguous blocks therefore shards EVERY edge/L-space tensor
contiguously — x, y, z, r, masks all live only on their owner chip
(per-chip residency O((N + N*D + N*D^2)/Dc), strictly better than the
sparse ring's replicated [N, F] node table).

Under that sharding the dense model has exactly TWO remote access
patterns (both "fetch rows owned by chip(src)"):

- the node-stage source gather ``cat[src]``
  (nn/layers._dense_gather_aggregate; reference SpMM sites
  alignn/models/alignn_atomwise.py:179-187), and
- the ``rev`` involution rides of the L-stage and force assembly
  (``dst_gate[rev]``, ``h_jt[rev]``, ``pair_forces[rev]``;
  nn/layers._dense_pair_lstage, nn/models.atomwise_forward).

Everything else — dst aggregations, L-pair algebra, angle cosines — is
node-block-local.  So instead of ringing full feature tables
(accumulate-and-forward, the sparse GP's pattern and its audited
scaling knee), each chip exchanges only the rows others actually
reference: a halo.  Host-side, consumer rows per remote shard are
deduplicated and ordered canonically; device-side the exchange is one
compact gather + ``lax.ppermute`` per populated ring distance, and every
consumer gather becomes a LOCAL gather into the concatenated
[local + halo] table.  For batches of small crystals and for large
cells with locality-preserving atom order, halo rows are a small
fraction of the table — wire bytes scale with the *boundary*, not the
volume (the graph analogue of halo exchange in domain decomposition).

Transposes: gather-into-halo transposes to a scatter-add over halo rows
and the reverse ppermute; hops are independent (no accumulate-and-
forward chain), so the reverse schedule is scatter-free ACROSS hops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from alignn_tpu.graph.batch import GraphBatch
from alignn_tpu.nn.layers import Dense, MaskedLayerNorm, pallas_default
from alignn_tpu.nn.models import (
    ALIGNNAtomWiseConfig,
    EV_A3_TO_GPA,
    _Embeddings,
    atomwise_heads,
)
from alignn_tpu.ops.basis import bond_cosines_dense, \
    cutoff_function_based_edges
from alignn_tpu.ops.segment import segment_sum

GRAPH_AXIS = "graph"


def _round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


@struct.dataclass
class HaloIndex:
    """One halo-exchange plan over a row space sharded in Dc blocks.

    ``send_idx[c]`` holds, grouped by ring distance k = 1..Dc-1 in
    columns ``[send_off[k-1], send_off[k])``, the LOCAL row ids chip c
    must send to chip (c - k) mod Dc — exactly the rows that chip
    requests, in sorted-unique order, so the receiver's remap indices
    (built host-side with the same ordering) line up without a second
    index exchange.  ``steps`` are the static per-distance widths
    (max over chips, quantum-padded; 0 = no traffic at that distance,
    the permute is skipped at trace time).
    """

    send_idx: np.ndarray   # [Dc, sum(steps)] int32 local row ids
    steps: tuple = struct.field(pytree_node=False, default=())

    @property
    def total(self) -> int:
        return int(sum(self.steps))


@struct.dataclass
class DenseGPIndex:
    """Halo plans + consumer remaps for a dense batch on Dc chips.

    ``src_halo[c]`` remaps each local edge row's source node into the
    [N_loc + node halo] table; ``rev_halo[c]`` remaps each local edge
    row's reverse edge into the [E_loc + edge halo] table.  Masked
    (trash) consumer rows remap to local row 0 — their values are
    discarded by the same masks that isolate them on a single chip.
    """

    node_halo: HaloIndex
    edge_halo: HaloIndex
    src_halo: np.ndarray   # [Dc, E_loc] int32
    rev_halo: np.ndarray   # [Dc, E_loc] int32
    n_shards: int = struct.field(pytree_node=False, default=1)


def _build_halo(targets: np.ndarray, consumer_mask: np.ndarray,
                rows_per_shard: int, n_shards: int,
                quantum: int) -> tuple:
    """(HaloIndex, remap[Dc, C_loc]) for one consumer->target pattern.

    ``targets``: global target row per consumer row (flat, all chips);
    consumers are sharded contiguously like everything else.
    """
    d, r = n_shards, rows_per_shard
    c_tot = targets.shape[0]
    c_loc = c_tot // d
    t = targets.astype(np.int64).reshape(d, c_loc)
    live = consumer_mask.reshape(d, c_loc) > 0.5
    owner = t // r
    chip = np.arange(d, dtype=np.int64)[:, None]
    dist = (owner - chip) % d

    # per (consumer chip, distance) sorted-unique request lists
    need = [[np.unique(t[c][(dist[c] == k) & live[c]])
             for k in range(d)] for c in range(d)]
    steps = []
    for k in range(1, d):
        m = max(len(need[c][k]) for c in range(d))
        steps.append(_round_up(m, quantum) if m else 0)
    steps = tuple(steps)

    send_idx = np.zeros((d, sum(steps)), dtype=np.int32)
    off = 0
    for k in range(1, d):
        if steps[k - 1] == 0:
            continue
        for o in range(d):
            req = need[(o - k) % d][k]
            send_idx[o, off:off + len(req)] = (req % r).astype(np.int32)
        off += steps[k - 1]

    remap = np.zeros((d, c_loc), dtype=np.int32)
    for c in range(d):
        rm = np.zeros(c_loc, dtype=np.int64)
        local = dist[c] == 0
        rm[local] = t[c][local] % r
        halo_off = r
        for k in range(1, d):
            if steps[k - 1] == 0:
                halo_off += 0
                continue
            sel = (dist[c] == k) & live[c]
            if sel.any():
                pos = np.searchsorted(need[c][k], t[c][sel])
                rm[sel] = halo_off + pos
            halo_off += steps[k - 1]
        rm[~live[c]] = 0
        remap[c] = rm.astype(np.int32)
    return HaloIndex(send_idx=send_idx, steps=steps), remap


def make_dense_gp_index(batch: GraphBatch, n_shards: int,
                        quantum: int = 8,
                        force_steps: tuple | None = None) -> DenseGPIndex:
    """Host-side halo plan for a dense GraphBatch on `n_shards` chips.

    `force_steps` = (node_steps, edge_steps) pins the static widths
    (monotone floors across batches keep the jit cache bounded, same
    discipline as gp_batch.make_stacked_ring).

    quantum=8 (the f32 sublane tile): halo payloads are [S, F] with F
    already lane-aligned, so rows only need sublane quantization — a
    128-row quantum measured 1.7-4x more wire bytes than needed on
    512/1728-atom supercells.  Topology-stable workloads (MD, single
    structures) see no extra jit churn; for shuffled-batch training
    rely on the monotone step floor.
    """
    if not batch.dense_D:
        raise ValueError("make_dense_gp_index requires a dense batch "
                         "(graph/dense.dense_batch_graphs)")
    n = int(np.asarray(batch.z).shape[0])
    e = int(np.asarray(batch.src).shape[0])
    if n % n_shards or e % n_shards:
        raise ValueError(f"node ({n}) / edge ({e}) pads must divide "
                         f"the mesh size {n_shards}")
    em = np.asarray(batch.edge_mask)
    node_halo, src_halo = _build_halo(
        np.asarray(batch.src), em, n // n_shards, n_shards, quantum)
    edge_halo, rev_halo = _build_halo(
        np.asarray(batch.rev), em, e // n_shards, n_shards, quantum)
    if force_steps is not None:
        node_halo, src_halo = _repack_forced(
            node_halo, src_halo, n // n_shards, force_steps[0])
        edge_halo, rev_halo = _repack_forced(
            edge_halo, rev_halo, e // n_shards, force_steps[1])
    return DenseGPIndex(node_halo=node_halo, edge_halo=edge_halo,
                        src_halo=src_halo, rev_halo=rev_halo,
                        n_shards=n_shards)


def _repack_forced(halo: HaloIndex, remap, rows, steps):
    """Re-pad an already-built halo plan into forced (>= required)
    static step widths — a cheap array shuffle, no _build_halo rerun
    (the planner runs on the per-step host hot path via
    make_stacked_dense_index)."""
    if any(a > b for a, b in zip(halo.steps, steps)):
        raise ValueError(f"forced halo steps {steps} < required "
                         f"{halo.steps}")
    d = halo.send_idx.shape[0]
    send = np.zeros((d, sum(steps)), dtype=np.int32)
    src_off = dst_off = 0
    for a, b in zip(halo.steps, steps):
        send[:, dst_off:dst_off + a] = halo.send_idx[:,
                                                     src_off:src_off + a]
        src_off += a
        dst_off += b
    # remap entries shift by the cumulative widening of the steps that
    # precede the halo segment they fall in (local rows shift by 0)
    bounds = rows + np.concatenate([[0], np.cumsum(halo.steps)])
    seg = np.searchsorted(bounds, remap, side="right") - 1
    seg = np.clip(seg, 0, len(steps))
    shift = np.concatenate([[0], np.cumsum(
        np.asarray(steps, dtype=np.int64)
        - np.asarray(halo.steps, dtype=np.int64))])
    new_remap = remap.astype(np.int64) + shift[seg]
    return HaloIndex(send_idx=send, steps=tuple(int(s) for s in steps)), \
        new_remap.astype(np.int32)


def halo_exchange(table, halo: HaloIndex, axis_name: str = GRAPH_AXIS):
    """[R_loc, F] local shard -> [R_loc + sum(steps), F] local+halo table.

    One compact gather + ppermute per populated distance; distances with
    steps == 0 vanish at trace time.  Hops are INDEPENDENT (each permutes
    rows of the original table), so neither direction builds an
    accumulate-and-forward chain.
    """
    d = len(halo.steps) + 1
    parts = [table]
    off = 0
    for k in range(1, d):
        s = halo.steps[k - 1]
        if s == 0:
            continue
        payload = table[halo.send_idx[off:off + s]]
        parts.append(jax.lax.ppermute(
            payload, axis_name, [(j, (j - k) % d) for j in range(d)]))
        off += s
    if len(parts) == 1:
        return table
    return jnp.concatenate(parts, axis=0)


class DenseGPNodeStage(nn.Module):
    """Dense node-stage EGGC with the src gather served from the halo.

    Same math + parameter names as EdgeGatedGraphConv's dense node stage
    (nn/layers._dense_gather_aggregate) — checkpoints transfer verbatim.
    """

    features: int
    dense_D: int
    axis_name: str = GRAPH_AXIS
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_loc, e_loc, idx: DenseGPIndex, edge_mask_loc,
                 train: bool = True):
        f, D = self.features, self.dense_D
        n_loc = x_loc.shape[0]
        src_gate = Dense(f, dtype=self.dtype, name="src_gate")(x_loc)
        dst_gate = Dense(f, dtype=self.dtype, name="dst_gate")(x_loc)
        bh = Dense(f, dtype=self.dtype, name="dst_update")(x_loc)

        cat = jnp.concatenate([src_gate, bh], axis=-1)
        cat_halo = halo_exchange(cat, idx.node_halo, self.axis_name)
        cat_e = cat_halo[idx.src_halo]
        sg_e, bh_e = cat_e[:, :f], cat_e[:, f:]
        dg_e = jnp.broadcast_to(
            dst_gate[:, None, :], (n_loc, D, f)).reshape(-1, f)
        m = sg_e + dg_e + Dense(f, dtype=self.dtype, name="edge_gate")(
            e_loc)

        from alignn_tpu.ops.pallas_dense import (
            dense_gated_aggregate,
            fold_mask,
        )

        h = dense_gated_aggregate(fold_mask(m, edge_mask_loc), bh_e, D,
                                  pallas_default())
        x_new = Dense(f, dtype=self.dtype, name="src_update")(x_loc) + h
        x_new = nn.silu(MaskedLayerNorm(name="norm_nodes")(x_new))
        e_new = nn.silu(MaskedLayerNorm(name="norm_edges")(m))
        return x_loc + x_new, e_loc + e_new


class DenseGPPairStage(nn.Module):
    """Dense local-pair L-stage with rev rides served from the halo.

    Mirrors nn/layers._dense_pair_lstage; ``permute_rows(·, rev)``
    becomes halo_exchange + local gather by ``rev_halo``.
    """

    features: int
    dense_D: int
    axis_name: str = GRAPH_AXIS
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, m_loc, z_loc, idx: DenseGPIndex, lg_mask_loc,
                 train: bool = True):
        f, D = self.features, self.dense_D
        n = m_loc.shape[0] // D
        src_gate = Dense(f, dtype=self.dtype, name="src_gate")(m_loc)
        dst_gate = Dense(f, dtype=self.dtype, name="dst_gate")(m_loc)
        bh = Dense(f, dtype=self.dtype, name="dst_update")(m_loc)

        from alignn_tpu.ops.pallas_dense import (
            dense_pair_aggregate,
            fold_mask,
        )

        dg_halo = halo_exchange(dst_gate, idx.edge_halo, self.axis_name)
        dg_r = dg_halo[idx.rev_halo]
        m2 = (src_gate.reshape(n, 1, D, f)
              + dg_r.reshape(n, D, 1, f)).reshape(-1, f) \
            + Dense(f, dtype=self.dtype, name="edge_gate")(z_loc)
        m2 = fold_mask(m2, lg_mask_loc)
        h_jt = dense_pair_aggregate(m2, bh, D, pallas_default())
        h_halo = halo_exchange(h_jt, idx.edge_halo, self.axis_name)
        h = h_halo[idx.rev_halo]

        y_new = Dense(f, dtype=self.dtype, name="src_update")(m_loc) + h
        y_new = nn.silu(MaskedLayerNorm(name="norm_nodes")(y_new))
        z_new = nn.silu(MaskedLayerNorm(name="norm_edges")(m2))
        z_out = z_loc + z_new
        from alignn_tpu.ops.fp8 import fp8_ltables_enabled, \
            fp8_round_trip

        if fp8_ltables_enabled():
            # keep the GP path numerically identical to the single-chip
            # dense/sparse layer-boundary z-stream storage (ADVICE r4
            # #3): the [L_loc, F] residual crossing the layer boundary
            # lives in e4m3 under ALIGNN_TPU_FP8_LTABLES=1
            z_out = fp8_round_trip(z_out)
        return m_loc + y_new, z_out


class _DenseGPALIGNNConv(nn.Module):
    features: int
    dense_D: int
    axis_name: str = GRAPH_AXIS
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, y, z, idx, edge_mask_loc, lg_mask_loc,
                 train: bool = True):
        x, m = DenseGPNodeStage(
            self.features, self.dense_D, self.axis_name, self.dtype,
            name="node_update")(x, y, idx, edge_mask_loc, train=train)
        y, z = DenseGPPairStage(
            self.features, self.dense_D, self.axis_name, self.dtype,
            name="edge_update")(m, z, idx, lg_mask_loc, train=train)
        return x, y, z


class _DenseGPTrunk(nn.Module):
    cfg: ALIGNNAtomWiseConfig
    dense_D: int
    axis_name: str = GRAPH_AXIS
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, y, z, idx, edge_mask_loc, lg_mask_loc,
                 train: bool = True):
        cfg = self.cfg
        for i in range(cfg.alignn_layers):
            x, y, z = _DenseGPALIGNNConv(
                cfg.hidden_features, self.dense_D, self.axis_name,
                self.dtype, name=f"alignn_layers_{i}")(
                x, y, z, idx, edge_mask_loc, lg_mask_loc, train=train)
        for i in range(cfg.gcn_layers):
            x, y = DenseGPNodeStage(
                cfg.hidden_features, self.dense_D, self.axis_name,
                self.dtype, name=f"gcn_layers_{i}")(
                x, y, idx, edge_mask_loc, train=train)
        return x, y


class DenseGPALIGNNAtomWise(nn.Module):
    """Node-block-sharded dense ALIGNN-FF core; apply inside shard_map.

    Parameter tree identical to :class:`alignn_tpu.nn.models.
    ALIGNNAtomWise` with dense layout — single-chip checkpoints drop in
    unchanged (pinned by tests/test_dense_gp.py).
    """

    cfg: ALIGNNAtomWiseConfig
    axis_name: str = GRAPH_AXIS
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, batch: GraphBatch, r_loc, idx: DenseGPIndex,
                 train: bool = True):
        cfg = self.cfg
        D = batch.dense_D
        kw = dict(norm="layernorm", axis_name=None, dtype=self.dtype)
        bondlength = jnp.linalg.norm(r_loc, axis=1)
        cosines = bond_cosines_dense(r_loc, D)  # node-block local

        edge_scale = None
        rbf_input = bondlength
        if cfg.use_cutoff_function:
            if cfg.multiply_cutoff:
                edge_scale = cutoff_function_based_edges(
                    bondlength, inner_cutoff=cfg.inner_cutoff,
                    exponent=cfg.exponent)
            else:
                rbf_input = cutoff_function_based_edges(
                    bondlength, inner_cutoff=cfg.inner_cutoff,
                    exponent=cfg.exponent)

        x, y, z = _Embeddings(cfg, norm="layernorm", dtype=self.dtype,
                              name="embeddings")(
            batch, rbf_input, cosines, train=train,
            edge_scale=edge_scale)
        x, y = _DenseGPTrunk(cfg, D, self.axis_name, self.dtype,
                             name="trunk")(
            x, y, z, idx, batch.edge_mask, batch.lg_mask, train=train)
        return atomwise_heads(cfg, kw, batch, x, bondlength,
                              batch.edge_mask, self.axis_name, train,
                              node_axis=self.axis_name)


# ---------------------------------------------------------------------
# shard_map wiring

_NODE_FIELDS = {"z", "atom_features", "frac_coords", "node_graph",
                "node_mask", "forces", "atomwise_target"}
_EDGE_FIELDS = {"src", "dst", "r", "images", "edge_graph", "edge_mask",
                "rev", "src_perm", "src_perm_inv"}
_LG_FIELDS = {"lg_src", "lg_dst", "lg_mask", "lg_src_perm",
              "lg_src_perm_inv"}


def dense_batch_specs(batch: GraphBatch) -> GraphBatch:
    """PartitionSpecs: node-aligned contiguous shard of EVERY row space
    (nodes, edges, L-pairs); graph-level fields replicate."""
    from alignn_tpu.parallel.graph_parallel import _pytree_field_names

    fields = {}
    for name in _pytree_field_names():
        if name in _NODE_FIELDS or name in _EDGE_FIELDS \
                or name in _LG_FIELDS:
            fields[name] = P(GRAPH_AXIS)
        else:
            fields[name] = P()
    return batch.replace(**fields)


def index_specs(idx: DenseGPIndex) -> DenseGPIndex:
    return DenseGPIndex(
        node_halo=HaloIndex(send_idx=P(GRAPH_AXIS),
                            steps=idx.node_halo.steps),
        edge_halo=HaloIndex(send_idx=P(GRAPH_AXIS),
                            steps=idx.edge_halo.steps),
        src_halo=P(GRAPH_AXIS), rev_halo=P(GRAPH_AXIS),
        n_shards=idx.n_shards)


def _squeeze_index(idx: DenseGPIndex) -> DenseGPIndex:
    """Drop the leading device axis shard_map leaves on the arrays."""
    return DenseGPIndex(
        node_halo=HaloIndex(send_idx=idx.node_halo.send_idx[0],
                            steps=idx.node_halo.steps),
        edge_halo=HaloIndex(send_idx=idx.edge_halo.send_idx[0],
                            steps=idx.edge_halo.steps),
        src_halo=idx.src_halo[0], rev_halo=idx.rev_halo[0],
        n_shards=idx.n_shards)


def _device_energy_forces_stress(model, model_cfg, variables,
                                 batch: GraphBatch, idx: DenseGPIndex,
                                 gp_size: int, train: bool):
    """Shared per-device E/F/S assembly: (res, forces_loc, stress).

    One copy of the grad correction + force halo + virial (previously
    triplicated across the forward and both train steps — they had
    already drifted on cfg.batch_stress).  Same psum-transpose
    correction as the sparse GP (graph_parallel.gp_device_outputs):
    grads of psum-containing forwards are Dc x the local share.
    """
    r_loc = batch.r
    D = batch.dense_D

    def energy_fn(r):
        res = model.apply(variables, batch, r, idx, train=train)
        return jnp.sum(res["en_out"] * batch.graph_mask), res

    (_, res), g_r = jax.value_and_grad(energy_fn, has_aux=True)(r_loc)
    g_r = g_r / gp_size
    pair_forces = model_cfg.grad_multiplier * g_r
    if model_cfg.force_mult_natoms:
        pair_forces = pair_forces * jnp.sum(batch.n_nodes)

    n_loc = batch.z.shape[0]
    forces_ji = pair_forces.reshape(n_loc, D, 3).sum(axis=1)
    if model_cfg.add_reverse_forces:
        pf_halo = halo_exchange(pair_forces, idx.edge_halo, GRAPH_AXIS)
        # masked consumer rows remap to local row 0 (a REAL row): mask
        # the ride — single-chip trash rows self-map to zero instead
        pf_rev = pf_halo[idx.rev_halo] * batch.edge_mask[:, None]
        forces_loc = forces_ji - pf_rev.reshape(n_loc, D, 3).sum(axis=1)
    else:
        forces_loc = forces_ji

    if model_cfg.stresswise_weight != 0:
        outer = jnp.einsum("ei,ej->eij", r_loc, pair_forces)
        per_graph = segment_sum(outer, batch.edge_graph,
                                batch.graph_mask.shape[0])
        per_graph = jax.lax.psum(per_graph, GRAPH_AXIS)
        # batch_stress=False: the reference's /(2V) convention
        # (nn/models.atomwise_forward mirrors this)
        div = 2.0 if not getattr(model_cfg, "batch_stress", True) else 1.0
        stress = (-model_cfg.stress_multiplier * EV_A3_TO_GPA
                  * per_graph
                  / (div * jnp.maximum(batch.volume,
                                       1e-12)[:, None, None]))
    else:
        stress = jnp.zeros_like(batch.stress)
    return res, forces_loc, stress


def dense_gp_device_outputs(model, model_cfg, variables,
                            batch: GraphBatch, idx: DenseGPIndex,
                            n_devices: int, train: bool = False):
    """Per-device GP-dense forward body: (out, forces, stress, res)."""
    res, forces_loc, stress = _device_energy_forces_stress(
        model, model_cfg, variables, batch, idx, n_devices, train)
    forces = jax.lax.all_gather(forces_loc, GRAPH_AXIS).reshape(-1, 3)
    return res["out"], forces, stress, res


def make_dense_gp_forward(model_cfg: ALIGNNAtomWiseConfig, mesh: Mesh,
                          variables):
    """Jitted halo-exchange dense-GP FF forward:
    batch -> (out, forces, stress)."""
    n_devices = int(np.prod(mesh.devices.shape))
    model = DenseGPALIGNNAtomWise(cfg=model_cfg, axis_name=GRAPH_AXIS)

    def per_device(batch: GraphBatch, idx: DenseGPIndex):
        idx = _squeeze_index(idx)
        out, forces, stress, _ = dense_gp_device_outputs(
            model, model_cfg, variables, batch, idx, n_devices)
        return out, forces, stress

    compiled = {}
    steps_floor = [None]

    def fwd(batch: GraphBatch, idx: DenseGPIndex | None = None):
        if idx is None:
            idx = make_dense_gp_index(batch, n_devices)
            if steps_floor[0] is not None:
                floored = (
                    tuple(max(a, b) for a, b in zip(
                        idx.node_halo.steps, steps_floor[0][0])),
                    tuple(max(a, b) for a, b in zip(
                        idx.edge_halo.steps, steps_floor[0][1])))
                if floored != (idx.node_halo.steps, idx.edge_halo.steps):
                    idx = make_dense_gp_index(batch, n_devices,
                                              force_steps=floored)
            steps_floor[0] = (idx.node_halo.steps, idx.edge_halo.steps)
        key = (idx.node_halo.steps, idx.edge_halo.steps, batch.dense_D)
        if key not in compiled:
            compiled[key] = jax.jit(shard_map(
                per_device, mesh=mesh,
                in_specs=(dense_batch_specs(batch), index_specs(idx)),
                out_specs=(P(), P(), P()), check_rep=False))
        return compiled[key](batch, idx)

    return fwd


def _masked_mean_psum(err, mask, axis_name):
    """Global masked mean over a node/edge-sharded term: local masked
    sums psum'd, so the result equals losses.masked_mean on the
    unsharded arrays exactly (sums decompose over shards)."""
    m = mask
    while m.ndim < err.ndim:
        m = m[..., None]
    num = jax.lax.psum(jnp.sum(err * m), axis_name)
    den = jax.lax.psum(jnp.sum(jnp.broadcast_to(m, err.shape)),
                       axis_name)
    return num / jnp.maximum(den, 1.0)


def dense_gp_loss(res, forces_loc, stress, batch: GraphBatch, model_cfg,
                  classification: bool = False):
    """The 5-part atomwise loss over node-block shards.

    Graph-space terms (out/stress/additional) are replicated after the
    readout psum and use train.losses semantics verbatim; node-space
    terms (forces, atomwise) reduce with _masked_mean_psum so the total
    equals losses.atomwise_loss on the unsharded batch exactly.
    """
    from alignn_tpu.train.losses import l1_loss, masked_mean

    zero = jnp.zeros((), dtype=jnp.float32)
    loss1 = loss2 = loss3 = loss4 = loss5 = zero
    if model_cfg.output_features is not None and \
            model_cfg.graphwise_weight != 0:
        if classification:
            labels = batch.target[:, 0]
            p = res["out"][:, 0]
            bce = -(labels * jnp.log(p + 1e-10)
                    + (1 - labels) * jnp.log(1 - p + 1e-10))
            loss1 = model_cfg.graphwise_weight * masked_mean(
                bce, batch.graph_mask)
        else:
            tw = batch.target.shape[1]
            loss1 = model_cfg.graphwise_weight * l1_loss(
                res["out"][:, :tw], batch.target, batch.graph_mask)
    if model_cfg.atomwise_output_features > 0 and \
            model_cfg.atomwise_weight != 0:
        aw = batch.atomwise_target.shape[1]
        loss2 = model_cfg.atomwise_weight * _masked_mean_psum(
            jnp.abs(res["atomwise_pred"][:, :aw]
                    - batch.atomwise_target),
            batch.node_mask, GRAPH_AXIS)
    if model_cfg.calculate_gradient and model_cfg.gradwise_weight != 0:
        loss3 = model_cfg.gradwise_weight * _masked_mean_psum(
            jnp.abs(forces_loc - batch.forces), batch.node_mask,
            GRAPH_AXIS)
    if model_cfg.stresswise_weight != 0:
        loss4 = model_cfg.stresswise_weight * l1_loss(
            stress, batch.stress, batch.graph_mask)
    if getattr(model_cfg, "additional_output_weight", 0) != 0 and \
            getattr(model_cfg, "additional_output_features", 0) > 0:
        fw = batch.additional.shape[1]
        loss5 = model_cfg.additional_output_weight * l1_loss(
            res["additional"][:, :fw], batch.additional,
            batch.graph_mask)
    total = loss1 + loss2 + loss3 + loss4 + loss5
    return {"loss": total, "loss1": loss1, "loss2": loss2,
            "loss3": loss3, "loss4": loss4, "loss5": loss5}


def make_dense_gp_train_step(model_cfg, mesh: Mesh,
                             classification: bool = False,
                             donate: bool = True):
    """Jitted (state, dense_batch[, idx]) -> (state, losses) on a 1-D
    graph mesh: the full E/F/S objective (incl. the force grad-of-grad)
    with the dense layout node-block-sharded and halo-exchanged.

    Numerically equal to the single-device dense train step (pinned in
    tests/test_dense_gp.py) — single-chip checkpoints and recipes carry
    over unchanged.
    """
    import optax

    from alignn_tpu.train.state import TrainState

    n_devices = int(np.prod(mesh.devices.shape))
    model = DenseGPALIGNNAtomWise(cfg=model_cfg, axis_name=GRAPH_AXIS)

    def per_device_step(state: TrainState, batch: GraphBatch,
                        idx: DenseGPIndex):
        idx_loc = _squeeze_index(idx)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            res, forces_loc, stress = _device_energy_forces_stress(
                model, model_cfg, variables, batch, idx_loc, n_devices,
                train=True)
            losses = dense_gp_loss(res, forces_loc, stress, batch,
                                   model_cfg,
                                   classification=classification)
            return losses["loss"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
        # psum-transpose: per-chip grads are D x the local share
        grads = jax.lax.pmean(grads, GRAPH_AXIS)
        losses = jax.lax.pmean(losses, GRAPH_AXIS)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), losses

    compiled = {}
    steps_floor = [None]

    def step(state, batch: GraphBatch, idx: DenseGPIndex | None = None):
        if idx is None:
            idx = make_dense_gp_index(batch, n_devices)
            if steps_floor[0] is not None:
                floored = (
                    tuple(max(a, b) for a, b in zip(
                        idx.node_halo.steps, steps_floor[0][0])),
                    tuple(max(a, b) for a, b in zip(
                        idx.edge_halo.steps, steps_floor[0][1])))
                if floored != (idx.node_halo.steps,
                               idx.edge_halo.steps):
                    idx = make_dense_gp_index(batch, n_devices,
                                              force_steps=floored)
            steps_floor[0] = (idx.node_halo.steps, idx.edge_halo.steps)
        key = (idx.node_halo.steps, idx.edge_halo.steps, batch.dense_D)
        if key not in compiled:
            compiled[key] = jax.jit(shard_map(
                per_device_step, mesh=mesh,
                in_specs=(P(), dense_batch_specs(batch),
                          index_specs(idx)),
                out_specs=(P(), P()), check_rep=False,
            ), donate_argnums=(0,) if donate else ())
        return compiled[key](state, batch, idx)

    return step


def make_stacked_dense_index(stacked: GraphBatch, gp_size: int,
                             quantum: int = 8,
                             min_steps: tuple | None = None
                             ) -> DenseGPIndex:
    """Halo plans for a [D_data, ...]-stacked dense batch (dp x gp).

    All data rows share one static (node_steps, edge_steps) pair
    (elementwise max over rows, floored by `min_steps`) so the jit
    cache stays bounded — same discipline as gp_batch.make_stacked_ring.
    Returns arrays stacked [D_data, Dc, ...].
    """
    n_rows = int(np.asarray(stacked.src).shape[0])
    rows = [jax.tree_util.tree_map(lambda x, i=i: np.asarray(x)[i],
                                   stacked) for i in range(n_rows)]
    # plan each row ONCE; the forced widths are a cheap repack (this
    # runs on the per-step host hot path when callers pass idx=None)
    first = [make_dense_gp_index(r, gp_size, quantum) for r in rows]
    node_steps = tuple(max(ix.node_halo.steps[k] for ix in first)
                       for k in range(gp_size - 1))
    edge_steps = tuple(max(ix.edge_halo.steps[k] for ix in first)
                       for k in range(gp_size - 1))
    if min_steps is not None:
        node_steps = tuple(max(a, b) for a, b in
                           zip(node_steps, min_steps[0]))
        edge_steps = tuple(max(a, b) for a, b in
                           zip(edge_steps, min_steps[1]))
    n_loc = int(np.asarray(stacked.z).shape[1]) // gp_size
    e_loc = int(np.asarray(stacked.src).shape[1]) // gp_size
    idxs = []
    for ix in first:
        nh, sh = _repack_forced(ix.node_halo, ix.src_halo, n_loc,
                                node_steps)
        eh, rh = _repack_forced(ix.edge_halo, ix.rev_halo, e_loc,
                                edge_steps)
        idxs.append(DenseGPIndex(node_halo=nh, edge_halo=eh,
                                 src_halo=sh, rev_halo=rh,
                                 n_shards=gp_size))
    return DenseGPIndex(
        node_halo=HaloIndex(
            send_idx=np.stack([ix.node_halo.send_idx for ix in idxs]),
            steps=node_steps),
        edge_halo=HaloIndex(
            send_idx=np.stack([ix.edge_halo.send_idx for ix in idxs]),
            steps=edge_steps),
        src_halo=np.stack([ix.src_halo for ix in idxs]),
        rev_halo=np.stack([ix.rev_halo for ix in idxs]),
        n_shards=gp_size)


def make_dp_dense_gp_train_step(model_cfg, mesh: Mesh,
                                classification: bool = False,
                                donate: bool = True):
    """2-D ("data", "graph") mesh train step for the DENSE layout.

    Each data row holds a different dense micro-batch; within a row the
    node/edge/L-pair spaces shard over the graph axis with halo
    exchange.  Gradients pmean over both axes — the dense counterpart
    of :func:`alignn_tpu.parallel.dp_gp.make_dp_gp_train_step`.
    """
    import optax

    from alignn_tpu.train.state import TrainState

    data_axis = "data"
    gp_size = mesh.devices.shape[mesh.axis_names.index(GRAPH_AXIS)]
    model = DenseGPALIGNNAtomWise(cfg=model_cfg, axis_name=GRAPH_AXIS)

    def per_device_step(state: TrainState, batch: GraphBatch,
                        idx: DenseGPIndex):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        idx_loc = DenseGPIndex(
            node_halo=HaloIndex(send_idx=idx.node_halo.send_idx[0, 0],
                                steps=idx.node_halo.steps),
            edge_halo=HaloIndex(send_idx=idx.edge_halo.send_idx[0, 0],
                                steps=idx.edge_halo.steps),
            src_halo=idx.src_halo[0, 0], rev_halo=idx.rev_halo[0, 0],
            n_shards=idx.n_shards)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            res, forces_loc, stress = _device_energy_forces_stress(
                model, model_cfg, variables, batch, idx_loc, gp_size,
                train=True)
            losses = dense_gp_loss(res, forces_loc, stress, batch,
                                   model_cfg,
                                   classification=classification)
            return losses["loss"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(jax.lax.pmean(grads, GRAPH_AXIS),
                              data_axis)
        losses = jax.lax.pmean(jax.lax.pmean(losses, GRAPH_AXIS),
                               data_axis)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), losses

    def stacked_specs(batch):
        from alignn_tpu.parallel.graph_parallel import \
            _pytree_field_names

        fields = {}
        for name in _pytree_field_names():
            if name in _NODE_FIELDS or name in _EDGE_FIELDS \
                    or name in _LG_FIELDS:
                fields[name] = P(data_axis, GRAPH_AXIS)
            else:
                fields[name] = P(data_axis)
        return batch.replace(**fields)

    def stacked_index_specs(idx):
        return DenseGPIndex(
            node_halo=HaloIndex(send_idx=P(data_axis, GRAPH_AXIS),
                                steps=idx.node_halo.steps),
            edge_halo=HaloIndex(send_idx=P(data_axis, GRAPH_AXIS),
                                steps=idx.edge_halo.steps),
            src_halo=P(data_axis, GRAPH_AXIS),
            rev_halo=P(data_axis, GRAPH_AXIS),
            n_shards=idx.n_shards)

    compiled = {}
    steps_floor = [None]

    def step(state, batch: GraphBatch, idx: DenseGPIndex | None = None):
        if idx is None:
            idx = make_stacked_dense_index(batch, gp_size,
                                           min_steps=steps_floor[0])
            steps_floor[0] = (idx.node_halo.steps, idx.edge_halo.steps)
        key = (idx.node_halo.steps, idx.edge_halo.steps, batch.dense_D)
        if key not in compiled:
            compiled[key] = jax.jit(shard_map(
                per_device_step, mesh=mesh,
                in_specs=(P(), stacked_specs(batch),
                          stacked_index_specs(idx)),
                out_specs=(P(), P()), check_rep=False,
            ), donate_argnums=(0,) if donate else ())
        return compiled[key](state, batch, idx)

    return step
