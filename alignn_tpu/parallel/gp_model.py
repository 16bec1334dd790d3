"""Ring-pipelined graph-parallel ALIGNN-FF model (GP v2).

Flax model that runs inside `shard_map` over a "graph" mesh axis with the
edge space ACTUALLY sharded (see :mod:`alignn_tpu.parallel.gp_batch` for
the layout and the round-1 -> round-2 rationale).  The parameter tree is
IDENTICAL to :class:`alignn_tpu.nn.models.ALIGNNAtomWise` — the g-stage
reuses `EdgeGatedGraphConv`, the heads reuse `atomwise_heads`, and module
names mirror the dense model — so a single-device checkpoint drops in
unchanged.  Only the L(g) stage is new
(:class:`RingEdgeGatedGraphConv`): it exchanges the [E/D, 2F]
gate/update buffer around the ring with `lax.ppermute` while each step's
local L-edge group aggregates; buffers never exceed one shard.

Collective cost per ALIGNN layer: (D-1) ppermutes of [E/D, 2F] plus the
node psum — replacing round 1's blocking all_gather([E, F]) + psum.
Per-chip residency: O(E/D + L/D) for every edge-space tensor (round 1
held the full [E, F] m-table and a replicated [E, 3] r on every chip).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from alignn_tpu.graph.batch import GraphBatch
from alignn_tpu.nn.layers import (
    Dense,
    EdgeGatedGraphConv,
    MaskedLayerNorm,
)
from alignn_tpu.nn.models import ALIGNNAtomWiseConfig, atomwise_heads
from alignn_tpu.ops.basis import cutoff_function_based_edges
from alignn_tpu.ops.segment import segment_sum
from alignn_tpu.parallel.gp_batch import RingIndex


def _ring_perm(d: int):
    return [(j, (j + 1) % d) for j in range(d)]


def ring_mode() -> str:
    """Reverse-ring structure for the L-stage halo (VERDICT r3 #4).

    "chain" (default): the ring buffer threads ppermutes incrementally;
    autodiff transposes it to an accumulate-and-forward reverse ring —
    each reverse hop's payload contains the local VJP scatter-add, so
    hops serialize with compute (the audited scaling knee,
    BENCH_NOTES "Ring overlap audit").

    "gather": :func:`ring_broadcast` materializes all D-1 arrived
    buffers in the forward (same chain, same forward wire bytes) and
    its custom VJP returns each step's cotangent with ONE independent
    shift-k permute — reverse hops are chain-free and individually
    overlappable, at the cost of ~2x reverse link-bytes (shift-k rides
    min(k, D-k) physical links on a bidirectional torus axis vs 1 for
    a chain hop) and O(E) residual memory for the stacked buffers.
    """
    import os

    return os.environ.get("ALIGNN_TPU_GP_RING", "chain")


from functools import partial  # noqa: E402


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def ring_broadcast(buf, d: int, axis_name: str):
    """[S, W] local shard -> [D, S, W] stack of every chip's shard.

    Row k on chip c is shard (c - k) mod D — exactly what arrives at
    ring step k of the chain.  Forward = the chain (D-1 neighbor
    permutes); reverse = gather-then-reduce (see :func:`ring_mode`).
    """
    return jnp.stack(_ring_chain(buf, d, axis_name))


def _ring_chain(buf, d, axis_name):
    bufs = [buf]
    for _ in range(1, d):
        bufs.append(jax.lax.ppermute(bufs[-1], axis_name, _ring_perm(d)))
    return bufs


def _rb_fwd(buf, d, axis_name):
    return ring_broadcast(buf, d, axis_name), None


def _rb_bwd(d, axis_name, _res, g):
    # g[k] on chip c is the cotangent of shard (c - k): return each to
    # its producer with an INDEPENDENT shift permute (j -> j - k), then
    # reduce locally.  No hop's payload depends on another hop.
    out = g[0]
    for k in range(1, d):
        out = out + jax.lax.ppermute(
            g[k], axis_name, [(j, (j - k) % d) for j in range(d)])
    return (out,)


ring_broadcast.defvjp(_rb_fwd, _rb_bwd)


def ring_cosines(r_loc, ring: RingIndex, axis_name: str):
    """Bond-angle cosines for ring-ordered L-edges from sharded r.

    Step k reads the [E/D, 3] bond-vector shard that has just arrived
    over the ring (shard (d-k) mod D) — r is never replicated.  Matches
    ops.build.bond_cosines / reference graphs.py:847-864 on real rows.
    """
    d, off = ring.n_shards, ring.offsets
    parts = []
    gather = ring_mode() == "gather"
    bufs = ring_broadcast(r_loc, d, axis_name) if gather else None
    buf = r_loc
    for k in range(d):
        cols = slice(off[k], off[k + 1])
        r1 = -(bufs[k] if gather else buf)[ring.lg_src[0, cols]]
        r2 = r_loc[ring.lg_dst[0, cols]]
        num = jnp.sum(r1 * r2, axis=1)
        den = jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r2, axis=1)
        parts.append(jnp.clip(num / jnp.maximum(den, 1e-12), -1.0, 1.0))
        if not gather and k + 1 < d:
            buf = jax.lax.ppermute(buf, axis_name, _ring_perm(d))
    return jnp.concatenate(parts)


class RingEdgeGatedGraphConv(nn.Module):
    """EGGC on L(g) with ring-pipelined source-side halo exchange.

    Same math and parameter names as EdgeGatedGraphConv (so checkpoints
    and the dense-model parameter tree transfer verbatim); node features
    here are the bond messages m (sharded [E/D, F]), edge features the
    angle features z (ring-ordered [D*S, F]).  Padded ring rows carry
    lg_mask 0 and drop out of both numerator and denominator.
    """

    features: int
    axis_name: str = "graph"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, m_loc, z_ring, ring: RingIndex, train: bool = True):
        f = self.features
        d, off = ring.n_shards, ring.offsets
        e_loc = m_loc.shape[0]

        src_gate = Dense(f, dtype=self.dtype, name="src_gate")(m_loc)
        dst_gate = Dense(f, dtype=self.dtype, name="dst_gate")(m_loc)
        bh = Dense(f, dtype=self.dtype, name="dst_update")(m_loc)
        edge_gate = Dense(f, dtype=self.dtype, name="edge_gate")(z_ring)

        buf = jnp.concatenate([src_gate, bh], axis=-1)  # ring payload
        gather = ring_mode() == "gather"
        bufs = ring_broadcast(buf, d, self.axis_name) if gather else None
        num = jnp.zeros((e_loc, f), dtype=jnp.float32)
        den = jnp.zeros((e_loc, f), dtype=jnp.float32)
        m_lg_parts = []
        for k in range(d):
            cols = slice(off[k], off[k + 1])
            lsrc = ring.lg_src[0, cols]
            ldst = ring.lg_dst[0, cols]
            w = ring.lg_mask[0, cols]
            step_buf = bufs[k] if gather else buf
            sg_r = step_buf[:, :f][lsrc]
            bh_r = step_buf[:, f:][lsrc]
            m_lg_k = sg_r + dst_gate[ldst] + edge_gate[cols]
            sigma = jax.nn.sigmoid(m_lg_k) * w[:, None]
            packed = jnp.concatenate([sigma * bh_r, sigma], axis=-1)
            agg = segment_sum(packed.astype(jnp.float32), ldst, e_loc,
                              indices_are_sorted=True)
            num = num + agg[:, :f]
            den = den + agg[:, f:]
            m_lg_parts.append(m_lg_k)
            if not gather and k + 1 < d:
                buf = jax.lax.ppermute(buf, self.axis_name, _ring_perm(d))
        h = (num / (den + 1e-6)).astype(m_loc.dtype)
        m_lg = jnp.concatenate(m_lg_parts)

        x_new = Dense(f, dtype=self.dtype, name="src_update")(m_loc) + h
        x_new = nn.silu(MaskedLayerNorm(name="norm_nodes")(x_new))
        e_new = nn.silu(MaskedLayerNorm(name="norm_edges")(m_lg))
        return m_loc + x_new, z_ring + e_new  # residuals (EGGC default)


class _GPALIGNNConv(nn.Module):
    """One ALIGNN layer: psum'd g-stage + ring L-stage."""

    features: int
    axis_name: str = "graph"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, y, z, src, dst, ring: RingIndex,
                 train: bool = True):
        x, m = EdgeGatedGraphConv(
            self.features, norm="layernorm", dtype=self.dtype,
            edge_axis=self.axis_name, name="node_update")(
            x, y, src, dst, train=train)
        y, z = RingEdgeGatedGraphConv(
            self.features, axis_name=self.axis_name, dtype=self.dtype,
            name="edge_update")(m, z, ring, train=train)
        return x, y, z


class _GPTrunk(nn.Module):
    """ALIGNN + GCN stacks; module names mirror models._Trunk."""

    cfg: ALIGNNAtomWiseConfig
    axis_name: str = "graph"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, batch: GraphBatch, x, y, z, ring: RingIndex,
                 train: bool = True):
        cfg = self.cfg
        for i in range(cfg.alignn_layers):
            x, y, z = _GPALIGNNConv(
                cfg.hidden_features, axis_name=self.axis_name,
                dtype=self.dtype, name=f"alignn_layers_{i}")(
                x, y, z, batch.src, batch.dst, ring, train=train)
        for i in range(cfg.gcn_layers):
            x, y = EdgeGatedGraphConv(
                cfg.hidden_features, norm="layernorm", dtype=self.dtype,
                edge_axis=self.axis_name, name=f"gcn_layers_{i}")(
                x, y, batch.src, batch.dst, train=train)
        return x, y


class GPALIGNNAtomWise(nn.Module):
    """Edge-sharded ALIGNN-FF core; apply inside shard_map.

    `__call__(batch, r_loc, ring)` — `batch` carries LOCAL edge fields
    (shard_map slices) and replicated node/graph fields; `r_loc` is this
    chip's [E/D, 3] bond-vector shard (the autograd point for forces).
    Returns the same result dict as ALIGNNAtomWise (out/en_out/... are
    replicated; "bondlength" is the local shard).
    """

    cfg: ALIGNNAtomWiseConfig
    axis_name: str = "graph"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, batch: GraphBatch, r_loc, ring: RingIndex,
                 train: bool = True):
        cfg = self.cfg
        kw = dict(norm="layernorm", axis_name=None, dtype=self.dtype)
        bondlength = jnp.linalg.norm(r_loc, axis=1)
        cosines = ring_cosines(r_loc, ring, self.axis_name)

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

        # reuse the dense model's embedding stack verbatim (same module
        # names -> same parameter tree; masks only affect batchnorm and
        # this flavor is layernorm).  lg_mask is swapped for the
        # ring-ordered mask so shapes line up with the ring cosines.
        from alignn_tpu.nn.models import _Embeddings

        emb_batch = batch.replace(lg_mask=ring.lg_mask[0])
        x, y, z = _Embeddings(cfg, norm="layernorm", dtype=self.dtype,
                              name="embeddings")(
            emb_batch, rbf_input, cosines, train=train,
            edge_scale=edge_scale)
        x, y = _GPTrunk(cfg, axis_name=self.axis_name, dtype=self.dtype,
                        name="trunk")(batch, x, y, z, ring, train=train)

        return atomwise_heads(cfg, kw, batch, x, bondlength,
                              batch.edge_mask, self.axis_name, train)
