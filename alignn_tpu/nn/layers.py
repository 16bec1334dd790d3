"""Core flax modules: norms, MLP blocks, edge-gated graph convolution.

TPU-native re-implementations of the reference model ops:
- `MLPLayer` (Linear+Norm+SiLU): reference `alignn/models/alignn.py:170-184`
  (BatchNorm flavor) and `alignn/models/utils.py:277-292` (LayerNorm).
- `EdgeGatedGraphConv`: reference `alignn/models/alignn.py:48-129`
  (BatchNorm) / `alignn/models/alignn_atomwise.py:127-208` (LayerNorm).
  Message passing is gathers + fused segment reductions
  (:mod:`alignn_tpu.ops.segment`) instead of DGL update_all.
- `ALIGNNConv`: paired g / L(g) update, reference alignn.py:132-167.

All modules take explicit row masks so BatchNorm statistics exclude padded
rows; under data parallelism BatchNorm accepts an `axis_name` to reduce
batch statistics across devices (the reference relies on per-device stats
from torch BatchNorm1d under DDP; cross-replica stats are strictly
better-behaved and equal in the single-device case).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from alignn_tpu.ops.basis import rbf_expand, rbf_params
from alignn_tpu.ops.segment import edge_gated_aggregate


def pallas_default() -> bool:
    """Fused Pallas aggregation on TPU backends unless disabled.

    ALIGNN_TPU_FORCE_PALLAS=1 enables the Pallas paths on CPU too
    (kernels run in interpret mode) — used by tests to cover the fused
    paths at model level without TPU hardware.
    """
    import os

    if os.environ.get("ALIGNN_TPU_DISABLE_PALLAS"):
        return False
    if os.environ.get("ALIGNN_TPU_FORCE_PALLAS"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def torch_linear_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default bound."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    """Linear layer with torch-compatible default init."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    bias_init_value: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init(fan_in),
                            (fan_in, self.features))
        y = jnp.dot(x.astype(self.dtype or x.dtype),
                    kernel.astype(self.dtype or kernel.dtype))
        if self.use_bias:
            if self.bias_init_value is not None:
                bias = self.param(
                    "bias",
                    lambda key, shape, dtype=jnp.float32: jnp.full(
                        shape, self.bias_init_value, dtype),
                    (self.features,))
            else:
                bias = self.param("bias", torch_linear_init(fan_in),
                                  (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class _DenseParams(nn.Module):
    """Declares Dense-layout params (kernel/bias) WITHOUT applying them.

    The fused L-stage kernel (ops/pallas_fused_lstage.py) consumes the
    edge_gate matmul params directly; declaring them through this module
    (name="edge_gate") keeps the parameter tree byte-identical to the
    unfused path's Dense submodule, so checkpoints convert/load across
    both paths.
    """

    features: int
    fan_in: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_linear_init(self.fan_in),
                            (self.fan_in, self.features))
        bias = self.param("bias", torch_linear_init(self.fan_in),
                          (self.features,))
        return kernel, bias


class _NormParams(nn.Module):
    """Declares layernorm params (scale/bias) without applying them.

    Same tree-compat trick as _DenseParams, for MaskedLayerNorm
    (name="norm_edges") consumed inside the fused L-stage kernel.
    """

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class MaskedLayerNorm(nn.Module):
    """Row-wise LayerNorm (torch nn.LayerNorm parity: eps 1e-5, affine)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None):
        # per-row statistics: padding rows normalize harmlessly in place.
        # Statistics/affine run in >= f32, but the OUTPUT keeps the input
        # dtype — multiplying bf16 activations by the f32 scale param
        # would otherwise silently promote every downstream edge/L-edge
        # table (and its cotangents) to f32, doubling HBM traffic
        # (round-2 finding; see BENCH_NOTES.md).
        f = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        xf = x.astype(stat_dtype)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over rows with a row mask (torch BatchNorm1d parity).

    Padded rows are excluded from batch statistics via the mask.  With
    `axis_name`, statistics reduce across the device mesh so data-parallel
    training sees full-batch statistics.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        f = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(f, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(f, jnp.float32))

        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        xf = x.astype(stat_dtype)
        if use_running_average:
            mean = ra_mean.value.astype(stat_dtype)
            var = ra_var.value.astype(stat_dtype)
        else:
            if mask is None:
                w = jnp.ones(x.shape[0], stat_dtype)
            else:
                w = mask.astype(stat_dtype)
            cnt = jnp.sum(w)
            sum_x = jnp.sum(xf * w[:, None], axis=0)
            sum_x2 = jnp.sum((xf * xf) * w[:, None], axis=0)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                sum_x = jax.lax.psum(sum_x, self.axis_name)
                sum_x2 = jax.lax.psum(sum_x2, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = sum_x / cnt
            var = jnp.maximum(sum_x2 / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                # torch updates running var with the unbiased estimate
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                m = self.momentum
                ra_mean.value = ((1 - m) * ra_mean.value
                                 + m * mean.astype(jnp.float32))
                ra_var.value = ((1 - m) * ra_var.value
                                + m * unbiased.astype(jnp.float32))
        # output keeps the input dtype (see MaskedLayerNorm note)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class RBFExpansion(nn.Module):
    """Gaussian RBF expansion module (reference models/utils.py:11-44)."""

    vmin: float = 0.0
    vmax: float = 8.0
    bins: int = 40
    lengthscale: Optional[float] = None

    def setup(self):
        centers, gamma = rbf_params(self.vmin, self.vmax, self.bins,
                                    self.lengthscale)
        self.centers = jnp.asarray(centers)
        self.gamma = gamma

    def __call__(self, distance):
        return rbf_expand(distance, self.centers, self.gamma)


class MLPLayer(nn.Module):
    """Linear -> Norm -> SiLU (reference alignn.py:170-184 / utils.py:277)."""

    features: int
    norm: str = "layernorm"  # or "batchnorm"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        y = Dense(self.features, dtype=self.dtype, name="linear")(x)
        if self.norm == "batchnorm":
            y = MaskedBatchNorm(axis_name=self.axis_name, name="norm")(
                y, mask=mask, use_running_average=not train)
        else:
            y = MaskedLayerNorm(name="norm")(y, mask=mask)
        return nn.silu(y)


class EdgeGatedGraphConv(nn.Module):
    """Edge-gated graph convolution (arXiv:1711.07553 / 2003.00982).

    Exact math of the reference (alignn_atomwise.py:157-208):
        m_e   = W_sg x_src + W_dg x_dst + W_eg e
        sig_e = sigmoid(m_e)
        h_i   = (sum_{e->i} sig_e * W_du x_src(e)) / (sum_{e->i} sig_e + 1e-6)
        x'    = x + SiLU(Norm(W_su x + h))
        e'    = e + SiLU(Norm(m))
    Parameter names mirror the reference for checkpoint conversion
    ("dst_update" is applied to source features in the aggregation — the
    reference's naming, kept verbatim).
    """

    features: int
    norm: str = "layernorm"
    residual: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    use_pallas: Optional[bool] = None  # None = auto (TPU backend)
    edge_axis: Optional[str] = None    # edge-partitioned mesh axis
    # static windowed-gather spans (src idx / dst idx / sorted src idx)
    # from GraphBatch.win_* — 0 disables the windowed kernel
    windows: tuple = (0, 0, 0)
    # dense-neighborhood layout (graph/dense.py): D > 0 means the edge
    # table is D-blocks by dst, aggregations become axis reductions, and
    # (with dense_lstage) the src-side gather is a block gather of the
    # [num_nodes//D, D*2F]-reshaped table.  `edge_mask` is REQUIRED in
    # dense mode: trash slots live inside real blocks, so the mask (not
    # trash-row routing) isolates them.
    dense_D: int = 0
    # normalized-aggregation epsilon for SOFT edge/pair weights: the
    # default 1e-6 is reference parity, but with smooth envelope
    # weights (nn/models.py envelope_edge_weights) a near-cutoff bond's
    # pair-weight sum is << eps and force training's grad-of-grad
    # squares the 1/eps backward amplification to ~1e12 — inf in f32
    # (observed as epoch-2 NaN on device).  The envelope model sets
    # 1e-3 (amplification <= 1e6; forward bias on populated segments
    # ~1e-4 relative).
    soft_agg_eps: float = 1e-6
    dense_lstage: bool = False

    @nn.compact
    def __call__(self, x, e, src, dst, node_mask=None, edge_mask=None,
                 train: bool = True, edge_weight=None,
                 src_perm=None, src_perm_inv=None, rev=None):
        num_nodes = x.shape[0]
        f = self.features
        w_src, w_dst, w_src_sorted = self.windows
        src_gate = Dense(f, dtype=self.dtype, name="src_gate")(x)
        dst_gate = Dense(f, dtype=self.dtype, name="dst_gate")(x)
        bh = Dense(f, dtype=self.dtype, name="dst_update")(x)
        pallas = self.use_pallas if self.use_pallas is not None \
            else pallas_default()
        if self.dense_D and self.dense_lstage:
            # fully-fused L-stage (ops/pallas_fused_lstage.py): matmul +
            # gates + aggregation + layernorm + silu + residual in one
            # kernel, m2 never materialized in HBM.  OPT-IN
            # (ALIGNN_TPU_FUSED_LSTAGE=1): the honest device A/B
            # (BENCH_NOTES round 3, "fused L-stage post-mortem") measured
            # it SLOWER for E/F/S training — the step is double-backward
            # dominated and the fused design forces m2 recompute in
            # every backward pass, while the unfused path amortizes the
            # materialized m2; even the pure forward kernel trails XLA's
            # fusion pipeline (7.5 vs 6.3 ms at batch 64).  Kept as a
            # validated alternative layout for future shapes/hardware.
            # NOTE the argument aliasing in L-stage calls: `node_mask`
            # is the E-mask (the L(g) "nodes" are g's edges) — the fused
            # path folds it into both gate operands, which masks exactly
            # the pairs that `edge_mask` (= lg_mask = em_s * em_t) masks.
            import os

            if (pallas and self.norm == "layernorm" and self.residual
                    and edge_weight is None
                    and os.environ.get("ALIGNN_TPU_FUSED_LSTAGE")):
                e_new, h = self._fused_dense_lstage(
                    e, rev, src_gate, dst_gate, bh, node_mask, pallas)
                x_new = self._node_tail(x, h, node_mask, train)
                return x_new, e_new
            m, h = self._dense_pair_lstage(
                e, rev, src_gate, dst_gate, bh, edge_mask, edge_weight,
                pallas)
            x_new, e_new = self._update_tail(x, e, m, h, node_mask,
                                             edge_mask, train)
            from alignn_tpu.ops.fp8 import (
                fp8_ltables_enabled,
                fp8_round_trip,
            )

            if fp8_ltables_enabled():
                # z residual stream at the layer boundary stored in
                # e4m3 (the other [L, F] traffic term; ops/fp8.py)
                e_new = fp8_round_trip(e_new)
            return x_new, e_new
        if self.dense_D:
            m, h = self._dense_gather_aggregate(
                x, e, src, src_gate, dst_gate, bh, edge_mask, edge_weight,
                pallas, src_perm, src_perm_inv)
            return self._update_tail(x, e, m, h, node_mask, edge_mask,
                                     train)
        fuse_gathers = (pallas and src_perm is not None
                        and self.edge_axis is None)
        if fuse_gathers:
            # gathers with sorted-scatter transposes (round 2): dst is
            # sorted by construction; src rides the precomputed argsort
            # permutation.  Without this, the backward's dominant cost
            # is XLA serialized scatter-adds of the [E|L, F] cotangents.
            # src_gate and bh ride ONE concatenated gather: the device
            # profile (tools/gather_probe*, BENCH_NOTES round 3) shows
            # XLA's gather is latency-bound per ROW, so k same-index
            # gathers cost ~k0x fused vs kx separate — and the transpose
            # (one [*, 2F] sorted scatter) keeps the same property.
            # The window args route forwards through the windowed
            # one-hot MXU gather (round 2, ops/pallas_gather).
            from alignn_tpu.ops.pallas_eggc import (
                gather_nodes,
                sorted_gather,
            )

            cat_e = gather_nodes(
                jnp.concatenate([src_gate, bh], axis=-1), src,
                src_perm, src_perm_inv, num_nodes, True, w_src,
                w_src_sorted)
            sg_e, bh_e = cat_e[:, :f], cat_e[:, f:]
            dg_e = sorted_gather(dst_gate, dst, num_nodes, True, w_dst)
        else:
            sg_e = src_gate[src]
            dg_e = dst_gate[dst]
            bh_e = bh[src]
        m = sg_e + dg_e + Dense(f, dtype=self.dtype, name="edge_gate")(e)
        if pallas and edge_weight is None and self.edge_axis is None:
            from alignn_tpu.ops.pallas_eggc import (
                edge_gated_aggregate_pallas,
            )

            h = edge_gated_aggregate_pallas(bh_e, m, dst, num_nodes,
                                            window=w_dst)
        else:
            sigma = nn.sigmoid(m)
            if edge_weight is not None:
                # soft edge pruning (eALIGNN inner_cutoff masks): a zero
                # weight removes the edge from both numerator and
                # denominator, matching dynamic edge removal
                sigma = sigma * edge_weight[:, None]
            h = edge_gated_aggregate(
                bh_e, sigma, dst, num_nodes,
                eps=(self.soft_agg_eps if edge_weight is not None
                     else 1e-6),
                edge_axis=self.edge_axis)
        return self._update_tail(x, e, m, h, node_mask, edge_mask, train)

    def _fused_dense_lstage(self, e, rev, src_gate, dst_gate, bh, em,
                            pallas):
        """Fused local-pair L-stage (ops/pallas_fused_lstage.py).

        Declares edge_gate / norm_edges params through the param-only
        modules so the variable tree matches the unfused path exactly
        (checkpoints load interchangeably).  `em` is the [E] edge mask
        of g; folding it additively into sg AND dg masks pair (t, s)
        iff lg_mask would (em[rev] == em: rev maps real<->real,
        trash->self).
        """
        f, D = self.features, self.dense_D
        from alignn_tpu.ops.pallas_dense import MASK_SHIFT
        from alignn_tpu.ops.pallas_eggc import permute_rows
        from alignn_tpu.ops.pallas_fused_lstage import fused_pair_lstage

        kernel, kbias = _DenseParams(f, fan_in=e.shape[-1],
                                     name="edge_gate")()
        scale, nbias = _NormParams(f, name="norm_edges")()
        if em is not None:
            shift = ((em - 1.0) * MASK_SHIFT).astype(
                src_gate.dtype)[:, None]
            sg_f = src_gate + shift
            dg_f = dst_gate + shift
        else:
            sg_f, dg_f = src_gate, dst_gate
        dg_f = permute_rows(dg_f, rev, rev)
        e_new, h_jt = fused_pair_lstage(e, kernel, kbias, sg_f, dg_f, bh,
                                        scale, nbias, D, pallas)
        h = permute_rows(h_jt, rev, rev)
        return e_new, h

    def _dense_pair_lstage(self, e, rev, src_gate, dst_gate, bh,
                           lg_mask, lg_weight, pallas):
        """Local-pair L-stage (graph/dense.py v2 layout).

        The L(g) nodes are the edges (tables [E, F], E = N*D, D-blocks
        by dst node); the L(g) edge (a, b) with dst[a] == src[b] == j is
        the local pair (a = j*D+s, b = rev[j*D+t]) at z-row
        j*D^2 + t*D + s.  Gate assembly is two block broadcasts plus ONE
        [E, F] involution permutation (dst_gate[rev]); aggregation over
        s is the pair kernel; the result rides rev back to edge rows.
        Scatter-free at every derivative order (permute-by-rev is its
        own transpose).
        """
        f, D = self.features, self.dense_D
        n = src_gate.shape[0] // D
        from alignn_tpu.ops.pallas_dense import (
            dense_pair_aggregate,
            fold_mask,
        )
        from alignn_tpu.ops.pallas_eggc import permute_rows

        dg_r = permute_rows(dst_gate, rev, rev)       # dg[rev], involution
        m2 = (src_gate.reshape(n, 1, D, f)
              + dg_r.reshape(n, D, 1, f)).reshape(-1, f) \
            + Dense(f, dtype=self.dtype, name="edge_gate")(e)
        m2 = fold_mask(m2, lg_mask)
        if lg_weight is None:
            h_jt = dense_pair_aggregate(m2, bh, D, pallas)
        else:
            # soft pair weights (eALIGNN): XLA path, explicit multiply
            sigma = (jax.nn.sigmoid(m2.astype(jnp.float32))
                     * lg_weight.astype(jnp.float32)[:, None]).reshape(
                n, D, D, f)
            bh4 = bh.astype(jnp.float32).reshape(n, 1, D, f)
            num = (sigma * bh4).sum(axis=2)
            den = sigma.sum(axis=2)
            h_jt = (num / (den + self.soft_agg_eps)).reshape(
                n * D, f).astype(m2.dtype)
        h = permute_rows(h_jt, rev, rev)              # rows (j,t) -> edge b
        return m2, h

    def _dense_gather_aggregate(self, x, e, src, src_gate, dst_gate, bh,
                                edge_mask, edge_weight, pallas,
                                src_perm, src_perm_inv):
        """Dense-neighborhood node stage (graph/dense.py layout).

        x is the [N, F] node table, the e-table has N*D rows in D-blocks
        by dst node: the src-side gathers ride one concatenated [N, 2F]
        gather, the dst side is a pure broadcast, and the aggregation is
        a blockwise axis reduction — no scatter at any derivative order.
        """
        num_nodes, f, D = x.shape[0], self.features, self.dense_D
        cat = jnp.concatenate([src_gate, bh], axis=-1)
        nb, cat_tbl = num_nodes, cat
        if pallas and src_perm is not None:
            from alignn_tpu.ops.pallas_eggc import gather_nodes

            cat_e = gather_nodes(cat_tbl, src, src_perm, src_perm_inv, nb)
        else:
            cat_e = cat_tbl[src]
        sg_e, bh_e = cat_e[:, :f], cat_e[:, f:]
        # dst side is the block owner: pure broadcast (transpose = sum)
        dg_e = jnp.broadcast_to(
            dst_gate[:, None, :], (num_nodes, D, f)).reshape(-1, f)
        m = sg_e + dg_e + Dense(f, dtype=self.dtype, name="edge_gate")(e)
        # blockwise masked aggregation: the slot mask folds ADDITIVELY
        # into the logits (sigma(-1e9) == 0 exactly, gradient included),
        # and the Pallas kernel keeps sigma in VMEM instead of
        # materializing [rows, F] f32 tensors (ops/pallas_dense.py)
        from alignn_tpu.ops.pallas_dense import (
            dense_gated_aggregate,
            fold_mask,
        )

        m_agg = fold_mask(m, edge_mask)
        if edge_weight is None:
            h = dense_gated_aggregate(m_agg, bh_e, D, pallas)
        else:
            # soft edge pruning (eALIGNN inner_cutoff): weights cannot
            # fold additively — XLA path with an explicit multiply
            sigma = (jax.nn.sigmoid(m_agg.astype(jnp.float32))
                     * edge_weight.astype(jnp.float32)[:, None])
            num = (sigma * bh_e.astype(jnp.float32)).reshape(
                num_nodes, D, f).sum(axis=1)
            den = sigma.reshape(num_nodes, D, f).sum(axis=1)
            h = (num / (den + self.soft_agg_eps)).astype(m.dtype)
        return m, h

    def _node_tail(self, x, h, node_mask, train):
        """Node-side update: src_update + norm + silu + residual.
        Shared by _update_tail and the fused L-stage branch (whose
        e-side tail runs inside the kernel)."""
        f = self.features
        x_new = Dense(f, dtype=self.dtype, name="src_update")(x) + h
        if self.norm == "batchnorm":
            x_new = MaskedBatchNorm(axis_name=self.axis_name,
                                    name="norm_nodes")(
                x_new, mask=node_mask, use_running_average=not train)
        else:
            x_new = MaskedLayerNorm(name="norm_nodes")(x_new)
        x_new = nn.silu(x_new)
        if self.residual:
            x_new = x + x_new
        return x_new

    def _update_tail(self, x, e, m, h, node_mask, edge_mask, train):
        x_new = self._node_tail(x, h, node_mask, train)
        if self.norm == "batchnorm":
            e_new = MaskedBatchNorm(axis_name=self.axis_name,
                                    name="norm_edges")(
                m, mask=edge_mask, use_running_average=not train)
        else:
            e_new = MaskedLayerNorm(name="norm_edges")(m)
        e_new = nn.silu(e_new)
        if self.residual:
            e_new = e + e_new
        return x_new, e_new


class ALIGNNConv(nn.Module):
    """One ALIGNN layer: EGGC on g, then EGGC on L(g).

    Reference alignn.py:132-167: node_update(g, x, y) -> (x, m);
    edge_update(L(g), m, z) -> (y, z).

    The edge-sharded (graph-parallel) variant with the ring-pipelined
    L-stage lives in parallel/gp_model.py.
    """

    features: int
    norm: str = "layernorm"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    windows: tuple = (0, 0, 0)      # node-stage gather windows
    lg_windows: tuple = (0, 0, 0)   # L(g)-stage gather windows
    dense_D: int = 0                # dense-neighborhood block degree
    soft_agg_eps: float = 1e-6      # see EdgeGatedGraphConv

    @nn.compact
    def __call__(self, x, y, z, src, dst, lg_src, lg_dst,
                 node_mask=None, edge_mask=None, lg_mask=None,
                 train: bool = True, edge_weight=None, lg_weight=None,
                 src_perm=None, src_perm_inv=None,
                 lg_src_perm=None, lg_src_perm_inv=None, rev=None):
        x, m = EdgeGatedGraphConv(
            self.features, norm=self.norm, axis_name=self.axis_name,
            dtype=self.dtype, windows=self.windows,
            dense_D=self.dense_D, soft_agg_eps=self.soft_agg_eps,
            name="node_update")(
            x, y, src, dst, node_mask=node_mask, edge_mask=edge_mask,
            train=train, edge_weight=edge_weight,
            src_perm=src_perm, src_perm_inv=src_perm_inv)
        if self.dense_D:
            # dense layout: the L stage is local pairs within each
            # dst-block, wired by the rev involution — it consumes no
            # lg index arrays at all (graph/dense.py)
            y, z = EdgeGatedGraphConv(
                self.features, norm=self.norm, axis_name=self.axis_name,
                dtype=self.dtype, dense_D=self.dense_D, dense_lstage=True,
                soft_agg_eps=self.soft_agg_eps, name="edge_update")(
                m, z, None, None, node_mask=edge_mask, edge_mask=lg_mask,
                train=train, edge_weight=lg_weight, rev=rev)
            return x, y, z
        y, z = EdgeGatedGraphConv(
            self.features, norm=self.norm, axis_name=self.axis_name,
            dtype=self.dtype, windows=self.lg_windows,
            soft_agg_eps=self.soft_agg_eps, name="edge_update")(
            m, z, lg_src, lg_dst, node_mask=edge_mask, edge_mask=lg_mask,
            train=train, edge_weight=lg_weight,
            src_perm=lg_src_perm, src_perm_inv=lg_src_perm_inv)
        from alignn_tpu.ops.fp8 import fp8_ltables_enabled, \
            fp8_round_trip

        if fp8_ltables_enabled():
            # sparse-layout twin of the dense branch's z-stream storage
            # (ops/fp8.py): the [L, F] residual crossing the layer
            # boundary lives in e4m3
            z = fp8_round_trip(z)
        return x, y, z
