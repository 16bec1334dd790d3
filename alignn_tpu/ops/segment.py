"""Segment/gather primitives for message passing on TPU.

TPU-native replacements for DGL's C++ SpMM/SDDMM message-passing kernels
(`fn.u_add_v`, `fn.u_mul_e` + `fn.sum`, `fn.copy_e` + `fn.sum`,
`dgl.nn.AvgPooling` — used by the reference at
`alignn/models/alignn.py:100-108,242`).  Graphs are flat index arrays, so
message passing is gathers (`x[idx]`) plus `segment_sum` scatter-adds,
which XLA lowers to TPU-friendly sorted-scatter code.  A fused Pallas
path for the edge-gated aggregation lives in
:mod:`alignn_tpu.ops.pallas_eggc` and is selected by the models when
enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int, indices_are_sorted: bool = False):
    """Sum `data` rows into `num_segments` buckets."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_mean_by_count(data: jnp.ndarray, segment_ids: jnp.ndarray,
                          counts: jnp.ndarray,
                          indices_are_sorted: bool = False):
    """Segment mean with externally supplied per-segment counts.

    Equivalent of dgl AvgPooling (reference alignn.py:242) for the padded
    batch: padded rows route to the trash segment, so the sums over real
    segments are exact and we divide by the true per-graph node counts.
    """
    num_segments = counts.shape[0]
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    return total / jnp.maximum(counts, 1.0)[:, None]


def graph_readout_mean(node_feats: jnp.ndarray, node_graph: jnp.ndarray,
                       n_nodes: jnp.ndarray):
    """Per-graph mean over nodes: [N, F] -> [G, F]."""
    return segment_mean_by_count(node_feats, node_graph, n_nodes)


def graph_readout_sum(node_feats: jnp.ndarray, node_graph: jnp.ndarray,
                      num_graphs: int):
    """Per-graph sum over nodes: [N, F] -> [G, F]."""
    return segment_sum(node_feats, node_graph, num_graphs)


def edge_gated_aggregate(gated_src_feats: jnp.ndarray, sigma: jnp.ndarray,
                         dst: jnp.ndarray, num_nodes: int,
                         eps: float = 1e-6,
                         indices_are_sorted: bool = True,
                         edge_axis: str | None = None):
    """Normalized gated aggregation: the EGGC node-update reduction.

    h_i = (sum_{e: dst(e)=i} sigma_e * Bh_src(e)) / (sum sigma_e + eps)

    Both reductions fuse into one scatter by concatenating features —
    one pass over HBM instead of two (vs reference alignn.py:105-108,
    which issues two DGL update_all calls).  Edges are sorted by dst at
    graph-build time (alignn_tpu.graph.build.build_graph), so the
    scatter is a contiguous segment reduction.
    """
    f = gated_src_feats.shape[-1]
    packed = jnp.concatenate([gated_src_feats * sigma, sigma], axis=-1)
    summed = segment_sum(packed, dst, num_nodes,
                         indices_are_sorted=indices_are_sorted)
    if edge_axis is not None:
        # edge-partitioned mode: every chip holds an edge shard; partial
        # segment sums reduce over ICI *before* the normalization divide
        summed = jax.lax.psum(summed, edge_axis)
    sum_sigma_h = summed[:, :f]
    sum_sigma = summed[:, f:]
    return sum_sigma_h / (sum_sigma + eps)
