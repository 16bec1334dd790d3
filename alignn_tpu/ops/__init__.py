"""Compute ops: segment reductions, basis expansions, Pallas kernels."""

from alignn_tpu.ops.basis import (
    bond_cosines,
    cutoff_function_based_edges,
    rbf_expand,
    rbf_params,
)
from alignn_tpu.ops.segment import (
    edge_gated_aggregate,
    graph_readout_mean,
    graph_readout_sum,
    segment_mean_by_count,
    segment_sum,
)

__all__ = [
    "bond_cosines", "cutoff_function_based_edges", "rbf_expand",
    "rbf_params", "edge_gated_aggregate", "graph_readout_mean",
    "graph_readout_sum", "segment_mean_by_count", "segment_sum",
]
