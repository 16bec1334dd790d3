"""Graph layer (L1): construction, line graphs, padded batching."""

from alignn_tpu.graph.build import (
    GraphData,
    bond_cosines,
    build_graph,
    build_undirected_edgedata,
    canonize_edge,
    line_graph_edges,
    nearest_neighbor_edges,
    radius_graph,
    radius_graph_jarvis,
)
from alignn_tpu.graph.batch import BucketSpec, GraphBatch, batch_graphs

__all__ = [
    "GraphData", "bond_cosines", "build_graph", "build_undirected_edgedata",
    "canonize_edge", "line_graph_edges", "nearest_neighbor_edges",
    "radius_graph", "radius_graph_jarvis", "BucketSpec", "GraphBatch",
    "batch_graphs",
]
