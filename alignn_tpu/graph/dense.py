"""Dense-neighborhood batch layout: regular blocks instead of index lists.

The round-3 device profile (BENCH_NOTES) showed the E/F/S train step is
HBM-traffic-bound: the sparse layout materializes ~20 `[L, F]`-sized
gather outputs and scatter temporaries per step.  This layout removes
almost all of them by exploiting a property of ALIGNN's graphs that the
reference's DGL machinery cannot: k-NN crystal graphs have *near-uniform
in-degree* (exactly 12 for the standard `max_neighbors=12` build, ties
aside).  Pad every node's in-edge list to a static degree ``D`` and the
irregular index structure becomes algebra:

- edge row ``j*D + s`` is the s-th in-edge of node ``j`` =>
  ``dst == row // D`` and every dst-aggregation is a masked
  ``[M, D, F] -> [M, F]`` axis reduction (transpose = broadcast; no
  scatters at ANY derivative order);
- L(g) edge ``(a, b)`` exists iff ``dst[a] == src[b]``
  (graph/build.py:314), i.e. the L-in-neighbors of edge ``b`` are
  exactly block ``src[b]`` => lg_dst-aggregations are the same axis
  reduction, and the lg_src gather collapses to ONE row gather of the
  ``[N, D*F]``-reshaped edge table by ``src`` — D x fewer gather rows,
  each streamed at full HBM bandwidth;
- k-NN crystal graphs are symmetric under canonization, so every edge
  has a reverse row (``rev``, an involution with ``r[rev] == -r``
  exactly).  The L(g) edge (a, b) with ``dst[a] == src[b] == j`` is
  then the *local pair* (a = j*D+s, b = rev(j*D+t)) — the entire
  L-stage becomes per-node all-pairs algebra: angle cosines are
  node-local dot products (``cos = r_s . r_t / |r_s||r_t|``, no gather
  at all), gate assembly is two block broadcasts plus ONE [E, F]
  involution permutation (``dst_gate[rev]``), and the L-aggregation is
  a trailing-axis reduction (ops/pallas_dense.py pair kernel);
- the line-graph index arrays become *implicit* (pair (j, t, s) lives
  at row ``j*D^2 + t*D + s``), so the builder never materializes
  Sum(deg^2) index lists — graph build gets cheaper too.

A dense batch is a normal :class:`GraphBatch` (same fields) whose index
arrays have the block structure, plus the static ``dense_D`` and the
``rev`` involution.  Parity with the sparse path is tested at the
model-output level (tests/test_dense.py; the sparse path is itself
pinned against the reference's own source via tests/test_ref_oracle.py).
The dense fast paths live in nn/layers.py (EdgeGatedGraphConv /
ALIGNNConv ``dense_D``) and nn/models.py (dense cosines).

Replaces the reference's DGL sparse kernels (alignn/graphs.py:471-592
graph+line-graph assembly; models/alignn.py:100-108 update_all) with a
layout chosen for the TPU's dense-tile memory system rather than
translated from CSR.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from alignn_tpu.chem.features import FEATURESET_SIZE, attribute_lookup_table
from alignn_tpu.graph.batch import BucketSpec, GraphBatch, _round_up
from alignn_tpu.graph.build import GraphData


def max_in_degree(graphs: Sequence[GraphData]) -> int:
    """Max per-node in-degree over the graphs (host-side numpy)."""
    out = 0
    for g in graphs:
        if g.num_edges:
            out = max(out, int(np.bincount(
                g.dst, minlength=g.num_nodes).max()))
    return out


def dense_spec_for_batch(graphs: Sequence[GraphData],
                         D: Optional[int] = None,
                         node_quantum: int = 128) -> BucketSpec:
    """Tight dense BucketSpec for exactly this batch."""
    if D is None:
        D = max_in_degree(graphs)
    n_pad = _round_up(sum(g.num_nodes for g in graphs), node_quantum)
    return BucketSpec(n_nodes=n_pad, n_edges=n_pad * D,
                      n_lg_edges=n_pad * D * D,
                      n_graphs=len(graphs) + 1, dense_D=D)


def dense_spec_for_graphs(graphs: Sequence[GraphData], batch_size: int,
                          D: Optional[int] = None,
                          node_quantum: int = 128,
                          slack: float = 1.0) -> BucketSpec:
    """One static dense bucket covering every batch of `batch_size`."""
    if D is None:
        D = max_in_degree(graphs)
    max_n = max(g.num_nodes for g in graphs)
    n_pad = _round_up(int(max_n * batch_size * slack), node_quantum)
    return BucketSpec(n_nodes=n_pad, n_edges=n_pad * D,
                      n_lg_edges=n_pad * D * D,
                      n_graphs=batch_size + 1, dense_D=D)


def dense_spec_from_counts(node_counts, indeg_counts, batch_size: int,
                           node_quantum: int = 128,
                           slack: float = 1.0) -> BucketSpec:
    """Dense bucket from cache metadata (no graph deserialization).

    `indeg_counts`: per-graph max in-degree recorded at cache-write
    time — lazy ALIGNN-FF-scale datasets size the dense bucket without
    unpacking a single record.
    """
    D = int(np.max(indeg_counts))
    max_n = int(np.max(node_counts))
    n_pad = _round_up(int(max_n * batch_size * slack), node_quantum)
    return BucketSpec(n_nodes=n_pad, n_edges=n_pad * D,
                      n_lg_edges=n_pad * D * D,
                      n_graphs=batch_size + 1, dense_D=D)


def dense_spec_with_slack(g: GraphData, bucket_slack: float = 1.3,
                          degree_headroom: int = 2,
                          node_quantum: int = 128) -> BucketSpec:
    """Reusable dense bucket for a single evolving structure.

    Node slack and degree headroom let thermal motion / relaxation steps
    that add an atom's neighbor or two reuse the compile (shared by the
    FF Calculator, jit-MD, and measurement tools).
    """
    D = max_in_degree([g]) + degree_headroom
    n_pad = _round_up(int(g.num_nodes * bucket_slack) + 1, node_quantum)
    return BucketSpec(n_nodes=n_pad, n_edges=n_pad * D,
                      n_lg_edges=n_pad * D * D, n_graphs=2, dense_D=D)


class AsymmetricEdgesError(ValueError):
    """Raised when a graph lacks the (i->j)/(j->i) reverse involution
    the dense layout requires; callers treat this as 'use the sparse
    layout for this structure' (expected for radius graphs with bonds
    within a float ulp of the cutoff)."""


def dense_batch_graphs(graphs: List[GraphData], spec: BucketSpec,
                       atom_features: str = "cgcnn",
                       target_width: int = 1,
                       atomwise_width: int = 0,
                       additional_width: int = 0,
                       extra_width: int = 0,
                       dtype=np.float32) -> GraphBatch:
    """Concatenate + pad graphs into a dense-neighborhood GraphBatch.

    Layout contract (load-bearing — the nn/layers.py dense paths and
    this builder must agree):
      - node rows are assigned sequentially per graph (as in the sparse
        builder); rows past the real total are padding (mask 0, graph
        slot -> trash graph);
      - edge row ``j*D + s``: the s-th real in-edge of node row ``j``
        for s below the node's real in-degree (in the dst-sorted order
        of the per-graph build; consumers derive occupancy from
        ``edge_mask``), a trash slot otherwise (mask 0, src -> 0,
        r -> (1,0,0));
      - ``dst[row] = row // D`` for ALL rows (trash slots point at their
        block owner: masks, not routing, isolate them — unlike the
        sparse layout's trash-node convention);
      - ``rev`` pairs each real edge with its reverse row (trash slots
        map to themselves);
      - L-pair (j, t, s) lives at lg row ``j*D^2 + t*D + s`` and means
        (a = j*D+s, b = rev[j*D+t]); ``lg_src/lg_dst`` record (a, b)
        for completeness and ``lg_mask = edge_mask[a] * edge_mask[j*D+t]``.
    """
    D = spec.dense_D
    if D <= 0:
        raise ValueError("spec.dense_D must be > 0 for dense batching")
    n_pad, g_pad = spec.n_nodes, spec.n_graphs
    e_pad, l_pad = n_pad * D, n_pad * D * D
    if spec.n_edges != e_pad or spec.n_lg_edges != l_pad:
        raise ValueError("inconsistent dense spec: n_edges/n_lg_edges "
                         "must equal n_nodes*D / n_nodes*D^2")
    n_tot = sum(g.num_nodes for g in graphs)
    if n_tot > n_pad or len(graphs) >= g_pad:
        raise ValueError(
            f"batch ({n_tot}n/{len(graphs)}g) overflows dense bucket "
            f"({n_pad}/{g_pad})")

    feat_table = attribute_lookup_table(atom_features)
    fdim = FEATURESET_SIZE[atom_features]

    z = np.zeros(n_pad, dtype=np.int32)
    feats = np.zeros((n_pad, fdim), dtype=dtype)
    frac = np.zeros((n_pad, 3), dtype=dtype)
    node_graph = np.full(n_pad, g_pad - 1, dtype=np.int32)
    node_mask = np.zeros(n_pad, dtype=dtype)

    src = np.zeros(e_pad, dtype=np.int32)          # trash slots -> row 0
    dst = (np.arange(e_pad, dtype=np.int64) // D).astype(np.int32)
    r = np.zeros((e_pad, 3), dtype=dtype)
    r[:, 0] = 1.0                                   # pad displacement
    images = np.zeros((e_pad, 3), dtype=dtype)
    edge_graph = np.full(e_pad, g_pad - 1, dtype=np.int32)
    edge_mask = np.zeros(e_pad, dtype=dtype)
    rev = np.arange(e_pad, dtype=np.int32)          # trash slots -> self

    lattice = np.zeros((g_pad, 3, 3), dtype=dtype)
    lattice[:] = np.eye(3, dtype=dtype)
    volume = np.ones(g_pad, dtype=dtype)
    n_nodes = np.zeros(g_pad, dtype=dtype)
    graph_mask = np.zeros(g_pad, dtype=dtype)

    target = np.zeros((g_pad, max(target_width, 1)), dtype=dtype)
    forces = np.zeros((n_pad, 3), dtype=dtype)
    stress = np.zeros((g_pad, 3, 3), dtype=dtype)
    atomwise_t = np.zeros((n_pad, max(atomwise_width, 1)), dtype=dtype)
    additional = np.zeros((g_pad, max(additional_width, 1)), dtype=dtype)
    extra = np.zeros((g_pad, max(extra_width, 1)), dtype=dtype)

    n_off = 0
    for gi, g in enumerate(graphs):
        nn, ne = g.num_nodes, g.num_edges
        ns = slice(n_off, n_off + nn)
        z[ns] = g.z
        feats[ns] = feat_table[g.z]
        frac[ns] = g.frac_coords
        node_graph[ns] = gi
        node_mask[ns] = 1.0
        if ne:
            d = g.dst.astype(np.int64)
            if np.any(np.diff(d) < 0):
                raise ValueError("dense layout requires dst-sorted edges "
                                 "(graph/build.py invariant)")
            deg = np.bincount(d, minlength=nn)
            if int(deg.max()) > D:
                raise ValueError(
                    f"graph in-degree {int(deg.max())} exceeds dense_D={D}")
            # slot within block = position past the first occurrence of
            # this dst value (stable: preserves the build's edge order)
            slot = np.arange(ne, dtype=np.int64) - np.searchsorted(d, d)
            rows = (n_off + d) * D + slot
            src[rows] = g.src + n_off
            r[rows] = g.r
            images[rows] = g.images
            edge_graph[rows] = gi
            edge_mask[rows] = 1.0
            # reverse-edge involution: match (src, dst, image) with
            # (dst, src, -image) via identical sort orders
            img = np.round(g.images).astype(np.int64)
            o1 = np.lexsort((img[:, 2], img[:, 1], img[:, 0], d, g.src))
            o2 = np.lexsort((-img[:, 2], -img[:, 1], -img[:, 0],
                             g.src, d))
            if not (np.array_equal(g.src[o1], d[o2])
                    and np.array_equal(d[o1], g.src[o2])
                    and np.array_equal(img[o1], -img[o2])):
                raise AsymmetricEdgesError(
                    "dense layout requires a symmetric edge set "
                    "(every (i->j, image) must have (j->i, -image))")
            rev_g = np.empty(ne, dtype=np.int64)
            rev_g[o1] = o2
            rev[rows] = rows[rev_g]
        lattice[gi] = g.lattice
        volume[gi] = g.volume
        n_nodes[gi] = nn
        graph_mask[gi] = 1.0
        if g.target is not None:
            tg = np.asarray(g.target, dtype=dtype).reshape(-1)
            if tg.shape[0] != target.shape[1]:
                raise ValueError(
                    f"graph target width {tg.shape[0]} != batch "
                    f"target_width {target.shape[1]}")
            target[gi] = tg
        if g.forces is not None:
            forces[ns] = g.forces
        if g.stress is not None:
            stress[gi] = g.stress
        if g.atomwise_target is not None:
            atomwise_t[ns] = np.asarray(
                g.atomwise_target, dtype=dtype).reshape(nn, -1)
        if g.additional is not None:
            additional[gi] = np.asarray(
                g.additional, dtype=dtype).reshape(-1)[: additional.shape[1]]
        if g.extra_features is not None:
            extra[gi] = np.asarray(
                g.extra_features, dtype=dtype).reshape(-1)[: extra.shape[1]]
        n_off += nn

    # implicit local-pair line graph (module docstring): row
    # j*D^2 + t*D + s <-> L-edge (a = j*D+s, b = rev[j*D+t])
    slot_s = np.tile(np.arange(D, dtype=np.int64), e_pad)
    lg_src = (np.repeat(
        (np.arange(e_pad, dtype=np.int64) // D) * D, D)
        + slot_s).astype(np.int32)
    lg_dst = np.repeat(rev, D).astype(np.int32)
    lg_mask = (edge_mask[lg_src]
               * np.repeat(edge_mask, D)).astype(dtype)

    def perm_pair(idx):
        p = np.argsort(idx, kind="stable").astype(np.int32)
        inv = np.empty_like(p)
        inv[p] = np.arange(p.shape[0], dtype=np.int32)
        return p, inv

    src_perm, src_perm_inv = perm_pair(src)
    lg_src_perm, lg_src_perm_inv = perm_pair(lg_src)

    return GraphBatch(
        dense_D=D, rev=rev,
        z=z, atom_features=feats, frac_coords=frac, node_graph=node_graph,
        node_mask=node_mask, src=src, dst=dst, r=r, images=images,
        edge_graph=edge_graph, edge_mask=edge_mask, lg_src=lg_src,
        lg_dst=lg_dst, lg_mask=lg_mask,
        src_perm=src_perm, src_perm_inv=src_perm_inv,
        lg_src_perm=lg_src_perm, lg_src_perm_inv=lg_src_perm_inv,
        lattice=lattice, volume=volume, n_nodes=n_nodes,
        graph_mask=graph_mask, target=target, forces=forces, stress=stress,
        atomwise_target=atomwise_t, additional=additional,
        extra_features=extra)
