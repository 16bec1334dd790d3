"""Padded, statically-shaped batched graph container.

TPU-native replacement for DGL's C++ batched graph object
(`dgl.batch`/`dgl.unbatch`, used by the reference at
`alignn/lmdb_dataset.py:88-108` and `alignn/train.py:264`):

- A batch of crystal graphs is a single pytree of flat arrays with
  *padded static shapes*: nodes [N], edges [E], line-graph edges [L],
  graphs [G].  XLA compiles the training step once per shape signature,
  so pad sizes are bucketed (see :class:`BucketSpec`).
- Every axis reserves at least one trailing *trash slot*.  Padded edges
  point src/dst at the trash node, padded nodes belong to the trash graph
  slot, padded L-edges point at the trash edge.  Garbage therefore flows
  only into masked slots and the hot loops need no mask multiplies;
  masks are applied only at loss/readout boundaries.
- Padded edge displacement r is set to (1, 0, 0) so norms are never zero
  and no NaNs enter the autodiff graph (critical for grad-of-grad force
  training).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
from flax import struct

from alignn_tpu.chem.features import FEATURESET_SIZE, attribute_lookup_table
from alignn_tpu.graph.build import GraphData


@struct.dataclass
class GraphBatch:
    """A padded batch of crystal graphs + line graphs (pytree of arrays)."""

    # nodes [N]
    z: np.ndarray               # int32 atomic numbers (0 = pad)
    atom_features: np.ndarray   # [N, F] float32
    frac_coords: np.ndarray     # [N, 3] float32
    node_graph: np.ndarray      # [N] int32 graph slot (pad -> G-1)
    node_mask: np.ndarray       # [N] float32 {0,1}
    # edges [E]
    src: np.ndarray             # [E] int32 (pad -> N-1)
    dst: np.ndarray             # [E] int32 (pad -> N-1)
    r: np.ndarray               # [E, 3] float32 displacement src->dst
    images: np.ndarray          # [E, 3] float32
    edge_graph: np.ndarray      # [E] int32 (pad -> G-1)
    edge_mask: np.ndarray       # [E] float32
    # line-graph edges [L]
    lg_src: np.ndarray          # [L] int32 edge ids (pad -> E-1)
    lg_dst: np.ndarray          # [L] int32 edge ids (pad -> E-1)
    lg_mask: np.ndarray         # [L] float32
    # reverse-edge involution [E]: rev[e] is the row of (dst, src,
    # -image); r[rev] == -r exactly (k-NN graphs are symmetric by
    # canonization).  The dense L-stage rides it (graph/dense.py);
    # identity (arange) in sparse batches where it is unused.  Being an
    # involution, permute-by-rev is its own transpose — no scatters.
    rev: np.ndarray             # [E] int32
    # sort permutations for scatter-transposes (round 2): edges are
    # dst-sorted, so gathers by dst transpose to sorted segment sums for
    # free; gathers by src / lg_src need these precomputed stable-argsort
    # permutations so their transposes also run as sorted (Pallas MXU)
    # scatters instead of XLA serialized scatter-adds
    src_perm: np.ndarray        # [E] int32, argsort(src)
    src_perm_inv: np.ndarray    # [E] int32, inverse of src_perm
    lg_src_perm: np.ndarray     # [L] int32, argsort(lg_src)
    lg_src_perm_inv: np.ndarray  # [L] int32
    # graphs [G]
    lattice: np.ndarray         # [G, 3, 3] float32
    volume: np.ndarray          # [G] float32
    n_nodes: np.ndarray         # [G] float32 (real atom counts)
    graph_mask: np.ndarray      # [G] float32
    # targets (always present; zero-filled when unused)
    target: np.ndarray          # [G, T] float32 graph-level target
    forces: np.ndarray          # [N, 3] float32
    stress: np.ndarray          # [G, 3, 3] float32
    atomwise_target: np.ndarray  # [N, A] float32
    additional: np.ndarray      # [G, Fadd] float32
    extra_features: np.ndarray  # [G, Fx] float32
    # static windowed-gather spans (ops/pallas_gather): max per-supertile
    # span of real indices, 256-quantized; 0 = fall back to XLA gather.
    # Static (non-pytree) so the train step compiles per window set —
    # quantization + the loader's monotone floor bound the churn.
    win_src: int = struct.field(pytree_node=False, default=0)
    win_dst: int = struct.field(pytree_node=False, default=0)
    win_src_sorted: int = struct.field(pytree_node=False, default=0)
    win_lg_src: int = struct.field(pytree_node=False, default=0)
    win_lg_dst: int = struct.field(pytree_node=False, default=0)
    win_lg_src_sorted: int = struct.field(pytree_node=False, default=0)
    # dense-neighborhood layout (graph/dense.py): D > 0 means edges are
    # grouped in fixed-D blocks by dst node (dst == row // D, lg_dst ==
    # row // D, lg_src == src[b]*D + slot), so dst/lg_dst aggregations
    # are axis reductions and lg_src gathers are D-wide block gathers.
    # Static: the model compiles a different (gather/scatter-free)
    # program for dense batches.
    dense_D: int = struct.field(pytree_node=False, default=0)

    @property
    def static_windows(self) -> tuple:
        """All win_* static fields as a hashable jit-cache key part."""
        return (self.win_src, self.win_dst, self.win_src_sorted,
                self.win_lg_src, self.win_lg_dst, self.win_lg_src_sorted)

    @property
    def num_nodes_padded(self) -> int:
        return int(self.z.shape[0])

    @property
    def num_edges_padded(self) -> int:
        return int(self.src.shape[0])

    @property
    def num_lg_edges_padded(self) -> int:
        return int(self.lg_src.shape[0])

    @property
    def num_graphs_padded(self) -> int:
        return int(self.graph_mask.shape[0])


def _round_up(x: int, quantum: int) -> int:
    return ((x + quantum - 1) // quantum) * quantum


@struct.dataclass
class BucketSpec:
    """Static pad sizes (nodes, edges, lg-edges, graphs) for a batch."""

    n_nodes: int = struct.field(pytree_node=False, default=0)
    n_edges: int = struct.field(pytree_node=False, default=0)
    n_lg_edges: int = struct.field(pytree_node=False, default=0)
    n_graphs: int = struct.field(pytree_node=False, default=0)
    # dense-neighborhood block degree (graph/dense.py); 0 = sparse
    # layout.  When > 0, n_edges == n_nodes * dense_D and
    # n_lg_edges == n_edges * dense_D.
    dense_D: int = struct.field(pytree_node=False, default=0)

    @staticmethod
    def for_graphs(graphs: Sequence[GraphData], batch_size: int,
                   node_quantum: int = 128, edge_quantum: int = 128,
                   lg_quantum: int = 512, slack: float = 1.0) -> "BucketSpec":
        """One static bucket covering every batch of `batch_size` graphs.

        Uses the max per-graph counts over the dataset (x batch_size x
        slack), rounded up to hardware-friendly quanta; +1 everywhere for
        the trash slots.  One shape -> one XLA compile for the whole run.
        """
        max_n = max(g.num_nodes for g in graphs)
        max_e = max(g.num_edges for g in graphs)
        max_l = max(g.num_lg_edges for g in graphs)
        # sum of per-graph counts in the worst batch is bounded by the
        # batch-size largest graphs; the max-graph bound is cheap and safe.
        return BucketSpec(
            n_nodes=_round_up(int(max_n * batch_size * slack) + 1, node_quantum),
            n_edges=_round_up(int(max_e * batch_size * slack) + 1, edge_quantum),
            n_lg_edges=_round_up(int(max_l * batch_size * slack) + 1, lg_quantum),
            n_graphs=batch_size + 1,
        )

    @staticmethod
    def tight_for_batch(graphs: Sequence[GraphData],
                        node_quantum: int = 128, edge_quantum: int = 128,
                        lg_quantum: int = 512) -> "BucketSpec":
        """Bucket sized for exactly this batch (bounded recompiles)."""
        return BucketSpec(
            n_nodes=_round_up(sum(g.num_nodes for g in graphs) + 1,
                              node_quantum),
            n_edges=_round_up(sum(g.num_edges for g in graphs) + 1,
                              edge_quantum),
            n_lg_edges=_round_up(sum(g.num_lg_edges for g in graphs) + 1,
                                 lg_quantum),
            n_graphs=len(graphs) + 1,
        )


def batch_graphs(graphs: List[GraphData], spec: BucketSpec,
                 atom_features: str = "cgcnn",
                 target_width: int = 1,
                 atomwise_width: int = 0,
                 additional_width: int = 0,
                 extra_width: int = 0,
                 dtype=np.float32,
                 gather_windows: bool = True) -> GraphBatch:
    """Concatenate + pad graphs into one :class:`GraphBatch`.

    The per-graph node/edge offsets play the role of dgl.batch's index
    relabeling (reference lmdb_dataset.py:88-108).

    `gather_windows=False` skips the static win_* computation (all 0 ->
    XLA gather).  Geometry-evolving single-graph consumers (Calculator,
    md_jit, relax_jit) use it: their index spans flap step to step, and
    every distinct window set is a fresh XLA compile.
    """
    n_pad, e_pad = spec.n_nodes, spec.n_edges
    l_pad, g_pad = spec.n_lg_edges, spec.n_graphs
    n_tot = sum(g.num_nodes for g in graphs)
    e_tot = sum(g.num_edges for g in graphs)
    l_tot = sum(g.num_lg_edges for g in graphs)
    if n_tot >= n_pad or e_tot >= e_pad or l_tot >= l_pad or \
            len(graphs) >= g_pad:
        raise ValueError(
            f"batch ({n_tot}n/{e_tot}e/{l_tot}l/{len(graphs)}g) overflows "
            f"bucket ({n_pad}/{e_pad}/{l_pad}/{g_pad})")

    feat_table = attribute_lookup_table(atom_features)
    fdim = FEATURESET_SIZE[atom_features]

    z = np.zeros(n_pad, dtype=np.int32)
    feats = np.zeros((n_pad, fdim), dtype=dtype)
    frac = np.zeros((n_pad, 3), dtype=dtype)
    node_graph = np.full(n_pad, g_pad - 1, dtype=np.int32)
    node_mask = np.zeros(n_pad, dtype=dtype)

    src = np.full(e_pad, n_pad - 1, dtype=np.int32)
    dst = np.full(e_pad, n_pad - 1, dtype=np.int32)
    r = np.zeros((e_pad, 3), dtype=dtype)
    r[:, 0] = 1.0  # pad displacement: unit x, nonzero norm
    images = np.zeros((e_pad, 3), dtype=dtype)
    edge_graph = np.full(e_pad, g_pad - 1, dtype=np.int32)
    edge_mask = np.zeros(e_pad, dtype=dtype)

    lg_src = np.full(l_pad, e_pad - 1, dtype=np.int32)
    lg_dst = np.full(l_pad, e_pad - 1, dtype=np.int32)
    lg_mask = np.zeros(l_pad, dtype=dtype)

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

    n_off = e_off = l_off = 0
    for gi, g in enumerate(graphs):
        nn, ne, nl = g.num_nodes, g.num_edges, g.num_lg_edges
        ns = slice(n_off, n_off + nn)
        es = slice(e_off, e_off + ne)
        ls = slice(l_off, l_off + nl)
        z[ns] = g.z
        feats[ns] = feat_table[g.z]
        frac[ns] = g.frac_coords
        node_graph[ns] = gi
        node_mask[ns] = 1.0
        src[es] = g.src + n_off
        dst[es] = g.dst + n_off
        r[es] = g.r
        images[es] = g.images
        edge_graph[es] = gi
        edge_mask[es] = 1.0
        if nl:
            lg_src[ls] = g.lg_src + e_off
            lg_dst[ls] = g.lg_dst + e_off
            lg_mask[ls] = 1.0
        lattice[gi] = g.lattice
        volume[gi] = g.volume
        n_nodes[gi] = nn
        graph_mask[gi] = 1.0
        if g.target is not None:
            tg = np.asarray(g.target, dtype=dtype).reshape(-1)
            if tg.shape[0] != target.shape[1]:
                # NumPy would silently broadcast a scalar across a
                # multi-output row (training on [t, t, t]) or truncate a
                # wider target — both are label corruption
                raise ValueError(
                    f"graph target width {tg.shape[0]} != batch "
                    f"target_width {target.shape[1]} (set target_width/"
                    f"model.output_features to the dataset's width)")
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
        e_off += ne
        l_off += nl

    def perm_pair(idx):
        p = np.argsort(idx, kind="stable").astype(np.int32)
        inv = np.empty_like(p)
        inv[p] = np.arange(p.shape[0], dtype=np.int32)
        return p, inv

    src_perm, src_perm_inv = perm_pair(src)
    lg_src_perm, lg_src_perm_inv = perm_pair(lg_src)

    # static gather-window metadata (see GraphBatch docstring / field
    # comment); numpy-only, a few linear passes over the index arrays
    if gather_windows:
        from alignn_tpu.ops.pallas_gather import window_for

        windows = dict(
            win_src=window_for(src, n_pad - 1),
            win_dst=window_for(dst, n_pad - 1),
            win_src_sorted=window_for(src[src_perm], n_pad - 1),
            win_lg_src=window_for(lg_src, e_pad - 1),
            win_lg_dst=window_for(lg_dst, e_pad - 1),
            win_lg_src_sorted=window_for(lg_src[lg_src_perm], e_pad - 1),
        )
    else:
        windows = {}

    return GraphBatch(
        **windows,
        z=z, atom_features=feats, frac_coords=frac, node_graph=node_graph,
        node_mask=node_mask, src=src, dst=dst, r=r, images=images,
        edge_graph=edge_graph, edge_mask=edge_mask, lg_src=lg_src,
        lg_dst=lg_dst, lg_mask=lg_mask,
        rev=np.arange(e_pad, dtype=np.int32),
        src_perm=src_perm, src_perm_inv=src_perm_inv,
        lg_src_perm=lg_src_perm, lg_src_perm_inv=lg_src_perm_inv,
        lattice=lattice, volume=volume,
        n_nodes=n_nodes, graph_mask=graph_mask, target=target, forces=forces,
        stress=stress, atomwise_target=atomwise_t, additional=additional,
        extra_features=extra,
    )
