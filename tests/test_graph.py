"""Graph construction tests: k-NN semantics, line graph, batching."""

import numpy as np

from alignn_tpu.chem import Atoms
from alignn_tpu.graph import (
    BucketSpec,
    batch_graphs,
    bond_cosines,
    build_graph,
    canonize_edge,
    line_graph_edges,
)

SI = {
    "lattice_mat": [[2.715, 2.715, 0], [0, 2.715, 2.715], [2.715, 0, 2.715]],
    "coords": [[0, 0, 0], [0.25, 0.25, 0.25]],
    "elements": ["Si", "Si"],
    "cartesian": False,
}


def test_canonize_edge():
    s, d, si, di = canonize_edge(3, 1, (0, 0, 0), (1, 0, -1))
    assert (s, d) == (1, 3)
    assert si == (0, 0, 0)
    assert di == (-1, 0, 1)


def test_knn_graph_si():
    a = Atoms.from_dict(SI)
    g = build_graph(a, cutoff=8.0, max_neighbors=12)
    # diamond Si: 4 bonds at 2.35 A; 12-NN with tie inclusion gives each
    # site >= 12 in+out edges, graph undirected
    assert g.num_nodes == 2
    deg_in = np.bincount(g.dst, minlength=2)
    deg_out = np.bincount(g.src, minlength=2)
    assert (deg_in >= 12).all()
    np.testing.assert_array_equal(deg_in, deg_out)
    # undirected: for every (u, v, r) there is (v, u, -r)
    key = {}
    for u, v, r in zip(g.src, g.dst, np.round(g.r, 6)):
        key.setdefault((u, v), []).append(tuple(r))
    for (u, v), rs in key.items():
        back = key[(v, u)]
        for r in rs:
            assert tuple(-np.array(r)) in back
    # nearest-neighbor distance is the Si bond length
    dists = np.linalg.norm(g.r, axis=1)
    np.testing.assert_allclose(dists.min(), 2.3512, atol=1e-3)


def test_knn_cutoff_extension():
    # large lattice: initial small cutoff finds < 12 neighbors, must extend
    a = Atoms.from_dict({
        "lattice_mat": np.eye(3) * 20.0,
        "coords": np.random.RandomState(0).rand(6, 3).tolist(),
        "elements": ["Cu"] * 6,
        "cartesian": False,
    })
    g = build_graph(a, cutoff=3.0, max_neighbors=12)
    deg = np.bincount(g.dst, minlength=6)
    assert (deg >= 12).all()


def test_line_graph_counts():
    src = np.array([0, 1, 1, 2], dtype=np.int32)
    dst = np.array([1, 0, 2, 1], dtype=np.int32)
    lg_src, lg_dst = line_graph_edges(src, dst, 3)
    # L-edge (e1,e2) iff dst[e1]==src[e2] (incl. backtracking)
    expected = set()
    for e1 in range(4):
        for e2 in range(4):
            if dst[e1] == src[e2]:
                expected.add((e1, e2))
    got = set(zip(lg_src.tolist(), lg_dst.tolist()))
    assert got == expected
    # count identity: sum_b indeg(b) * outdeg(b)
    indeg = np.bincount(dst, minlength=3)
    outdeg = np.bincount(src, minlength=3)
    assert len(lg_src) == (indeg * outdeg).sum()


def test_bond_cosines_known_angle():
    # edges: 0->1 along +x, 1->2 along +y  => angle at node 1 is 90 deg
    r = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    lg_src = np.array([0])
    lg_dst = np.array([1])
    cos = bond_cosines(r, lg_src, lg_dst)
    np.testing.assert_allclose(cos, [0.0], atol=1e-12)
    # backtracking pair: 0->1 (+x), 1->0 (-x): cosine +1
    r2 = np.array([[1.0, 0, 0], [-1.0, 0, 0]])
    cos2 = bond_cosines(r2, np.array([0]), np.array([1]))
    np.testing.assert_allclose(cos2, [1.0], atol=1e-12)


def test_radius_graph_strategies(sample_poscars):
    a = Atoms.from_poscar(sample_poscars[0])
    for strategy in ("k-nearest", "radius_graph", "radius_graph_jarvis"):
        g = build_graph(a, neighbor_strategy=strategy, cutoff=5.0)
        assert g.num_nodes == a.num_atoms
        assert g.num_edges > 0
        assert g.num_lg_edges > 0
        # every atom connected
        present = np.zeros(a.num_atoms, bool)
        present[g.src] = True
        present[g.dst] = True
        assert present.all()


def test_batching_offsets(sample_poscars):
    graphs = [build_graph(Atoms.from_poscar(f)) for f in sample_poscars[:3]]
    spec = BucketSpec.tight_for_batch(graphs)
    b = batch_graphs(graphs, spec)
    # masks count the real entities
    assert b.node_mask.sum() == sum(g.num_nodes for g in graphs)
    assert b.edge_mask.sum() == sum(g.num_edges for g in graphs)
    assert b.lg_mask.sum() == sum(g.num_lg_edges for g in graphs)
    # per-graph slices reproduce the originals
    n_off = e_off = 0
    for gi, g in enumerate(graphs):
        np.testing.assert_array_equal(
            b.src[e_off:e_off + g.num_edges] - n_off, g.src)
        np.testing.assert_allclose(
            b.r[e_off:e_off + g.num_edges], g.r, rtol=1e-6)
        assert (b.node_graph[n_off:n_off + g.num_nodes] == gi).all()
        n_off += g.num_nodes
        e_off += g.num_edges
    # pad edges point at the trash node, pad nodes at the trash graph
    pad_edges = b.edge_mask == 0
    assert (b.src[pad_edges] == b.num_nodes_padded - 1).all()
    assert (b.node_graph[b.node_mask == 0] == b.num_graphs_padded - 1).all()
    # pad r is unit-norm (no NaN hazard)
    np.testing.assert_allclose(
        np.linalg.norm(b.r[pad_edges], axis=1), 1.0, atol=1e-7)


def test_bucketspec_overflow_raises():
    a = Atoms.from_dict(SI)
    g = build_graph(a)
    spec = BucketSpec(n_nodes=2, n_edges=8, n_lg_edges=8, n_graphs=2)
    try:
        batch_graphs([g], spec)
        assert False, "expected overflow"
    except ValueError:
        pass


def test_r_reconstruction_invariant_all_strategies():
    """r == cart[dst] + images @ lattice - cart[src] for EVERY edge.

    Every path that recomputes bond vectors from positions
    (compute_cartesian_r: eALIGNN, include_pos_deriv, on-device MD/relax,
    skin-list reuse) relies on this; the k-nearest reverse edges
    originally stored the un-negated image and broke it silently.
    """
    import numpy as np

    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.graph.build import build_graph

    rng = np.random.default_rng(3)
    atoms = Atoms(lattice_mat=np.array([[4.0, 0.1, 0.0],
                                        [-0.2, 3.8, 0.3],
                                        [0.1, 0.2, 5.1]]),
                  frac_coords=rng.random((4, 3)),
                  elements=["Na", "Cl", "Na", "Cl"])
    for strat in ("k-nearest", "radius_graph"):
        g = build_graph(atoms, neighbor_strategy=strat, cutoff=6.0,
                        max_neighbors=12)
        cart = atoms.cart_coords
        recon = cart[g.dst] + g.images @ atoms.lattice_mat - cart[g.src]
        np.testing.assert_allclose(recon, g.r, atol=1e-10,
                                   err_msg=strat)


def test_radius_graph_jarvis_excludes_self_image():
    """jarvis sphere-query semantics (reference graphs.py:45,85-125):
    self-image i->i bonds are filtered by index; radius_graph keeps them."""
    from alignn_tpu.graph.build import radius_graph, radius_graph_jarvis

    # 1-atom cell: ALL radius edges are self-image bonds
    a = Atoms(lattice_mat=np.eye(3) * 3.0, frac_coords=[[0, 0, 0]],
              elements=["Cu"])
    u, v, r, im = radius_graph(a, cutoff=4.0)
    assert (u == v).all() and u.size > 0  # self-image pairs present
    # jarvis variant: no self-bonds by construction -> must keep
    # extending and finally fail on a single-atom cell
    import pytest as _pytest
    with _pytest.raises(ValueError):
        radius_graph_jarvis(a, cutoff=4.0, max_attempts=3)

    # 2-atom cell: jarvis graph covers both atoms, excludes i==i rows
    b = Atoms(lattice_mat=np.eye(3) * 3.5,
              frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
              elements=["Na", "Cl"])
    u2, v2, r2, im2 = radius_graph_jarvis(b, cutoff=4.0)
    assert (u2 != v2).all() and u2.size > 0
    u3, v3, _r3, _im3 = radius_graph(b, cutoff=4.0)
    assert (u3 == v3).sum() > 0  # plain radius graph keeps self-image


def test_build_graph_wraps_unwrapped_coords():
    """The image-range search derives its window from the fractional
    bounding box; coordinates drifted far outside [0,1) (long unwrapped
    MD) silently LOST edges before the build-time wrap."""
    import numpy as np

    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.graph.build import build_graph

    base = Atoms(lattice_mat=np.eye(3) * 4.1,
                 frac_coords=[[0.1, 0.1, 0.1], [0.6, 0.6, 0.6]],
                 elements=["Na", "Cl"])
    drifted = Atoms(lattice_mat=np.eye(3) * 4.1,
                    frac_coords=np.asarray(base.frac_coords) + 5.0,
                    elements=["Na", "Cl"])
    g1 = build_graph(base, cutoff=5.0, max_neighbors=12)
    g2 = build_graph(drifted, cutoff=5.0, max_neighbors=12)
    assert g2.num_edges == g1.num_edges > 0
    np.testing.assert_allclose(
        np.sort(np.linalg.norm(g1.r, axis=1)),
        np.sort(np.linalg.norm(g2.r, axis=1)), atol=1e-8)
