"""Native C++ components: neighbor-search parity + record store."""

import numpy as np
import pytest

from alignn_tpu.chem.atoms import Atoms


def _numpy_pairs(atoms, cutoff, atol=1e-5):
    """The pure-numpy reference path (build._tiled_pairs fallback)."""
    from alignn_tpu.graph import build as B

    nmin, nmax = B._image_ranges(atoms, cutoff, 0.5)
    ranges = [np.arange(nmin[k], nmax[k]) for k in range(3)]
    cell_images = np.stack(
        np.meshgrid(*ranges, indexing="ij"), axis=-1).reshape(-1, 3)
    cart = atoms.cart_coords
    n = cart.shape[0]
    shifts = cell_images.astype(np.float64) @ atoms.lattice_mat
    disp = (cart[None, None, :, :] + shifts[None, :, None, :]
            - cart[:, None, None, :])
    dist = np.linalg.norm(disp, axis=-1)
    mask = (dist <= cutoff) & (dist > atol)
    ii, mm, jj = np.nonzero(mask)
    return ii, jj, cell_images[mm], dist[ii, mm, jj]


@pytest.fixture(scope="module")
def structures():
    rng = np.random.default_rng(0)
    tric = Atoms(lattice_mat=np.array([[4.0, 0.1, 0.0],
                                       [-0.2, 3.8, 0.3],
                                       [0.1, 0.2, 5.1]]),
                 frac_coords=rng.random((5, 3)),
                 elements=["Si"] * 5)
    cubic = Atoms(lattice_mat=np.eye(3) * 4.05,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    return [cubic, tric]


def test_native_builds():
    from alignn_tpu.native import neighbors_lib

    lib = neighbors_lib()
    assert lib is not None, "g++ toolchain expected in this image"


def test_native_pair_parity(structures):
    from alignn_tpu.native import periodic_pairs_native

    for atoms in structures:
        for cutoff in (4.0, 7.0):
            out = periodic_pairs_native(atoms.lattice_mat,
                                        atoms.frac_coords, cutoff)
            assert out is not None
            u, v, images, disp, dist = out
            u2, v2, images2, dist2 = _numpy_pairs(atoms, cutoff)
            assert len(u) == len(u2), (len(u), len(u2))

            def key(us, vs, ims):
                return set(zip(us.tolist(), vs.tolist(),
                               map(tuple, np.asarray(ims, dtype=np.int64)
                                   .tolist())))

            assert key(u, v, images) == key(u2, v2, images2)
            # displacement consistency: |disp| == dist
            np.testing.assert_allclose(
                np.linalg.norm(disp, axis=1), dist, rtol=1e-10)


def test_build_graph_uses_native(structures):
    # end-to-end: graphs built through the native path match k-NN
    # semantics (12 neighbors minimum, symmetric edge list)
    from alignn_tpu.graph.build import build_graph

    g = build_graph(structures[0], cutoff=8.0, max_neighbors=12)
    assert g.num_edges >= 12 * structures[0].num_atoms
    # undirected: every (u,v) has a (v,u)
    pairs = set(zip(g.src.tolist(), g.dst.tolist()))
    assert all((v, u) in pairs for (u, v) in pairs)


def test_record_store_roundtrip(tmp_path):
    from alignn_tpu.data.cache import GraphCache, pack_graph, unpack_graph
    from alignn_tpu.graph.build import build_graph

    a = Atoms(lattice_mat=np.eye(3) * 4,
              frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
              elements=["Na", "Cl"])
    g = build_graph(a, cutoff=6.0)
    g.target = np.array([1.5])
    g.forces = np.random.rand(2, 3)
    g2 = unpack_graph(pack_graph(g))
    np.testing.assert_allclose(g.r, g2.r)
    np.testing.assert_allclose(g.forces, g2.forces)
    assert g.volume == g2.volume

    path = str(tmp_path / "cache")
    GraphCache.write(path, [g, g, g])
    c = GraphCache(path)
    assert len(c) == 3
    np.testing.assert_array_equal(c[2].lg_src, g.lg_src)
    c.close()
    assert GraphCache.exists(path)
