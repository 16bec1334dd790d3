"""Pruned line graph (graph/build.py lg_cutoff; VERDICT r4 #3a)."""

import numpy as np
import pytest

from alignn_tpu.chem.atoms import Atoms
from alignn_tpu.graph.build import build_graph


def _al_cell(seed=0, sc=(2, 2, 2)):
    rng = np.random.default_rng(seed)
    fcc = np.array([[0, 0, 0], [0.5, 0.5, 0],
                    [0.5, 0, 0.5], [0, 0.5, 0.5]])
    base = Atoms(lattice_mat=np.eye(3) * 4.05, frac_coords=fcc,
                 elements=["Al"] * 4).make_supercell(sc)
    frac = base.frac_coords + 0.02 * rng.standard_normal(
        base.frac_coords.shape)
    return Atoms(lattice_mat=base.lattice_mat, frac_coords=frac,
                 elements=base.elements)


def test_prune_semantics_and_invariants():
    atoms = _al_cell()
    g0 = build_graph(atoms, neighbor_strategy="radius_graph", cutoff=5.0)
    g = build_graph(atoms, neighbor_strategy="radius_graph", cutoff=5.0,
                    lg_cutoff=3.5)
    # edges untouched, L shrinks
    assert g.num_edges == g0.num_edges
    assert 0 < g.num_lg_edges < g0.num_lg_edges
    # every kept pair has BOTH bonds short; every dropped pair has a
    # long bond
    blen = np.linalg.norm(g.r, axis=1)
    assert (blen[g.lg_src] <= 3.5 + 1e-12).all()
    assert (blen[g.lg_dst] <= 3.5 + 1e-12).all()
    kept = set(zip(g.lg_src.tolist(), g.lg_dst.tolist()))
    short = blen <= 3.5
    for e1, e2 in zip(g0.lg_src.tolist(), g0.lg_dst.tolist()):
        if short[e1] and short[e2]:
            assert (e1, e2) in kept
    # dst-sort invariant for the sorted segment sums
    assert (np.diff(g.lg_dst) >= 0).all()


def test_noop_when_cutoff_covers_all_bonds():
    atoms = _al_cell()
    g0 = build_graph(atoms, neighbor_strategy="radius_graph", cutoff=5.0)
    g = build_graph(atoms, neighbor_strategy="radius_graph", cutoff=5.0,
                    lg_cutoff=5.0)
    np.testing.assert_array_equal(g.lg_src, g0.lg_src)
    np.testing.assert_array_equal(g.lg_dst, g0.lg_dst)


def test_forward_runs_on_pruned_batch():
    import jax

    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.nn.models import (
        ALIGNNAtomWise,
        ALIGNNAtomWiseConfig,
        atomwise_forward,
    )

    atoms = _al_cell()
    g = build_graph(atoms, neighbor_strategy="radius_graph", cutoff=5.0,
                    lg_cutoff=3.5)
    g.target = np.array([0.1])
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=32, embedding_features=16,
        gradwise_weight=1.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    variables = jax.jit(
        lambda r, b: model.init(r, b, b.r, train=False))(
        jax.random.PRNGKey(0), batch)
    res = atomwise_forward(model, variables, batch, train=False)
    assert np.isfinite(np.asarray(res["out"])).all()
    assert np.isfinite(np.asarray(res["grad"])).all()


def test_calculator_skin_path_matches_rebuild():
    """The Verlet skin-reuse path must produce the same pruned L(g) as
    a fresh build (ff/calculator._prune_lg)."""
    import jax

    from alignn_tpu.ff.calculator import Calculator
    from alignn_tpu.nn.models import (
        ALIGNNAtomWise,
        ALIGNNAtomWiseConfig,
    )

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=32, embedding_features=16,
        gradwise_weight=1.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    atoms = _al_cell(sc=(1, 1, 1))
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph as bg

    probe = bg(atoms, neighbor_strategy="radius_graph", cutoff=5.0)
    batch = batch_graphs([probe], BucketSpec.tight_for_batch([probe]))
    variables = jax.jit(
        lambda r, b: model.init(r, b, b.r, train=False))(
        jax.random.PRNGKey(0), batch)
    calc = Calculator(model=model, variables=variables,
                      config={"neighbor_strategy": "radius_graph",
                              "cutoff": 5.0, "lg_cutoff": 3.5},
                      skin=0.5)
    g1 = calc._graph_for(atoms)       # fresh build, seeds the skin list
    moved = Atoms(lattice_mat=atoms.lattice_mat,
                  frac_coords=atoms.frac_coords + 0.001,
                  elements=atoms.elements)
    g2 = calc._graph_for(moved)       # skin-reuse path
    ref = bg(moved, neighbor_strategy="radius_graph", cutoff=5.0,
             lg_cutoff=3.5)
    assert g2.num_lg_edges == ref.num_lg_edges
    blen1 = np.linalg.norm(g1.r, axis=1)
    assert (blen1[g1.lg_src] <= 3.5 + 1e-12).all()
    blen2 = np.linalg.norm(g2.r, axis=1)
    assert (blen2[g2.lg_src] <= 3.5 + 1e-12).all()
    assert (blen2[g2.lg_dst] <= 3.5 + 1e-12).all()


def test_wrap_frac_boundary_idempotent():
    """-eps % 1.0 == 1.0 in f64 — still outside [0,1).  Two code paths
    each applying one `% 1.0` then disagree by a full lattice vector
    (skin-reuse vs build_graph wrap; corrupted a round of FD force
    constants).  wrap_frac must land strictly in [0,1) and be
    idempotent."""
    from alignn_tpu.graph.build import wrap_frac

    f = np.array([[-2.7e-17, 0.5, 1.0 - 1e-18],
                  [1.0, -1.0e-17, 2.3]])
    w = wrap_frac(f)
    assert (w >= 0.0).all() and (w < 1.0).all(), w
    np.testing.assert_array_equal(wrap_frac(w), w)
    # the raw modulo really does produce the out-of-range 1.0 (the bug)
    assert ((-2.7e-17) % 1.0) == 1.0


def test_skin_reuse_forces_match_fresh_at_cell_corner():
    """FD-phonon pattern: an atom at frac 0 displaced NEGATIVE wraps to
    the far corner; the cached candidate images must stay commensurate
    with the recomputed positions (the wrap_frac fix)."""
    import jax

    from alignn_tpu.ff.calculator import Calculator
    from alignn_tpu.nn.models import (
        ALIGNNAtomWise,
        ALIGNNAtomWiseConfig,
    )
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=32, embedding_features=16,
        gradwise_weight=1.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    atoms = _al_cell(sc=(2, 2, 2))
    # put atom 0 exactly at the origin so cart->frac inversions create
    # the -eps coordinates
    fr = atoms.frac_coords.copy()
    fr[0] = 0.0
    base = Atoms(lattice_mat=atoms.lattice_mat, frac_coords=fr,
                 elements=atoms.elements)
    probe = build_graph(base, neighbor_strategy="radius_graph",
                        cutoff=5.0)
    b = batch_graphs([probe], BucketSpec.tight_for_batch([probe]))
    variables = jax.jit(
        lambda r, bb: model.init(r, bb, bb.r, train=False))(
        jax.random.PRNGKey(0), b)
    common = dict(model=model, variables=variables,
                  config={"neighbor_strategy": "radius_graph",
                          "cutoff": 5.0})
    calc_fresh = Calculator(skin=0.0, **common)
    calc_skin = Calculator(skin=0.5, **common)
    _ = calc_skin.get_forces(base)  # seed the candidate list
    cart = base.cart_coords.copy()
    cart[0, 0] -= 0.02              # crosses the cell boundary
    moved = base.with_positions(cart_coords=cart)
    f_fresh = calc_fresh.get_forces(moved)
    f_skin = calc_skin.get_forces(moved)
    np.testing.assert_allclose(f_skin, f_fresh, atol=1e-5)
