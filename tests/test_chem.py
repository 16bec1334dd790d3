"""Chemistry layer tests: periodic table, featurizers, structure IO."""

import numpy as np
import pytest

from alignn_tpu.chem import (
    Atoms,
    FEATURESET_SIZE,
    attribute_lookup_table,
    get_node_attributes,
)
from alignn_tpu.chem.atoms import Lattice
from alignn_tpu.chem.periodic_table import period_group_block, valence_counts


def test_period_group_block():
    cases = {
        "H": (1, 1, 0), "He": (1, 18, 0), "C": (2, 14, 1), "Na": (3, 1, 0),
        "Fe": (4, 8, 2), "Pd": (5, 10, 2), "La": (6, 3, 3), "Lu": (6, 3, 2),
        "Au": (6, 11, 2), "Rn": (6, 18, 1), "U": (7, 3, 3),
    }
    from alignn_tpu.chem.periodic_table import Z_FROM_SYMBOL
    for sym, expected in cases.items():
        assert period_group_block(Z_FROM_SYMBOL[sym]) == expected, sym


def test_valence_counts():
    assert valence_counts(26) == (2, 0, 6, 0)   # Fe: 4s2 3d6
    assert valence_counts(29) == (1, 0, 10, 0)  # Cu: 4s1 3d10
    assert valence_counts(8) == (2, 4, 0, 0)    # O: 2s2 2p4
    assert valence_counts(64) == (2, 0, 1, 7)   # Gd: 6s2 5d1 4f7


@pytest.mark.parametrize("featset", ["atomic_number", "basic", "cgcnn", "cfid"])
def test_featureset_sizes(featset):
    feats = get_node_attributes("Si", featset)
    assert len(feats) == FEATURESET_SIZE[featset]
    table = attribute_lookup_table(featset)
    assert table.shape == (104, FEATURESET_SIZE[featset])
    np.testing.assert_allclose(table[14], feats, rtol=1e-6)


def test_cgcnn_nine_hot():
    table = attribute_lookup_table("cgcnn")
    # every real element has exactly 9 one-hot groups active
    assert (table[1:].sum(axis=1) == 9).all()


def test_poscar_roundtrip(sample_poscars):
    a = Atoms.from_poscar(sample_poscars[0])
    text = a.to_poscar()
    b = Atoms.from_poscar(text)
    assert sorted(a.elements) == sorted(b.elements)
    np.testing.assert_allclose(a.volume, b.volume, rtol=1e-8)


def test_lattice_math():
    lat = Lattice.from_parameters(3, 4, 5, 90, 90, 120)
    np.testing.assert_allclose(lat.abc, [3, 4, 5], atol=1e-9)
    np.testing.assert_allclose(lat.angles, [90, 90, 120], atol=1e-6)
    frac = np.array([[0.25, 0.5, 0.75]])
    np.testing.assert_allclose(lat.frac_coords(lat.cart_coords(frac)), frac,
                               atol=1e-12)


def test_atoms_dict_roundtrip():
    d = {
        "lattice_mat": [[2.715, 2.715, 0], [0, 2.715, 2.715],
                        [2.715, 0, 2.715]],
        "coords": [[0, 0, 0], [0.25, 0.25, 0.25]],
        "elements": ["Si", "Si"],
        "cartesian": False,
    }
    a = Atoms.from_dict(d)
    assert a.num_atoms == 2
    d2 = a.to_dict()
    b = Atoms.from_dict(d2)
    np.testing.assert_allclose(a.cart_coords, b.cart_coords, atol=1e-12)


def test_supercell():
    d = {
        "lattice_mat": np.eye(3) * 3.0,
        "coords": [[0, 0, 0]],
        "elements": ["Cu"],
    }
    a = Atoms.from_dict(dict(d, cartesian=False))
    s = a.make_supercell([2, 2, 2])
    assert s.num_atoms == 8
    np.testing.assert_allclose(s.volume, 8 * a.volume, rtol=1e-10)


def test_xyz_parse():
    xyz = "3\nwater\nO 0.0 0.0 0.0\nH 0.96 0.0 0.0\nH -0.24 0.93 0.0\n"
    a = Atoms.from_xyz(xyz)
    assert a.elements == ["O", "H", "H"]
    # cartesian geometry preserved
    cc = a.cart_coords
    np.testing.assert_allclose(np.linalg.norm(cc[1] - cc[0]), 0.96, atol=1e-6)


def test_cif_parse():
    cif = """
data_test
_cell_length_a 4.0
_cell_length_b 4.0
_cell_length_c 4.0
_cell_angle_alpha 90.0
_cell_angle_beta 90.0
_cell_angle_gamma 90.0
loop_
_atom_site_label
_atom_site_type_symbol
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
Na1 Na 0.0 0.0 0.0
Cl1 Cl 0.5 0.5 0.5
"""
    a = Atoms.from_cif(cif)
    assert a.elements == ["Na", "Cl"]
    np.testing.assert_allclose(a.volume, 64.0, rtol=1e-8)


def test_table_override_wins(tmp_path, monkeypatch):
    """chem/tables drop-in override replaces the built-in featurization.

    The override is the exact-parity path for jarvis-trained checkpoints
    (see chem/tables/README.md and tools/vendor_atom_tables.py).
    """
    import json

    from alignn_tpu.chem import features

    table = {"Si": [float(i) for i in range(92)], "8": [1.5] * 92}
    (tmp_path / "cgcnn.json").write_text(json.dumps(table))
    monkeypatch.setenv("ALIGNN_TPU_TABLES_DIR", str(tmp_path))
    features._override_table_cached.cache_clear()
    try:
        lut = features.attribute_lookup_table("cgcnn")
        np.testing.assert_allclose(lut[14], np.arange(92, dtype=np.float32))
        np.testing.assert_allclose(lut[8], np.full(92, 1.5))
        # elements absent from the override fall back to zeros (jarvis
        # also zero-fills unknown species)
        assert lut[1].sum() != lut[14].sum()
    finally:
        features._override_table_cached.cache_clear()


def test_vendored_cgcnn_exact():
    """Golden parity vs the vendored jarvis cgcnn table (when present).

    Skipped until tools/vendor_atom_tables.py has been run in an
    environment with jarvis-tools (zero egress here) — then this pins the
    override wiring + a couple of known one-hot invariants of the real
    CGCNN atom_init scheme.
    """
    import json
    import os

    import pytest

    from alignn_tpu.chem import features

    path = os.path.join(features.tables_dir(), "cgcnn.json")
    if not os.path.exists(path):
        pytest.skip("exact cgcnn table not vendored (no egress here)")
    with open(path) as f:
        data = json.load(f)
    lut = features.attribute_lookup_table("cgcnn")
    key = "Si" if "Si" in data else "14"
    np.testing.assert_allclose(lut[14], np.asarray(data[key],
                                                   dtype=np.float32))
    # CGCNN features are one-hot binned: every entry in {0, 1}
    vals = np.unique(np.concatenate([np.asarray(v) for v in data.values()]))
    assert set(vals.tolist()) <= {0.0, 1.0}
