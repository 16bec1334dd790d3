#!/usr/bin/env python
"""Vendor jarvis-tools' exact per-element feature tables into chem/tables/.

The reference featurizes atoms with `jarvis.core.specie.get_node_attributes`
(`/root/reference/alignn/graphs.py:533,1003-1020`).  This image has no
network egress and no jarvis-tools wheel, so alignn_tpu ships a
reconstruction (chem/features.py) plus a drop-in override directory.  Run
this script in ANY environment that has jarvis-tools installed:

    python tools/vendor_atom_tables.py [--out alignn_tpu/chem/tables]

It dumps {"<symbol>": [floats]} JSON for each feature set ("cgcnn" 92-d,
"basic" 11-d, "cfid" 438-d).  Once the files are present (or pointed to
via ALIGNN_TPU_TABLES_DIR), attribute_lookup_table() uses them verbatim,
giving byte-exact input parity for converted reference checkpoints; the
golden test tests/test_chem.py::test_table_override_wins then also runs
its exact-parity branch.
"""

import argparse
import json
import os
import sys

FEATURE_SETS = {"cgcnn": 92, "basic": 11, "cfid": 438}

# jarvis's chemical symbol list (Z = 1..103); element_coords in jarvis
SYMBOLS = [
    "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne", "Na", "Mg",
    "Al", "Si", "P", "S", "Cl", "Ar", "K", "Ca", "Sc", "Ti", "V", "Cr",
    "Mn", "Fe", "Co", "Ni", "Cu", "Zn", "Ga", "Ge", "As", "Se", "Br",
    "Kr", "Rb", "Sr", "Y", "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd",
    "Ag", "Cd", "In", "Sn", "Sb", "Te", "I", "Xe", "Cs", "Ba", "La",
    "Ce", "Pr", "Nd", "Pm", "Sm", "Eu", "Gd", "Tb", "Dy", "Ho", "Er",
    "Tm", "Yb", "Lu", "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt", "Au",
    "Hg", "Tl", "Pb", "Bi", "Po", "At", "Rn", "Fr", "Ra", "Ac", "Th",
    "Pa", "U", "Np", "Pu", "Am", "Cm", "Bk", "Cf", "Es", "Fm", "Md",
    "No", "Lr",
]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             os.pardir, "alignn_tpu", "chem", "tables"))
    args = parser.parse_args()

    try:
        from jarvis.core.specie import get_node_attributes
    except ImportError:
        print("jarvis-tools is not installed in this environment.\n"
              "Run this script where `pip install jarvis-tools` works, "
              "then copy the JSON files into alignn_tpu/chem/tables/ "
              "(or set ALIGNN_TPU_TABLES_DIR).", file=sys.stderr)
        return 1

    os.makedirs(args.out, exist_ok=True)
    for name, width in FEATURE_SETS.items():
        table = {}
        for sym in SYMBOLS:
            try:
                vec = get_node_attributes(sym, atom_features=name)
            except Exception:
                continue
            if vec is None:
                continue
            vec = [float(v) for v in vec]
            if len(vec) != width:
                print(f"warning: {name}/{sym} width {len(vec)} != {width}",
                      file=sys.stderr)
            table[sym] = vec
        path = os.path.join(args.out, f"{name}.json")
        with open(path, "w") as f:
            json.dump(table, f)
        print(f"wrote {path} ({len(table)} elements)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
