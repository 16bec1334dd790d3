#!/usr/bin/env python
"""Energy-volume curves + EOS fits for a set of structures.

Equivalent of reference `scripts/ev_curve.py` / `ev_curve_comp.py`.
"""

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("files", nargs="+", help="structure files")
    p.add_argument("--dx", default=None,
                   help="comma-separated strain grid (default +-6%)")
    p.add_argument("--output", default="ev_curves.json")
    args = p.parse_args(argv)

    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.ff.calculator import Calculator
    from alignn_tpu.ff.tasks import ev_curve

    calc = Calculator(path=args.model_path)
    kw = {}
    if args.dx:
        kw["dx"] = [float(x) for x in args.dx.split(",")]
    out = {}
    for f in args.files:
        atoms = Atoms.from_file(f)
        res = ev_curve(calc, atoms, **kw)
        import numpy as _np

        out[f] = {k: (_np.asarray(v).tolist()
                      if isinstance(v, _np.ndarray) else v)
                  for k, v in res.items() if k != "fcdata"}
        eos = res.get("eos", {})
        print(f, "V0", eos.get("V0"), "B(GPa)", eos.get("B_GPa"))
    with open(args.output, "w") as fo:
        json.dump(out, fo)


if __name__ == "__main__":
    main()
