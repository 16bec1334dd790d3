"""Prediction CLI (reference `alignn/pretrained.py` CLI, :451-476).

Predict a property for one structure (or a folder of structures) with a
zoo model name or a local trained model directory.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

from alignn_tpu.chem.atoms import Atoms


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="ALIGNN-TPU prediction")
    p.add_argument("--model_name",
                   default="jv_formation_energy_peratom_alignn",
                   help="zoo model name (downloaded + converted) — see "
                        "--list_models")
    p.add_argument("--model_path", default=None,
                   help="local model directory (overrides --model_name)")
    p.add_argument("--file_path", default="POSCAR")
    p.add_argument("--file_format", default="poscar",
                   choices=["poscar", "cif", "xyz", "pdb"])
    p.add_argument("--cutoff", default=8.0, type=float)
    p.add_argument("--max_neighbors", default=12, type=int)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--list_models", action="store_true")
    return p


def _load(path: str, fmt: str) -> Atoms:
    loaders = {"poscar": Atoms.from_poscar, "cif": Atoms.from_cif,
               "xyz": Atoms.from_xyz, "pdb": Atoms.from_pdb}
    return loaders[fmt](path)


def main(argv=None):
    args = build_parser().parse_args(argv)
    # After argparse: --help/bad-args exit before any JAX work, and the
    # cache decision itself never initializes a backend (ADVICE r3).
    from alignn_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from alignn_tpu.zoo import (
        get_all_models,
        get_figshare_model,
        load_model_dir,
        predict_structures,
    )

    if args.list_models:
        for name, meta in sorted(get_all_models().items()):
            print(name, meta["output_features"])
        return

    if args.model_path:
        model, variables, _cfg = load_model_dir(args.model_path)
    else:
        model, variables, _cfg = get_figshare_model(args.model_name)

    if os.path.isdir(args.file_path):
        files = sorted(glob.glob(os.path.join(args.file_path, "*")))
    else:
        files = [args.file_path]
    atoms_list = [_load(f, args.file_format) for f in files]
    out = predict_structures(model, variables, atoms_list,
                             cutoff=args.cutoff,
                             max_neighbors=args.max_neighbors,
                             batch_size=args.batch_size)
    for f, o in zip(files, out):
        print(json.dumps({"file": f, "prediction": o.tolist()}))


if __name__ == "__main__":
    main(sys.argv[1:])
