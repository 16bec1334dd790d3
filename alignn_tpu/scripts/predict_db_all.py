#!/usr/bin/env python
"""Zoo-model predictions across ALL figshare databases (form/gap props).

Equivalent of reference `scripts/predict_db_all.py`: iterate the
(dataset -> properties) registry, and for every formation-energy-like or
band-gap-like property run the corresponding pretrained zoo model over
the whole database, writing `{dataset}_{prop}predictions.csv` rows of
`id,target,prediction,difference` plus a printed MAE per pair
(reference predict_db_all.py:26-108).

The reference hard-codes two local checkpoints (JV15/...); here the
models default to the figshare zoo names and can be overridden with
local training output dirs (hermetic / fine-tuned use).
"""

import argparse
import json
import os

# dataset -> (id_tag, [properties]) — mirrors the reference's
# scripts/dataset_props.json registry (data, not code)
DATASET_PROPS = {
    "oqmd_3d_no_cfid": ("id", ["_oqmd_band_gap", "_oqmd_delta_e"]),
    "mp_3d_2020": ("id", ["formation_energy_per_atom", "band_gap"]),
    "megnet": ("id", ["e_form", "gap pbe"]),
    "dft_2d": ("jid", ["formation_energy_peratom", "optb88vdw_bandgap"]),
    "qe_tb": ("jid", ["indir_gap"]),
}

_GAP_MARKERS = ("gap",)
_FORM_MARKERS = ("form", "f_enp", "_oqmd_delta_e")


def _pick_kind(prop: str):
    if "mbj" in prop:
        return None  # reference skips mbj gaps (different physics)
    if any(m in prop for m in _GAP_MARKERS):
        return "gap"
    if any(m in prop for m in _FORM_MARKERS) or prop in _FORM_MARKERS:
        return "form"
    return None


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--gap_model", default="jv_optb88vdw_bandgap_alignn",
                   help="zoo name or local model dir for gap props")
    p.add_argument("--form_model",
                   default="jv_formation_energy_peratom_alignn",
                   help="zoo name or local model dir for formation props")
    p.add_argument("--datasets", default=None,
                   help="comma list; default: all registered")
    p.add_argument("--limit", type=int, default=None,
                   help="cap structures per dataset (smoke runs)")
    p.add_argument("--output_dir", default=".")
    args = p.parse_args(argv)

    import numpy as np

    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.data.figshare import load_dataset
    from alignn_tpu.zoo import (
        get_figshare_model,
        graph_kwargs_from_config,
        load_model_dir,
        predict_structures,
    )

    def _load(name_or_dir):
        if os.path.isdir(name_or_dir):
            return load_model_dir(name_or_dir)
        return get_figshare_model(name_or_dir)

    models = {}
    datasets = (args.datasets.split(",") if args.datasets
                else list(DATASET_PROPS))
    for ds in datasets:
        id_tag, props = DATASET_PROPS[ds]
        # one load per DATASET, not per property — these are
        # multi-hundred-MB json payloads
        try:
            records = load_dataset(ds)
        except Exception as exp:  # noqa: BLE001 — per-db, like ref
            print(ds, "load failed:", exp)
            continue
        for prop in props:
            kind = _pick_kind(prop)
            if kind is None:
                continue
            if kind not in models:
                models[kind] = _load(
                    args.gap_model if kind == "gap" else args.form_model)
            model, variables, cfg = models[kind]

            ids, structs, targets = [], [], []
            for r in records:
                t = r.get(prop, "na")
                if t in ("na", None, ""):
                    continue
                ids.append(r.get(id_tag, r.get("id", len(ids))))
                structs.append(Atoms.from_dict(r["atoms"]))
                targets.append(float(t))
                if args.limit and len(ids) >= args.limit:
                    break
            if not ids:
                print(ds, prop, "no labeled records")
                continue
            # graph featurization MUST match the checkpoint's training
            # config (atom_features width / cutoff / max_neighbors)
            preds = predict_structures(
                model, variables, structs,
                **graph_kwargs_from_config(cfg))[:, 0]
            targets = np.asarray(targets)
            fname = os.path.join(args.output_dir,
                                 f"{ds}_{prop}predictions.csv")
            with open(fname, "w") as f:
                f.write("id,target,prediction,difference\n")
                for i, t, pr in zip(ids, targets, preds):
                    f.write("%s, %6f, %6f, %6f\n" % (i, t, pr,
                                                     abs(t - pr)))
            mae = float(np.abs(targets - preds).mean())
            print(json.dumps({"dataset": ds, "prop": prop,
                              "n": len(ids), "mae": mae,
                              "csv": fname}))


if __name__ == "__main__":
    main()
