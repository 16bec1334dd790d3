#!/usr/bin/env python
"""Bulk prediction over a dataset with a trained model.

Equivalent of reference `scripts/predict_db.py` / `predict_db_all.py`:
load records (figshare dataset name or a local json of records), run the
trained checkpoint over every structure, dump id -> prediction json.
"""

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True,
                   help="training output dir (config.json + best_model.mpk)")
    p.add_argument("--dataset", default=None,
                   help="figshare dataset name (data/figshare.py)")
    p.add_argument("--records_json", default=None,
                   help="local json list of records instead of --dataset")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--output", default="predictions_db.json")
    args = p.parse_args(argv)

    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.zoo import load_model_dir, predict_structures

    if args.records_json:
        with open(args.records_json) as f:
            records = json.load(f)
    elif args.dataset:
        from alignn_tpu.data.figshare import load_dataset

        records = load_dataset(args.dataset)
    else:
        raise SystemExit("need --dataset or --records_json")
    if args.limit:
        records = records[: args.limit]

    model, variables, _cfg = load_model_dir(args.model_dir)
    atoms_list = [Atoms.from_dict(rec["atoms"]) for rec in records]
    preds = predict_structures(model, variables, atoms_list)
    out = {rec.get("jid", str(i)): preds[i].tolist()
           for i, rec in enumerate(records)}
    with open(args.output, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.output} ({len(out)} predictions)")


if __name__ == "__main__":
    main()
