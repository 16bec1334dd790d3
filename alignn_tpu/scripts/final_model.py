#!/usr/bin/env python
"""Train a deployment model on (almost) all data.

Equivalent of reference `scripts/final_model.py`: after model selection,
retrain with ~all records as train (tiny val for early stopping, no
test holdout).
"""

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--records_json", required=True)
    p.add_argument("--config", default=None,
                   help="TrainingConfig json overrides")
    p.add_argument("--output_dir", default="final_model")
    p.add_argument("--val_frac", type=float, default=0.02)
    args = p.parse_args(argv)

    from alignn_tpu.config import TrainingConfig
    from alignn_tpu.data.loader import get_train_val_loaders
    from alignn_tpu.train.trainer import train_model

    with open(args.records_json) as f:
        records = json.load(f)
    overrides = {}
    if args.config:
        with open(args.config) as f:
            overrides = json.load(f)
    n = len(records)
    n_val = max(int(n * args.val_frac), 1)
    n_train = n - n_val - 1
    overrides.update(dict(n_train=n_train, n_val=n_val, n_test=1,
                          output_dir=args.output_dir))
    cfg = TrainingConfig(**overrides)
    tr, va, te, _ = get_train_val_loaders(
        records, batch_size=cfg.batch_size, n_train=n_train, n_val=n_val,
        n_test=1, keep_data_order=cfg.keep_data_order,
        neighbor_strategy=cfg.neighbor_strategy, cutoff=cfg.cutoff,
        max_neighbors=cfg.max_neighbors, output_dir=args.output_dir)
    summary = train_model(cfg, tr, va, te)
    print(json.dumps(summary, default=str))


if __name__ == "__main__":
    main()
