"""Legacy config-file training CLI (reference `alignn/cli.py` parity).

The reference's typer CLI trains straight from a TrainingConfig json
(dataset pulled by name), with `--profile` running a one-shot profiling
pass instead of training, and copies checkpoints from a scratch
`--checkpoint_dir` into the config's directory afterwards.  Note the
reference module is STALE against its own trainer (it passes
`progress=/checkpoint_dir=/store_outputs=/log_tensorboard=` kwargs that
`train_dgl` no longer accepts, cli.py:49-55) — this is the working
equivalent of its intended surface:

    python -m alignn_tpu.cli.legacy [config.json] [--progress]
        [--checkpoint_dir DIR] [--profile] [--tensorboard]

Artifacts mirror cli.py:58-70: `metrics.json` (the training summary;
the reference torch.saves it as metrics.pt), `fullconfig.json` (the
fully-resolved config), checkpoints copied into the config directory.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys


def _loaders(config):
    """Dataset-by-name loaders (the figshare glue of train_props)."""
    from alignn_tpu.data.figshare import load_dataset
    from alignn_tpu.data.loader import get_train_val_loaders

    records = load_dataset(config.dataset)
    for r in records:
        r["target"] = r.get(config.target)
    return get_train_val_loaders(
        records, target="target", id_tag=config.id_tag,
        atom_features=config.atom_features,
        neighbor_strategy=config.neighbor_strategy,
        cutoff=config.cutoff, max_neighbors=config.max_neighbors,
        batch_size=config.batch_size, n_train=config.n_train,
        n_val=config.n_val, n_test=config.n_test,
        train_ratio=config.train_ratio, val_ratio=config.val_ratio,
        test_ratio=config.test_ratio,
        keep_data_order=config.keep_data_order,
        output_dir=config.output_dir, num_workers=config.num_workers,
        progress=config.progress)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("config", nargs="?", default=None,
                   help="TrainingConfig json (default: a small built-in "
                        "smoke config, reference cli.py:38)")
    p.add_argument("--progress", action="store_true")
    p.add_argument("--checkpoint_dir", default="/tmp/models")
    p.add_argument("--store_outputs", action="store_true")
    p.add_argument("--tensorboard", action="store_true",
                   help="accepted for surface parity; traces go through "
                        "--profile (jax.profiler) instead")
    p.add_argument("--profile", action="store_true",
                   help="run one profiling pass instead of training "
                        "(reference profile_dgl route, cli.py:46-48)")
    args = p.parse_args(argv)

    # After argparse: --help/bad-args exit before any JAX work, and the
    # cache decision itself never initializes a backend (ADVICE r3).
    from alignn_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from alignn_tpu.config import TrainingConfig

    if args.config is None:
        model_dir = os.getcwd()
        config = TrainingConfig(epochs=10, n_train=32, n_val=32,
                                batch_size=16)
    else:
        model_dir = os.path.dirname(os.path.abspath(args.config))
        with open(args.config) as f:
            config = TrainingConfig(**json.load(f))
    if args.tensorboard:
        print("tensorboard logging is not supported; use --profile "
              "(jax.profiler traces open in tensorboard)",
              file=sys.stderr)

    config.progress = args.progress or config.progress
    # flag-over-config like the reference cli.py kwargs; the trainer's
    # store_outputs path dumps train/val prediction jsons
    config.store_outputs = args.store_outputs or config.store_outputs
    # train into the scratch dir, then copy back (cli.py:67-70)
    config.output_dir = args.checkpoint_dir
    os.makedirs(args.checkpoint_dir, exist_ok=True)

    train_loader, val_loader, test_loader, _mad = _loaders(config)

    if args.profile:
        from alignn_tpu.profiler import profile_step
        from alignn_tpu.train.optim import build_optimizer
        from alignn_tpu.train.state import (
            create_train_state,
            make_train_step,
        )
        from alignn_tpu.train.trainer import build_model

        model = build_model(config.model)
        batch = next(iter(train_loader))
        tx = build_optimizer(config.optimizer, config.learning_rate,
                             config.weight_decay)
        state = create_train_state(model, batch, tx)
        step = make_train_step(model, criterion=config.criterion,
                               donate=False)
        out = profile_step(step, state, batch,
                           logdir=os.path.join(model_dir, "jax_trace"))
        print(json.dumps(out))
        return out

    from alignn_tpu.train.trainer import train_model

    hist = train_model(config, train_loader, val_loader, test_loader)
    with open(os.path.join(model_dir, "metrics.json"), "w") as f:
        json.dump(hist, f, default=str)
    with open(os.path.join(model_dir, "fullconfig.json"), "w") as f:
        json.dump(config.to_dict(), f, indent=2)
    for ckpt in (glob.glob(os.path.join(args.checkpoint_dir, "*.mpk"))
                 if os.path.abspath(args.checkpoint_dir)
                 != os.path.abspath(model_dir) else []):
        shutil.copy(ckpt, os.path.join(model_dir,
                                       os.path.basename(ckpt)))
    return hist


if __name__ == "__main__":
    main()
