"""Folder-based training CLI.

Equivalent of reference `alignn/train_alignn.py` (argparse :47-143,
`train_for_folder` :146-430).  Instead of NCCL process spawning
(train_alignn.py:432-457), multi-device execution uses a JAX mesh in a
single process: pass ``--devices N`` (or let it default to all local
devices) and the data-parallel `shard_map` step handles gradient psum
over ICI.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional

from alignn_tpu.config import TrainingConfig
from alignn_tpu.data.dataset import load_folder_records
from alignn_tpu.data.loader import get_train_val_loaders
from alignn_tpu.train.trainer import train_model


def train_for_folder(
    root_dir: str = "examples/sample_data",
    config_name: str = "config.json",
    classification_threshold: Optional[float] = None,
    batch_size: Optional[int] = None,
    epochs: Optional[int] = None,
    id_key: str = "jid",
    target_key: str = "total_energy",
    atomwise_key: str = "forces",
    gradwise_key: str = "forces",
    stresswise_key: str = "stresses",
    additional_output_key: str = "additional_output",
    file_format: str = "poscar",
    restart_model_path: Optional[str] = None,
    resume: Optional[str] = None,
    output_dir: Optional[str] = None,
    devices: int = 1,
    profile: Optional[str] = None,
):
    """Train from a folder of structures + id_prop targets."""
    if not os.path.exists(config_name):
        raise FileNotFoundError(
            f"config file not found: {config_name} "
            "(pass --config_name pointing at a TrainingConfig json)")
    config = TrainingConfig.from_json(config_name)
    if classification_threshold is not None:
        config.classification_threshold = float(classification_threshold)
    if output_dir is not None:
        config.output_dir = output_dir
    if batch_size is not None:
        config.batch_size = int(batch_size)
    if epochs is not None:
        config.epochs = int(epochs)

    m = config.model
    train_grad = getattr(m, "calculate_gradient", False) and \
        getattr(m, "gradwise_weight", 0) != 0
    train_stress = getattr(m, "calculate_gradient", False) and \
        getattr(m, "stresswise_weight", 0) != 0
    train_atom = getattr(m, "atomwise_weight", 0) != 0
    train_additional = getattr(m, "additional_output_features", 0) > 0 and \
        getattr(m, "additional_output_weight", 0) != 0

    records = load_folder_records(
        root_dir, target_key=target_key, id_key=id_key,
        atomwise_key=atomwise_key, gradwise_key=gradwise_key,
        stresswise_key=stresswise_key,
        additional_output_key=additional_output_key,
        file_format=file_format, train_atom=train_atom,
        train_grad=train_grad, train_stress=train_stress,
        train_additional_output=train_additional)
    print("len dataset", len(records))

    # multi-output csv target detection (reference train_alignn.py:324-334)
    t0 = records[0]["target"]
    if isinstance(t0, list):
        import dataclasses

        widths = {len(r["target"]) for r in records}
        if len(widths) != 1:
            raise ValueError("Make sure the outputs are of same size.")
        config.model = dataclasses.replace(
            config.model, output_features=len(t0))
    target_width = getattr(config.model, "output_features", 1)
    atomwise_width = getattr(m, "atomwise_output_features", 0)
    additional_width = getattr(m, "additional_output_features", 0)
    extra_width = getattr(m, "extra_features", 0)

    tr, va, te, _mad = get_train_val_loaders(
        records,
        id_tag=id_key,
        atom_features=config.atom_features,
        neighbor_strategy=config.neighbor_strategy,
        cutoff=config.cutoff,
        cutoff_extra=config.cutoff_extra,
        max_neighbors=config.max_neighbors,
        use_canonize=config.use_canonize,
        compute_line_graph=config.compute_line_graph,
        batch_size=config.batch_size,
        split_seed=config.random_seed or 123,
        train_ratio=config.train_ratio,
        val_ratio=config.val_ratio,
        test_ratio=config.test_ratio,
        n_train=config.n_train,
        n_val=config.n_val,
        n_test=config.n_test,
        keep_data_order=config.keep_data_order,
        classification_threshold=config.classification_threshold,
        target_multiplication_factor=config.target_multiplication_factor,
        standard_scalar_and_pca=config.standard_scalar_and_pca,
        output_dir=config.output_dir,
        num_workers=config.num_workers,
        num_shards=(max(devices //
                        int((config.mesh_shape or {}).get("graph", 1)),
                        1) if devices > 1 else 1),
        target_width=target_width,
        atomwise_width=atomwise_width,
        additional_width=additional_width,
        extra_width=extra_width,
        bucket_slack=config.bucket_slack,
        progress=config.progress,
        dense=config.dense_neighborhoods,
        cache_dir=(os.path.join(config.output_dir, "graph_cache")
                   if config.use_cache else None),
        per_species_energy_baseline=config.per_species_energy_baseline,
        lg_cutoff=config.lg_cutoff,
    )
    if profile:
        # wrap one train step in a jax.profiler trace
        # (reference profiler.py schedule, via cli.py --profile)
        from alignn_tpu.profiler import profile_step
        from alignn_tpu.train.optim import build_optimizer
        from alignn_tpu.train.state import create_train_state, \
            make_train_step
        from alignn_tpu.train.trainer import build_model

        import jax

        model = build_model(config.model)
        batch = next(iter(tr))
        if tr.num_shards > 1:
            # the sharded loader yields [D, ...]-stacked arrays; profile
            # the single-device step on shard 0 (trainer.py does the
            # same unstack for init)
            batch = jax.tree.map(lambda x: x[0], batch)
        tx = build_optimizer(config.optimizer, config.learning_rate,
                             config.weight_decay)
        state = create_train_state(model, batch, tx)
        step = make_train_step(
            model, criterion=config.criterion, donate=False,
            classification=bool(config.classification_threshold
                                is not None))
        edges = (tr.spec.n_edges + tr.spec.n_lg_edges) if tr.spec else None
        result = profile_step(step, state, batch, logdir=profile,
                              edges_per_batch=edges)
        print(result)
        return result
    # full-state resume (weights + optimizer + epoch + history): the
    # reference can only weights-restart manually
    # (train_alignn.py:336-352); `resume="auto"` picks up the epoch-
    # granular restart.mpk the trainer writes, so a killed run continues
    # with an identical trajectory (tests/test_train.py kill-resume pin)
    restart_state_path = None
    if resume:
        restart_state_path = (os.path.join(config.output_dir,
                                           "restart.mpk")
                              if resume == "auto" else resume)
        if not os.path.exists(restart_state_path):
            print(f"[resume] no checkpoint at {restart_state_path}; "
                  f"starting fresh")
            restart_state_path = None
    if devices > 1:
        from alignn_tpu.parallel.dp import train_model_dp

        return train_model_dp(config, tr, va, te, n_devices=devices,
                              restart_params_path=restart_model_path,
                              restart_state_path=restart_state_path)
    return train_model(config, tr, va, te,
                       restart_params_path=restart_model_path,
                       restart_state_path=restart_state_path)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native ALIGNN training (folder mode)")
    p.add_argument("--root_dir", default="./",
                   help="folder with id_prop.csv/json and structure files")
    p.add_argument("--config_name", default="config.json")
    p.add_argument("--file_format", default="poscar",
                   choices=["poscar", "cif", "xyz", "pdb"])
    p.add_argument("--classification_threshold", default=None, type=float)
    p.add_argument("--batch_size", default=None, type=int)
    p.add_argument("--epochs", default=None, type=int)
    p.add_argument("--id_key", default="jid")
    p.add_argument("--target_key", default="total_energy")
    p.add_argument("--atomwise_key", default="forces")
    p.add_argument("--force_key", default="forces", dest="gradwise_key")
    p.add_argument("--stresswise_key", default="stresses")
    p.add_argument("--additional_output_key", default="additional_output")
    p.add_argument("--output_dir", default=None)
    p.add_argument("--restart_model_path", default=None)
    p.add_argument("--resume", default=None,
                   help='full-state resume: "auto" = '
                        "<output_dir>/restart.mpk, or an explicit path; "
                        "continues epoch/optimizer/LR state exactly "
                        "(vs --restart_model_path, weights only)")
    p.add_argument("--devices", default=1, type=int,
                   help="data-parallel device count (mesh axis size)")
    p.add_argument("--profile", default=None,
                   help="profile one train step into this trace dir "
                        "instead of training (reference cli.py --profile)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # After argparse: --help/bad-args exit before any JAX work, and the
    # cache decision itself never initializes a backend (ADVICE r3).
    from alignn_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    train_for_folder(
        root_dir=args.root_dir,
        config_name=args.config_name,
        classification_threshold=args.classification_threshold,
        batch_size=args.batch_size,
        epochs=args.epochs,
        id_key=args.id_key,
        target_key=args.target_key,
        atomwise_key=args.atomwise_key,
        gradwise_key=args.gradwise_key,
        stresswise_key=args.stresswise_key,
        additional_output_key=args.additional_output_key,
        file_format=args.file_format,
        restart_model_path=args.restart_model_path,
        resume=args.resume,
        output_dir=args.output_dir,
        devices=args.devices,
        profile=args.profile,
    )


if __name__ == "__main__":
    main(sys.argv[1:])
