"""Training configuration.

Framework-owned equivalent of the reference's pydantic `TrainingConfig`
(`alignn/config.py:125-216`) and its base-settings behavior
(`alignn/utils.py:13-21`): plain dataclasses with strict unknown-key
rejection, JSON round-trip, and environment-variable overrides under the
``ALIGNN_TPU_`` prefix (the reference uses ``jv_``).

The model sub-config is a tagged union discriminated by ``name`` like the
reference (`alignn/config.py:212-216`).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Union

from alignn_tpu.nn.models import ALIGNNAtomWiseConfig, ALIGNNConfig

try:  # version stamp parity with reference config.py:14-20
    import subprocess

    VERSION = (
        subprocess.check_output(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            stderr=subprocess.DEVNULL,
        )
        .decode()
        .strip()
    )
except Exception:  # pragma: no cover
    VERSION = "unknown"


DATASETS = (
    "dft_3d", "jdft_3d-8-18-2021", "dft_2d", "megnet", "megnet2",
    "mp_3d_2020", "qm9", "qm9_dgl", "qm9_std_jctc", "user_data",
    "oqmd_3d_no_cfid", "edos_up", "edos_pdos", "qmof", "qe_tb", "hmof",
    "hpov", "pdbbind", "pdbbind_core", "tinnet_OH", "tinnet_O", "tinnet_N",
)

from alignn_tpu.chem.features import FEATURESET_SIZE  # noqa: E402  (canonical table)


# Known target names (factual registry extracted from the reference's
# TARGET_ENUM, `alignn/config.py:26-122` — data, not code; used for a
# soft validation warning in TrainingConfig.__post_init__).
TARGET_ENUM = frozenset([
    "formation_energy_peratom", "optb88vdw_bandgap", "bulk_modulus_kv",
    "shear_modulus_gv", "mbj_bandgap", "slme", "magmom_oszicar",
    "spillage", "kpoint_length_unit", "encut", "optb88vdw_total_energy",
    "epsx", "epsy", "epsz", "mepsx", "mepsy", "mepsz", "max_ir_mode",
    "min_ir_mode", "n-Seebeck", "p-Seebeck", "n-powerfact", "p-powerfact",
    "ncond", "pcond", "nkappa", "pkappa", "ehull", "exfoliation_energy",
    "dfpt_piezo_max_dielectric", "dfpt_piezo_max_eij",
    "dfpt_piezo_max_dij", "gap pbe", "e_form", "e_hull",
    "energy_per_atom", "formation_energy_per_atom", "band_gap",
    "e_above_hull", "mu_b", "bulk modulus", "shear modulus",
    "elastic anisotropy", "U0", "HOMO", "LUMO", "R2", "ZPVE", "omega1",
    "mu", "alpha", "homo", "lumo", "gap", "r2", "zpve", "U", "H", "G",
    "Cv", "A", "B", "C", "all", "target", "max_efg", "avg_elec_mass",
    "avg_hole_mass", "_oqmd_band_gap", "_oqmd_delta_e",
    "_oqmd_stability", "edos_up", "pdos_elast", "bandgap",
    "energy_total", "net_magmom", "b3lyp_homo", "b3lyp_lumo",
    "b3lyp_gap", "b3lyp_scharber_pce", "b3lyp_scharber_voc",
    "b3lyp_scharber_jsc", "log_kd_ki", "max_co2_adsp", "min_co2_adsp",
    "lcd", "pld", "void_fraction", "surface_area_m2g",
    "surface_area_m2cm3", "indir_gap", "f_enp", "final_energy", "ead",
])


def _strict_from_dict(cls, d: Dict[str, Any]):
    known = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - known - {"version"}
    if unknown:
        raise ValueError(
            f"unknown {cls.__name__} keys: {sorted(unknown)}")
    return {k: v for k, v in d.items() if k in known}


MODEL_CONFIGS = {
    "alignn": ALIGNNConfig,
    "alignn_atomwise": ALIGNNAtomWiseConfig,
}


def model_config_from_dict(d: Dict[str, Any]):
    """Tagged-union dispatch on d['name'] (reference config.py:212-216)."""
    name = d.get("name", "alignn_atomwise")
    if name == "ealignn_atomwise":
        from alignn_tpu.nn.ealignn import eALIGNNAtomWiseConfig

        return eALIGNNAtomWiseConfig.from_dict(d)
    if name not in MODEL_CONFIGS:
        raise ValueError(f"unknown model name: {name}")
    return MODEL_CONFIGS[name].from_dict(d)


@dataclass
class TrainingConfig:
    """Full training run description (reference config.py:125-216)."""

    version: str = VERSION
    # dataset configuration
    dataset: str = "dft_3d"
    target: str = "formation_energy_peratom"
    atom_features: str = "cgcnn"
    neighbor_strategy: str = "k-nearest"
    id_tag: str = "jid"
    # training configuration
    dtype: str = "float32"
    random_seed: Optional[int] = 123
    classification_threshold: Optional[float] = None
    n_val: Optional[int] = None
    n_test: Optional[int] = None
    n_train: Optional[int] = None
    train_ratio: Optional[float] = 0.8
    val_ratio: Optional[float] = 0.1
    test_ratio: Optional[float] = 0.1
    target_multiplication_factor: Optional[float] = None
    epochs: int = 300
    batch_size: int = 64
    weight_decay: float = 0.0
    learning_rate: float = 1e-2
    filename: str = "sample"
    warmup_steps: int = 2000
    criterion: str = "mse"  # mse | l1 | poisson | zig
    optimizer: str = "adamw"  # adamw | sgd
    # onecycle = reference parity (per-epoch stepping over an
    # epochs*steps_per_epoch horizon, see train/optim.py) |
    # onecycle_full = traverse the whole cycle over `epochs` | none
    scheduler: str = "onecycle"
    pin_memory: bool = False
    save_dataloader: bool = False
    write_checkpoint: bool = True
    write_predictions: bool = True
    store_outputs: bool = True
    progress: bool = True
    log_tensorboard: bool = False
    standard_scalar_and_pca: bool = False
    use_canonize: bool = True
    compute_line_graph: bool = True
    num_workers: int = 4
    cutoff: float = 8.0
    cutoff_extra: float = 3.0
    max_neighbors: int = 12
    keep_data_order: bool = True
    normalize_graph_level_loss: bool = False
    distributed: bool = False
    data_parallel: bool = False
    n_early_stopping: Optional[int] = None
    output_dir: str = field(default_factory=lambda: os.path.abspath("."))
    use_cache: bool = True  # reference `use_lmdb` (config.py:203)
    # TPU-native extensions (no reference equivalent)
    bucket_slack: float = 1.0      # padding head-room over worst-case batch
    donate_batch: bool = True      # jit buffer donation for the train step
    mesh_shape: Optional[Dict[str, int]] = None  # e.g. {"data": 8}
    # dense-neighborhood execution layout (graph/dense.py): pads each
    # node's in-edge list to the dataset max degree; aggregations become
    # axis reductions and the L(g) index arrays are implicit.  k-NN
    # graphs only (near-uniform degree).
    dense_neighborhoods: bool = False
    # Per-species reference-energy baseline (TPU-framework extension;
    # VERDICT r4 #2): least-squares elemental offsets are fit on the
    # TRAIN split's per-atom graph targets, subtracted from every
    # split's targets before training, saved to
    # <output_dir>/species_baseline.json, and added back at predict
    # time (zoo.load_model_dir / ff Calculator).  Meant for multi-
    # element total-energy datasets (e.g. the combined mlearn `all`
    # set) where inter-element offsets span many eV/atom and a
    # mean-predictor energy head would otherwise dominate the loss.
    # Assumes the graph-level target is an energy PER ATOM (the
    # bundled mlearn convention, reference prepare_mlearn.py
    # `j / atoms.num_atoms`).
    per_species_energy_baseline: bool = False
    # Pruned line graph (TPU-framework extension; graph/build.py
    # lg_cutoff docstring): build L(g) only over bond pairs whose two
    # bonds are both <= lg_cutoff (Angstrom).  The full edge set still
    # feeds the bond stages + force assembly.  Perf lever for
    # radius-graph training where L ~ E * degree dominates; analogue of
    # eALIGNN inner_cutoff (reference ealignn_atomwise.py:306-322).
    lg_cutoff: Optional[float] = None
    # model configuration
    model: Union[ALIGNNConfig, ALIGNNAtomWiseConfig, Any] = field(
        default_factory=lambda: ALIGNNAtomWiseConfig(name="alignn_atomwise"))

    def __post_init__(self):
        if isinstance(self.model, dict):
            self.model = model_config_from_dict(self.model)
        # env overrides, parity with pydantic BaseSettings PRIORITY:
        # explicitly-provided values (init args / config.json keys) WIN
        # over the environment — env only fills fields still at their
        # dataclass default (reference alignn/utils.py:13-21 semantics;
        # a stale shell var must not trample the user's config file)
        defaults = {f.name: (f.default if f.default
                             is not dataclasses.MISSING else None)
                    for f in dataclasses.fields(self)}
        for f in dataclasses.fields(self):
            env = os.environ.get(f"ALIGNN_TPU_{f.name.upper()}")
            if env is None or f.name == "model":
                continue
            cur = getattr(self, f.name)
            if f.default is not dataclasses.MISSING and \
                    cur != defaults[f.name]:
                continue  # explicitly set by the caller — env loses
            setattr(self, f.name, _coerce_env(env))
        if self.atom_features not in FEATURESET_SIZE:
            raise ValueError(f"unknown atom_features: {self.atom_features}")
        # target-name validation (reference TARGET_ENUM, config.py:26-122):
        # a warning, not an error — folder training uses free-form keys
        if self.target not in TARGET_ENUM and self.dataset != "user_data":
            import warnings

            warnings.warn(
                f"target '{self.target}' is not in the reference's known "
                f"target list (dataset {self.dataset!r}); proceeding",
                stacklevel=2)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainingConfig":
        return cls(**_strict_from_dict(cls, d))

    @classmethod
    def from_json(cls, path: str) -> "TrainingConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["version"] = VERSION
        return d

    def dump(self, path: str):
        """Validated-config dump parity (reference train.py:80-83)."""
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=str)


def _coerce_env(env: str):
    """Parse an env-var override: JSON first, then Python-style literal
    booleans/None ('False' would otherwise bind as a TRUTHY string on a
    bool field), else the raw string."""
    try:
        return json.loads(env)
    except json.JSONDecodeError:
        low = env.strip().lower()
        if low in ("true", "false"):
            return low == "true"
        if low in ("none", "null"):
            return None
        return env
