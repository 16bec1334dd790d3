"""Public dataset fetch: figshare-hosted JARVIS dataset registry.

Equivalent of the reference's dependency on `jarvis.db.figshare.data`
(invoked at `alignn/data.py:205` to materialize the 23 dataset names in
`alignn/config.py:131-154`).  Each dataset is a zipped/plain JSON list of
records (`jid`, `atoms`, per-target keys) hosted on figshare; this module
downloads, caches, and parses that format natively.

URLs follow jarvis-tools' `ndownloader` scheme.  Entries whose file id is
unknown here can be supplied at call time (`url=`) or dropped into the
cache directory manually as `<name>.json`.
"""

from __future__ import annotations

import json
import os
import zipfile
from typing import Any, Dict, List, Optional

# dataset -> figshare ndownloader url (jarvis-tools scheme).  File ids
# mirror jarvis_db figshare records; unknown entries are None and must be
# provided by the user (url= or pre-placed cache file).
DATASET_URLS: Dict[str, Optional[str]] = {
    "dft_3d": "https://ndownloader.figshare.com/files/29204826",
    "jdft_3d-8-18-2021": "https://ndownloader.figshare.com/files/29204826",
    "dft_2d": "https://ndownloader.figshare.com/files/26808917",
    "megnet": "https://ndownloader.figshare.com/files/26724977",
    "megnet2": None,
    "mp_3d_2020": "https://ndownloader.figshare.com/files/26724921",
    "qm9": None,
    "qm9_dgl": "https://ndownloader.figshare.com/files/28541196",
    "qm9_std_jctc": "https://ndownloader.figshare.com/files/28715319",
    "oqmd_3d_no_cfid": "https://ndownloader.figshare.com/files/26790182",
    "edos_up": None,
    "edos_pdos": None,
    "qmof": None,
    "qe_tb": None,
    "hmof": None,
    "hpov": None,
    "pdbbind": None,
    "pdbbind_core": None,
    "tinnet_OH": None,
    "tinnet_O": None,
    "tinnet_N": None,
    "user_data": None,
}

_CACHE = os.environ.get(
    "ALIGNN_TPU_DATA_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "alignn_tpu", "data"))


def _url_overrides() -> Dict[str, str]:
    """Exact jarvis figshare URL table, when vendored.

    The build environment has zero egress, so the `None` entries above
    cannot be verified here; running tools/vendor_figshare_urls.py in a
    jarvis-equipped environment writes `figshare_urls.json` next to this
    module (or point ALIGNN_TPU_FIGSHARE_URLS at it) and every dataset
    name resolves to jarvis's own URL.
    """
    path = os.environ.get(
        "ALIGNN_TPU_FIGSHARE_URLS",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "figshare_urls.json"))
    if os.path.exists(path):
        try:
            with open(path) as f:
                return {k: v for k, v in json.load(f).items() if v}
        except Exception:
            return {}
    return {}


def resolve_url(name: str) -> Optional[str]:
    return _url_overrides().get(name) or DATASET_URLS.get(name)


def dataset_cache_path(name: str) -> str:
    return os.path.join(_CACHE, f"{name}.json")


def load_dataset(name: str, url: Optional[str] = None,
                 cache_dir: Optional[str] = None) -> List[Dict[str, Any]]:
    """Records for dataset `name` (download-once, cache as json)."""
    cache_dir = cache_dir or _CACHE
    path = os.path.join(cache_dir, f"{name}.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    url = url or resolve_url(name)
    if url is None:
        raise ValueError(
            f"no known figshare url for dataset '{name}'; pass url= or "
            f"place the records at {path}")
    os.makedirs(cache_dir, exist_ok=True)
    import urllib.request

    tmp = path + ".download"
    urllib.request.urlretrieve(url, tmp)
    # payload may be a zip containing one json
    if zipfile.is_zipfile(tmp):
        with zipfile.ZipFile(tmp) as z:
            inner = [n for n in z.namelist() if n.endswith(".json")][0]
            data = json.loads(z.read(inner))
    else:
        with open(tmp) as f:
            data = json.load(f)
    os.remove(tmp)
    with open(path, "w") as f:
        json.dump(data, f)
    return data


# per-dataset training presets (reference train_props.py:100-174)
DATASET_PRESETS: Dict[str, Dict[str, Any]] = {
    "qm9_std_jctc": {"n_train": 110000, "n_val": 10000, "n_test": 13885,
                     "cutoff": 5.0,
                     "target_multiplication_factor": 27.211386024367243},
    "megnet": {"n_train": 60000, "n_val": 5000, "n_test": 4239},
    "dft_3d": {},
    "dft_2d": {},
}


def train_prop_model(dataset: str = "dft_3d",
                     prop: str = "formation_energy_peratom",
                     **overrides):
    """High-throughput preset training (reference train_props.py).

    Builds a TrainingConfig from the per-dataset presets and runs the
    standard pipeline on figshare records.
    """
    from alignn_tpu.config import TrainingConfig
    from alignn_tpu.data.loader import get_train_val_loaders
    from alignn_tpu.train.trainer import train_model

    preset = dict(DATASET_PRESETS.get(dataset, {}))
    tmf = preset.pop("target_multiplication_factor", None)
    cfg_kw = dict(dataset=dataset, target=prop, **preset)
    cfg_kw.update(overrides)
    config = TrainingConfig(**cfg_kw)
    records = load_dataset(dataset)
    for r in records:
        r["target"] = r.get(prop)
    tr, va, te, _mad = get_train_val_loaders(
        records, target="target", id_tag=config.id_tag,
        atom_features=config.atom_features,
        neighbor_strategy=config.neighbor_strategy,
        cutoff=config.cutoff, max_neighbors=config.max_neighbors,
        batch_size=config.batch_size,
        n_train=config.n_train, n_val=config.n_val, n_test=config.n_test,
        train_ratio=config.train_ratio, val_ratio=config.val_ratio,
        test_ratio=config.test_ratio,
        keep_data_order=config.keep_data_order,
        target_multiplication_factor=tmf,
        output_dir=config.output_dir, num_workers=config.num_workers,
        progress=config.progress)
    return train_model(config, tr, va, te)
