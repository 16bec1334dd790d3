"""Record ingestion and graph dataset construction.

Replaces the reference's dataset assembly across `alignn/train_alignn.py`
(folder ingestion, :166-307), `alignn/data.py` (NaN filter / threshold /
multiplication, :244-291) and `alignn/lmdb_dataset.py` (one-time graph
build + on-disk cache, :155-226).

A *record* is a plain dict in the reference's schema:
``{"jid": ..., "atoms": {...}, "target": ... [, "atomwise_target",
"atomwise_grad", "stresses", "additional", "extra_features"]}``.
"""

from __future__ import annotations

import csv
import json
import math
import os
import zipfile
from concurrent.futures import ProcessPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from alignn_tpu.chem.atoms import Atoms
from alignn_tpu.graph.build import GraphData, build_graph


def voigt_6_to_full_3x3_stress(v) -> np.ndarray:
    """Voigt 6-vector -> symmetric 3x3 stress (ASE ordering).

    Parity with the conversion used at reference train_alignn.py:294-296.
    """
    s_xx, s_yy, s_zz, s_yz, s_xz, s_xy = [float(x) for x in v]
    return np.array([
        [s_xx, s_xy, s_xz],
        [s_xy, s_yy, s_yz],
        [s_xz, s_yz, s_zz],
    ])


def load_folder_records(
    root_dir: str,
    target_key: str = "total_energy",
    id_key: str = "jid",
    atomwise_key: str = "forces",
    gradwise_key: str = "forces",
    stresswise_key: str = "stresses",
    additional_output_key: str = "additional_output",
    file_format: str = "poscar",
    train_atom: bool = False,
    train_grad: bool = False,
    train_stress: bool = False,
    train_additional_output: bool = False,
) -> List[Dict[str, Any]]:
    """Read id_prop.{csv,json,json.zip} from a folder into records.

    Mirrors reference train_alignn.py:166-307 including multi-output csv
    targets and per-record force/stress/additional wiring.
    """
    id_prop_json = os.path.join(root_dir, "id_prop.json")
    id_prop_json_zip = os.path.join(root_dir, "id_prop.json.zip")
    id_prop_csv = os.path.join(root_dir, "id_prop.csv")
    csv_mode = False
    if os.path.exists(id_prop_json_zip):
        dat = json.loads(zipfile.ZipFile(id_prop_json_zip).read("id_prop.json"))
    elif os.path.exists(id_prop_json):
        with open(id_prop_json) as f:
            dat = json.load(f)
    elif os.path.exists(id_prop_csv):
        csv_mode = True
        with open(id_prop_csv) as f:
            dat = [row for row in csv.reader(f) if row]
    else:
        raise FileNotFoundError(f"no id_prop.{{csv,json,json.zip}} in {root_dir}")

    records: List[Dict[str, Any]] = []
    for i in dat:
        info: Dict[str, Any] = {}
        if csv_mode:
            file_name = i[0]
            tmp = [float(j) for j in i[1:]]
            info["jid"] = file_name
            info["target"] = tmp[0] if len(tmp) == 1 else tmp
            file_path = os.path.join(root_dir, file_name)
            if file_format == "poscar":
                atoms = Atoms.from_poscar(file_path)
            elif file_format == "cif":
                atoms = Atoms.from_cif(file_path)
            elif file_format == "xyz":
                atoms = Atoms.from_xyz(file_path)
            elif file_format == "pdb":
                atoms = Atoms.from_pdb(file_path)
            else:
                raise NotImplementedError(
                    f"File format not implemented: {file_format}")
            info["atoms"] = atoms.to_dict()
        else:
            info["target"] = i[target_key]
            info["atoms"] = i["atoms"]
            info["jid"] = i[id_key]
        if train_atom:
            info["atomwise_target"] = i[atomwise_key]
        if train_grad:
            info["atomwise_grad"] = i[gradwise_key]
        if train_stress:
            s = i[stresswise_key]
            info["stresses"] = (voigt_6_to_full_3x3_stress(s)
                                if np.asarray(s).size == 6
                                else np.asarray(s, dtype=np.float64))
        if train_additional_output:
            info["additional"] = i[additional_output_key]
        if "extra_features" in i:
            info["extra_features"] = i["extra_features"]
        records.append(info)
    return records


def filter_records(
    records: Sequence[Dict[str, Any]],
    target: str = "target",
    classification_threshold: Optional[float] = None,
    target_multiplication_factor: Optional[float] = None,
) -> List[Dict[str, Any]]:
    """NaN/'na' filtering + thresholding (reference data.py:244-268)."""
    out = []
    for rec in records:
        t = rec[target]
        if isinstance(t, (list, np.ndarray)):
            out.append(rec)
            continue
        if t is None or t == "na" or (isinstance(t, float) and math.isnan(t)):
            continue
        t = float(t)
        if target_multiplication_factor is not None:
            t = t * target_multiplication_factor
        if classification_threshold is not None:
            t = 0 if t <= classification_threshold else 1
        rec = dict(rec)
        rec[target] = t
        out.append(rec)
    return out


def _build_chunk(recs, kwargs):
    """Picklable chunk builder for the windowed pool submission."""
    return [_build_one((r, kwargs)) for r in recs]


def _build_one(args) -> GraphData:
    rec, kwargs = args
    atoms = Atoms.from_dict(rec["atoms"])
    g = build_graph(atoms, **kwargs)
    t = rec.get("target")
    if t is not None:
        g.target = np.atleast_1d(np.asarray(t, dtype=np.float64))
    if "atomwise_target" in rec:
        g.atomwise_target = np.asarray(
            rec["atomwise_target"], dtype=np.float64).reshape(
            atoms.num_atoms, -1)
    if "atomwise_grad" in rec:
        g.forces = np.asarray(
            rec["atomwise_grad"], dtype=np.float64).reshape(-1, 3)
    if "stresses" in rec:
        g.stress = np.asarray(rec["stresses"], dtype=np.float64).reshape(3, 3)
    if "additional" in rec:
        g.additional = np.asarray(
            rec["additional"], dtype=np.float64).reshape(-1)
    if "extra_features" in rec:
        g.extra_features = np.asarray(
            rec["extra_features"], dtype=np.float64).reshape(-1)
    return g


def records_to_graphs(
    records: Sequence[Dict[str, Any]],
    neighbor_strategy: str = "k-nearest",
    cutoff: float = 8.0,
    max_neighbors: int = 12,
    use_canonize: bool = True,
    compute_line_graph: bool = True,
    cutoff_extra: float = 3.0,
    num_workers: int = 0,
    progress: bool = False,
    lg_cutoff=None,
) -> List[GraphData]:
    """Build graphs for every record (the one-time host-side hot loop,
    reference lmdb_dataset.py:155-226)."""
    kwargs = dict(
        neighbor_strategy=neighbor_strategy, cutoff=cutoff,
        max_neighbors=max_neighbors, use_canonize=use_canonize,
        compute_line_graph=compute_line_graph, cutoff_extra=cutoff_extra,
        lg_cutoff=lg_cutoff)
    jobs = [(rec, kwargs) for rec in records]
    if num_workers and num_workers > 1 and len(jobs) > 8:
        with ProcessPoolExecutor(max_workers=num_workers) as ex:
            it = ex.map(_build_one, jobs, chunksize=16)
            if progress:
                from tqdm import tqdm

                it = tqdm(it, total=len(jobs), desc="graphs")
            return list(it)
    it = map(_build_one, jobs)
    if progress:
        from tqdm import tqdm

        it = tqdm(it, total=len(jobs), desc="graphs")
    return list(it)


def records_to_graphs_iter(
    records: Sequence[Dict[str, Any]],
    neighbor_strategy: str = "k-nearest",
    cutoff: float = 8.0,
    max_neighbors: int = 12,
    use_canonize: bool = True,
    compute_line_graph: bool = True,
    cutoff_extra: float = 3.0,
    num_workers: int = 0,
    progress: bool = False,
    lg_cutoff=None,
):
    """Streaming variant of :func:`records_to_graphs` (O(1) memory).

    Yields graphs in record order.  With num_workers > 1, submission is
    WINDOWED (at most ~4 chunks per worker in flight) — stdlib
    `Executor.map` submits every job eagerly and pins completed,
    unconsumed results, which would grow toward O(N) graphs in RAM when
    the consumer (pack + disk append) is slower than the pool.  Used by
    the cache ingest path so 300k-structure datasets stay O(window).
    """
    kwargs = dict(
        neighbor_strategy=neighbor_strategy, cutoff=cutoff,
        max_neighbors=max_neighbors, use_canonize=use_canonize,
        compute_line_graph=compute_line_graph, cutoff_extra=cutoff_extra,
        lg_cutoff=lg_cutoff)
    if num_workers and num_workers > 1 and len(records) > 8:
        from collections import deque

        chunk = 16
        window = max(num_workers * 4, 4)
        prog = None
        if progress:
            from tqdm import tqdm

            prog = tqdm(total=len(records), desc="graphs")

        with ProcessPoolExecutor(max_workers=num_workers) as ex:
            pending = deque()
            idx = 0
            n = len(records)
            while idx < n or pending:
                while idx < n and len(pending) < window:
                    recs = list(records[idx: idx + chunk])
                    pending.append(ex.submit(_build_chunk, recs, kwargs))
                    idx += len(recs)
                done = pending.popleft()
                for g in done.result():  # in-order consumption
                    if prog is not None:
                        prog.update(1)
                    yield g
        if prog is not None:
            prog.close()
        return
    it = map(_build_one, ((rec, kwargs) for rec in records))
    if progress:
        from tqdm import tqdm

        it = tqdm(it, total=len(records), desc="graphs")
    yield from it


class LazyCacheView:
    """Indexable sequence of GraphData backed by a GraphCache.

    Random-access deserialization per item (the reference's LMDB
    per-item `__getitem__`, lmdb_dataset.py:38-108) — nothing is held in
    RAM beyond the mmap page cache.  `transform` (e.g. target
    standardization) applies on read.
    """

    def __init__(self, cache, transform=None):
        self.cache = cache
        self.transform = transform

    def __len__(self) -> int:
        return len(self.cache)

    def __getitem__(self, i: int) -> GraphData:
        g = self.cache[int(i)]
        if self.transform is not None:
            g = self.transform(g)
        return g

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


@dataclass
class GraphDataset:
    """A list of per-structure graphs + ids + target normalization state.

    In-memory equivalent of `StructureDataset` (reference graphs.py:867-997)
    with the standardizer folded in (reference graphs.py:1040-1054 /
    data.py:296-320).
    """

    graphs: List[GraphData]
    ids: List[str]
    target_mean: float = 0.0
    target_std: float = 1.0
    metadata: Dict[str, Any] = field(default_factory=dict)

    def __len__(self) -> int:
        return len(self.graphs)

    def targets(self) -> np.ndarray:
        # lazy datasets carry targets in metadata (stored at cache-write
        # time) so no full deserialization pass is needed
        if "targets" in self.metadata:
            return np.stack([np.atleast_1d(np.asarray(t, dtype=np.float64))
                             for t in self.metadata["targets"]])
        return np.stack([np.atleast_1d(g.target) for g in self.graphs])

    def scale_targets(self, mean: float, std: float):
        """Apply (t - mean)/std to every target, eager or lazy."""
        std = std if std > 0 else 1.0
        if isinstance(self.graphs, LazyCacheView):
            prev = self.graphs.transform

            def transform(g, _mean=mean, _std=std, _prev=prev):
                # compose with any prior transform so repeated scaling
                # matches the eager path (and the metadata targets)
                if _prev is not None:
                    g = _prev(g)
                if g.target is not None:
                    g.target = (np.atleast_1d(g.target) - _mean) / _std
                return g

            self.graphs.transform = transform
            if "targets" in self.metadata:
                self.metadata["targets"] = [
                    ((np.atleast_1d(np.asarray(t, np.float64)) - mean)
                     / std).tolist()
                    for t in self.metadata["targets"]]
        else:
            for g in self.graphs:
                if g.target is not None:  # force-only FF records
                    g.target = (np.atleast_1d(g.target) - mean) / std
        # COMPOSE the recorded stats across repeated scalings so they
        # always invert the total transform: t2(t1(x)) =
        # (x - (m1 + m2 s1)) / (s1 s2)
        prev_mean = getattr(self, "target_mean", 0.0) or 0.0
        prev_std = getattr(self, "target_std", 1.0) or 1.0
        self.target_mean = prev_mean + mean * prev_std
        self.target_std = prev_std * std
        return self

    def standardize_from(self, other: "GraphDataset" = None):
        """Fit mean/std on `other` (train split) and scale own targets."""
        src = other if other is not None else self
        y = src.targets()
        return self.scale_targets(float(np.mean(y)), float(np.std(y)))

    def mad(self) -> float:
        """Mean absolute deviation of targets (reference data.py:326-355)."""
        y = self.targets()
        return float(np.mean(np.abs(y - np.mean(y))))
