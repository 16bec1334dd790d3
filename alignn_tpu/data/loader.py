"""Bucketed batch loader: graphs -> padded GraphBatch streams.

Replaces the reference's `GraphDataLoader` construction + collate fns
(`alignn/data.py:455-493`, `alignn/lmdb_dataset.py:76-108`).  TPU-first
design decisions:

- One static :class:`BucketSpec` per loader, computed from a worst-case
  packing bound (sum of the `batch_size` largest per-graph counts), so the
  jitted step compiles exactly once per loader shape.
- Shuffling is deterministic from an epoch-indexed seed.
- `num_shards` stacks that many consecutive micro-batches into a leading
  device axis for `shard_map` data parallelism (replacing the reference's
  `DistributedSampler`, data.py:357-364).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence

import numpy as np
import jax

from alignn_tpu.data.dataset import GraphDataset, filter_records, \
    records_to_graphs
from alignn_tpu.data.splits import get_id_train_val_test
from alignn_tpu.graph.batch import BucketSpec, GraphBatch, batch_graphs
from alignn_tpu.graph.build import GraphData


def _round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


def spec_from_counts(node_counts, edge_counts, lg_counts, batch_size: int,
                     node_quantum: int = 128, edge_quantum: int = 128,
                     lg_quantum: int = 512,
                     slack: float = 1.0) -> BucketSpec:
    """Safe static bucket from per-graph count arrays.

    Bounds each axis by the sum of the `batch_size` largest per-graph
    counts across the dataset (axes bound independently — conservative
    but compile-once).  Lazy datasets pass counts recorded at
    cache-write time, so no graph is deserialized to size the bucket.
    """
    def bound(counts) -> int:
        top = sorted((int(c) for c in counts), reverse=True)[:batch_size]
        return int(sum(top) * slack)

    return BucketSpec(
        n_nodes=_round_up(bound(node_counts) + 1, node_quantum),
        n_edges=_round_up(bound(edge_counts) + 1, edge_quantum),
        n_lg_edges=_round_up(bound(lg_counts) + 1, lg_quantum),
        n_graphs=batch_size + 1,
    )


def worst_case_spec(graphs: Sequence[GraphData], batch_size: int,
                    node_quantum: int = 128, edge_quantum: int = 128,
                    lg_quantum: int = 512,
                    slack: float = 1.0) -> BucketSpec:
    """:func:`spec_from_counts` over materialized graphs."""
    return spec_from_counts(
        [g.num_nodes for g in graphs], [g.num_edges for g in graphs],
        [g.num_lg_edges for g in graphs], batch_size,
        node_quantum=node_quantum, edge_quantum=edge_quantum,
        lg_quantum=lg_quantum, slack=slack)


class BucketedLoader:
    """Iterates padded GraphBatches over a :class:`GraphDataset`."""

    def __init__(self, dataset: GraphDataset, batch_size: int,
                 shuffle: bool = False, drop_last: bool = False,
                 spec: Optional[BucketSpec] = None,
                 atom_features: str = "cgcnn",
                 target_width: int = 1, atomwise_width: int = 0,
                 additional_width: int = 0, extra_width: int = 0,
                 num_shards: int = 1, seed: int = 123,
                 bucket_slack: float = 1.0,
                 host_id: int = 0, num_hosts: int = 1,
                 prefetch: int = 2, dense: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last or (num_shards > 1)
        self.atom_features = atom_features
        self.target_width = target_width
        self.atomwise_width = atomwise_width
        self.additional_width = additional_width
        self.extra_width = extra_width
        self.num_shards = num_shards
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0
        # multi-host input sharding (DistributedSampler parity,
        # reference data.py:357-364): every host derives the same
        # seeded permutation and takes its strided slice
        self.host_id = host_id
        self.num_hosts = max(num_hosts, 1)
        # monotone floor over the static gather windows (GraphBatch
        # win_*): shuffled batches would otherwise flap between window
        # values and trigger fresh XLA compiles; raising a window is
        # always safe (it still covers the span).  0 stays 0 for the
        # step it occurs (fallback), without lowering the floor.
        self._win_floor: dict = {}
        if spec is None and len(dataset) > 0:
            if dense:
                # dense-neighborhood layout (graph/dense.py): the bucket
                # is (max nodes * batch, D = max in-degree).  Caches
                # written with a 4-column counts meta (incl. per-graph
                # max in-degree) size it WITHOUT deserializing records;
                # otherwise fall back to a materializing pass.
                from alignn_tpu.graph.dense import (
                    dense_spec_for_graphs,
                    dense_spec_from_counts,
                )

                counts = dataset.metadata.get("counts")
                c = np.asarray(counts) if counts is not None else None
                if c is not None and c.ndim == 2 and c.shape[1] >= 4 \
                        and c[:, 3].max() > 0:
                    spec = dense_spec_from_counts(
                        c[:, 0], c[:, 3], batch_size, slack=bucket_slack)
                else:
                    spec = dense_spec_for_graphs(
                        dataset.graphs, batch_size, slack=bucket_slack)
            else:
                counts = dataset.metadata.get("counts")
                if counts is not None:
                    c = np.asarray(counts)
                    spec = spec_from_counts(c[:, 0], c[:, 1], c[:, 2],
                                            batch_size, slack=bucket_slack)
                else:
                    spec = worst_case_spec(dataset.graphs, batch_size,
                                           slack=bucket_slack)
        if dense and spec is not None and not spec.dense_D:
            raise ValueError("dense=True requires a dense BucketSpec "
                             "(graph.dense.dense_spec_for_graphs)")
        self.spec = spec

    def __len__(self) -> int:
        n = len(self._order())
        full = self.batch_size * self.num_shards
        if self.drop_last:
            return n // full
        return (n + full - 1) // full

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        if self.num_hosts > 1:
            # DistributedSampler parity: every host must see the SAME
            # number of items or SPMD collectives desync mid-epoch —
            # pad the permutation to a num_hosts multiple by cycling
            # before taking the strided slice
            pad = (-len(order)) % self.num_hosts
            if pad:
                order = np.concatenate([order, order[:pad]])
            order = order[self.host_id::self.num_hosts]
        return order

    def _make_batch(self, idxs) -> GraphBatch:
        graphs = [self.dataset.graphs[i] for i in idxs]
        if self.spec is not None and self.spec.dense_D:
            from alignn_tpu.graph.dense import (
                AsymmetricEdgesError, dense_batch_graphs)

            try:
                return dense_batch_graphs(
                    graphs, self.spec, atom_features=self.atom_features,
                    target_width=self.target_width,
                    atomwise_width=self.atomwise_width,
                    additional_width=self.additional_width,
                    extra_width=self.extra_width)
            except AsymmetricEdgesError as exc:
                # surface an actionable error instead of a cryptic crash
                # from the prefetch thread (training cannot mix layouts
                # batch-to-batch: the jitted step is layout-static)
                raise AsymmetricEdgesError(
                    f"{exc} — a structure in this dataset lacks the "
                    f"reverse-edge involution (common for radius graphs "
                    f"with bonds at the cutoff boundary); train with "
                    f"dense_neighborhoods=false for this dataset"
                ) from exc
        return batch_graphs(
            graphs, self.spec, atom_features=self.atom_features,
            target_width=self.target_width,
            atomwise_width=self.atomwise_width,
            additional_width=self.additional_width,
            extra_width=self.extra_width)

    _WIN_FIELDS = ("win_src", "win_dst", "win_src_sorted",
                   "win_lg_src", "win_lg_dst", "win_lg_src_sorted")

    def _floor_windows(self, batches) -> dict:
        """Unified window set: max across shards + monotone loader floor."""
        out = {}
        for name in self._WIN_FIELDS:
            vals = [getattr(b, name) for b in batches]
            w = 0 if any(v == 0 for v in vals) else max(vals)
            if w:
                w = max(w, self._win_floor.get(name, 0))
                self._win_floor[name] = w
            out[name] = w
        return out

    def _batch_for_step(self, order, s: int) -> GraphBatch:
        full = self.batch_size * self.num_shards
        chunk = order[s * full:(s + 1) * full]
        if self.num_shards == 1:
            b = self._make_batch(chunk)
            return b.replace(**self._floor_windows([b]))
        shards = [
            self._make_batch(
                chunk[d * self.batch_size:(d + 1) * self.batch_size])
            for d in range(self.num_shards)
        ]
        # static fields must match across shards for tree_map stacking
        wins = self._floor_windows(shards)
        shards = [b.replace(**wins) for b in shards]
        return jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, axis=0), *shards)

    def __iter__(self) -> Iterator[GraphBatch]:
        order = self._order()
        n_steps = len(self)
        if self.prefetch <= 0 or n_steps <= 1:
            for s in range(n_steps):
                yield self._batch_for_step(order, s)
            return
        # background-thread prefetch: deserialization + pack/pad of the
        # next batches overlaps the device step (the reference leans on
        # torch DataLoader workers for this, data.py:455-493)
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for s in range(n_steps):
                    if stop.is_set():
                        return
                    q.put(("ok", self._batch_for_step(order, s)))
                q.put(("done", None))
            except BaseException as exc:  # surface in consumer
                q.put(("err", exc))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                kind, payload = q.get()
                if kind == "done":
                    return
                if kind == "err":
                    raise payload
                yield payload
        finally:
            stop.set()
            # drain so the worker never blocks on a full queue
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    t.join(timeout=0.1)

    def batch_ids(self) -> List[List[str]]:
        """Ids per batch in the *current* epoch order (no shuffle case)."""
        order = self._order()
        full = self.batch_size * self.num_shards
        return [
            [self.dataset.ids[i] for i in order[s * full:(s + 1) * full]]
            for s in range(len(self))
        ]


def get_train_val_loaders(
    records: Sequence[dict],
    target: str = "target",
    id_tag: str = "jid",
    atom_features: str = "cgcnn",
    neighbor_strategy: str = "k-nearest",
    cutoff: float = 8.0,
    cutoff_extra: float = 3.0,
    max_neighbors: int = 12,
    use_canonize: bool = True,
    compute_line_graph: bool = True,
    batch_size: int = 64,
    split_seed: int = 123,
    train_ratio: Optional[float] = 0.8,
    val_ratio: Optional[float] = 0.1,
    test_ratio: Optional[float] = 0.1,
    n_train: Optional[int] = None,
    n_val: Optional[int] = None,
    n_test: Optional[int] = None,
    keep_data_order: bool = True,
    classification_threshold: Optional[float] = None,
    target_multiplication_factor: Optional[float] = None,
    standard_scalar_and_pca: bool = False,
    output_dir: str = ".",
    num_workers: int = 0,
    num_shards: int = 1,
    target_width: int = 1,
    atomwise_width: int = 0,
    additional_width: int = 0,
    extra_width: int = 0,
    bucket_slack: float = 1.0,
    progress: bool = False,
    cache_dir: Optional[str] = None,
    dense: bool = False,
    per_species_energy_baseline: bool = False,
    lg_cutoff: Optional[float] = None,
):
    """Records -> (train_loader, val_loader, test_loader, mad).

    Mirrors the observable behavior of reference `get_train_val_loaders`
    (`alignn/data.py:118-493`): filtering, deterministic split +
    `ids_train_val_test.json` dump, optional standard scaling fit on train,
    MAD baseline report, train shuffle + drop_last, test batch_size=1.
    """
    from alignn_tpu.chem.atoms import dumpjson

    dat = filter_records(
        records, target=target,
        classification_threshold=classification_threshold,
        target_multiplication_factor=target_multiplication_factor)
    if target != "target":
        # graph construction reads the canonical "target" key
        # (dataset._build_one) — copy the selected property onto it
        dat = [{**r, "target": r[target]} for r in dat]
    id_train, id_val, id_test = get_id_train_val_test(
        total_size=len(dat), split_seed=split_seed,
        train_ratio=train_ratio, val_ratio=val_ratio, test_ratio=test_ratio,
        n_train=n_train, n_test=n_test, n_val=n_val,
        keep_data_order=keep_data_order)
    os.makedirs(output_dir, exist_ok=True)
    dumpjson(
        {
            "id_train": [dat[i][id_tag] for i in id_train],
            "id_val": [dat[i][id_tag] for i in id_val],
            "id_test": [dat[i][id_tag] for i in id_test],
        },
        os.path.join(output_dir, "ids_train_val_test.json"),
    )

    if per_species_energy_baseline:
        # fit elemental offsets on the TRAIN split only, residualize
        # every split's targets, persist the offsets for predict-time
        # add-back (data/baseline.py; stamped into checkpoints by the
        # trainer, applied by zoo.load_model_dir / ff.Calculator).
        # Mutating `dat` BEFORE make_ds means the cache fingerprint
        # (which hashes targets) invalidates automatically.
        from alignn_tpu.data.baseline import (
            baseline_per_atom,
            fit_species_baseline,
        )

        mu = fit_species_baseline([dat[i] for i in id_train])
        dat = [{**r, "target":
                float(np.asarray(r["target"],
                                 dtype=np.float64).reshape(-1)[0]
                      - baseline_per_atom(r["atoms"]["elements"], mu))}
               for r in dat]
        dumpjson({"per_atom": True, "elements": mu},
                 os.path.join(output_dir, "species_baseline.json"))
        print(f"[baseline] per-species reference energies (eV/atom): "
              f"{ {k: round(v, 4) for k, v in mu.items()} }")

    graph_kwargs = dict(
        neighbor_strategy=neighbor_strategy, cutoff=cutoff,
        max_neighbors=max_neighbors, use_canonize=use_canonize,
        compute_line_graph=compute_line_graph, cutoff_extra=cutoff_extra,
        num_workers=num_workers, progress=progress,
        lg_cutoff=lg_cutoff)

    def make_ds(idxs, split: str) -> GraphDataset:
        import hashlib
        import json as _json

        recs = [dat[i] for i in idxs]
        ids = [r[id_tag] for r in recs]
        if cache_dir is not None:
            # preprocessed-graph disk cache (reference lmdb_dataset.py
            # role) via the native record store, consumed LAZILY: each
            # item deserializes on access (random-access reads like the
            # reference's LMDB __getitem__), so ALIGNN-FF-scale datasets
            # never materialize in host RAM.  A fingerprint of the
            # graph-construction kwargs, the record ids AND the targets
            # guards against silently reusing stale graphs when cutoff/
            # strategy/target change between runs with the same size.
            from alignn_tpu.data.cache import GraphCache, GraphCacheWriter
            from alignn_tpu.data.dataset import (
                LazyCacheView,
                records_to_graphs_iter,
            )

            build_kwargs = {k: v for k, v in graph_kwargs.items()
                            if k not in ("num_workers", "progress")}

            def _label_digest(r) -> str:
                # content hash of EVERY label baked into the cached
                # graphs — regenerated forces/stresses with unchanged
                # ids/energies must invalidate the cache
                h = hashlib.sha256()
                for key in ("target", "atomwise_target",
                            "atomwise_grad", "stresses",
                            "additional", "extra_features"):
                    v = r.get(key)
                    if v is None:
                        h.update(b"-")
                    else:
                        h.update(np.ascontiguousarray(np.asarray(
                            v, dtype=np.float64)).tobytes())
                return h.hexdigest()

            fp_src = _json.dumps(
                [build_kwargs, ids, [_label_digest(r) for r in recs]],
                sort_keys=True, default=str)
            fingerprint = hashlib.sha256(fp_src.encode()).hexdigest()
            path = os.path.join(cache_dir, f"graphs_{split}")
            meta_path = path + ".meta.json"

            def lazy_ds(meta) -> GraphDataset:
                cache = GraphCache(path)
                return GraphDataset(
                    graphs=LazyCacheView(cache), ids=ids,
                    metadata={"counts": meta["counts"],
                              "targets": meta["targets"]})

            if GraphCache.exists(path) and os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = _json.load(f)
                if meta.get("fingerprint") == fingerprint and \
                        meta.get("n") == len(recs) and "counts" in meta:
                    return lazy_ds(meta)
            # streaming ingest: build -> pack -> append, one graph at a
            # time; per-graph counts and targets land in the meta so the
            # loader sizes buckets and computes MAD without reads
            counts, targets_meta = [], []
            with GraphCacheWriter(path) as w:
                for g in records_to_graphs_iter(recs, **graph_kwargs):
                    w.put(g)
                    # 4th column: max in-degree, so dense buckets size
                    # from metadata (dense_spec_from_counts)
                    indeg = int(np.bincount(
                        g.dst, minlength=g.num_nodes).max()) \
                        if g.num_edges else 0
                    counts.append([g.num_nodes, g.num_edges,
                                   g.num_lg_edges, indeg])
                    targets_meta.append(
                        np.atleast_1d(np.asarray(
                            g.target, dtype=np.float64)).tolist()
                        if g.target is not None else [0.0])
            with open(meta_path, "w") as f:
                _json.dump({"fingerprint": fingerprint, "n": len(recs),
                            "counts": counts, "targets": targets_meta}, f)
            return lazy_ds({"counts": counts, "targets": targets_meta})
        graphs = records_to_graphs(recs, **graph_kwargs)
        return GraphDataset(graphs=graphs, ids=ids)

    train_ds = make_ds(id_train, "train")
    val_ds = make_ds(id_val, "val")
    test_ds = make_ds(id_test, "test")

    mad = train_ds.mad() if len(train_ds) else 0.0
    with open(os.path.join(output_dir, "mad"), "w") as f:
        f.write(f"MAX val: {mad}\n")  # reference writes MAD to a file
        f.write(f"MAD of training set: {mad}\n")
        f.write(f"Baseline MAE: {mad}\n")

    if standard_scalar_and_pca and len(train_ds):
        y = train_ds.targets()
        mean, std = float(np.mean(y)), float(np.std(y)) or 1.0
        import pickle

        with open(os.path.join(output_dir, "sc.pkl"), "wb") as f:
            pickle.dump({"mean": mean, "std": std}, f)
        for ds in (train_ds, val_ds, test_ds):
            ds.scale_targets(mean, std)  # lazy-safe (transform-on-read)

    shared_kwargs = dict(
        atom_features=atom_features, target_width=target_width,
        atomwise_width=atomwise_width, additional_width=additional_width,
        extra_width=extra_width, seed=split_seed,
        bucket_slack=bucket_slack, dense=dense)
    train_loader = BucketedLoader(
        train_ds, batch_size, shuffle=True, drop_last=True,
        num_shards=num_shards, **shared_kwargs)
    # val drop_last=True parity (reference data.py:467-477) — except when
    # that would empty the val set entirely (n_val < batch_size), where
    # the reference would silently validate on nothing; keep the partial
    # batch instead.
    val_drop_last = len(val_ds) >= batch_size
    val_loader = BucketedLoader(
        val_ds, batch_size, shuffle=False, drop_last=val_drop_last,
        spec=None, num_shards=1, **shared_kwargs)
    test_loader = BucketedLoader(
        test_ds, 1, shuffle=False, drop_last=False, spec=None,
        num_shards=1, **shared_kwargs)
    return train_loader, val_loader, test_loader, mad
