#!/usr/bin/env python
"""ALIGNN-FF-scale data-pipeline soak (VERDICT r1 next-round #4).

Synthesizes N structures (default 300k, the ALIGNN-FF dataset scale),
streams them through build -> native record cache (O(1) memory), then
iterates 2 full epochs through the lazy BucketedLoader measuring
graphs/s and peak RSS.  Proves the pipeline is runnable the day real
figshare data arrives, without a multi-GB host-RAM bet.

Usage: python tools/data_soak.py [--n 300000] [--workers 8]
Prints one JSON line per phase.
"""

import argparse
import json
import os
import resource
import shutil
import tempfile
import time

import numpy as np


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def synth_records(n: int, seed: int = 0):
    """Generator of rocksalt-ish records (dict schema of the reference)."""
    rng = np.random.default_rng(seed)
    elems = ["Na", "Cl", "K", "Br", "Mg", "O", "Ca", "S"]
    base = np.array([
        [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
        [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5]])
    for i in range(n):
        a = 4.2 + 0.3 * rng.standard_normal()
        frac = (base + 0.02 * rng.standard_normal((8, 3))).tolist()
        yield {
            "jid": f"synth-{i}",
            "atoms": {
                "lattice_mat": (np.eye(3) * a).tolist(),
                "coords": frac,
                "elements": [elems[j % len(elems)] for j in range(8)],
                "cartesian": False,
            },
            "target": float(rng.standard_normal()),
        }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=300_000)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--keep", action="store_true")
    args = parser.parse_args()

    from alignn_tpu.data.loader import get_train_val_loaders

    workdir = tempfile.mkdtemp(prefix="alignn_tpu_soak_")
    cache_dir = os.path.join(workdir, "cache")
    t0 = time.time()
    records = list(synth_records(args.n))  # records are tiny dicts
    print(json.dumps({"phase": "records", "n": args.n,
                      "sec": round(time.time() - t0, 1),
                      "rss_mb": round(rss_mb(), 1)}), flush=True)

    t0 = time.time()
    train_loader, val_loader, test_loader, mad = get_train_val_loaders(
        records, batch_size=args.batch_size, cache_dir=cache_dir,
        output_dir=workdir, num_workers=args.workers,
        train_ratio=0.98, val_ratio=0.01, test_ratio=0.01,
        keep_data_order=True, progress=False)
    build_s = time.time() - t0
    n_train = len(train_loader.dataset)
    cache_bytes = sum(
        os.path.getsize(os.path.join(cache_dir, f))
        for f in os.listdir(cache_dir))
    print(json.dumps({
        "phase": "build+cache", "graphs": n_train,
        "sec": round(build_s, 1),
        "graphs_per_s": round(args.n / build_s, 1),
        "cache_gb": round(cache_bytes / 1e9, 2),
        "lazy": type(train_loader.dataset.graphs).__name__,
        "rss_mb": round(rss_mb(), 1)}), flush=True)

    for epoch in range(args.epochs):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        n_graphs = n_batches = 0
        for batch in train_loader:
            n_batches += 1
            n_graphs += int(batch.graph_mask.sum())
        dt = time.time() - t0
        print(json.dumps({
            "phase": f"epoch{epoch}", "batches": n_batches,
            "graphs": n_graphs, "sec": round(dt, 1),
            "graphs_per_s": round(n_graphs / dt, 1),
            "rss_mb": round(rss_mb(), 1)}), flush=True)

    if not args.keep:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
