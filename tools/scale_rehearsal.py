#!/usr/bin/env python
"""End-to-end scale rehearsal: cache -> prefetch loader -> DEVICE train.

VERDICT r2 #4: the 300k soak (tools/data_soak.py) measured host-side
ingest/iteration and bench.py measured the device step — nothing showed
the prefetch pipeline keeping the chip fed during real cached-dataset
training.  This runs the whole path at the ALIGNN-FF schema/scale on
synthetic records (the only missing ingredient for the real 307k run is
the dataset bits, which are egress-blocked):

  records (E/F/S schema) -> streaming record-store cache -> lazy
  BucketedLoader (background-thread prefetch) -> jitted E/F/S train
  step per batch -> epoch-level edges/s

and reports `loader_overhead = epoch_time / (n_steps * t_step) - 1`
against the step-only rate re-measured on a pinned batch (the bench.py
methodology, device_get-fenced).  Target: overhead < 10% at batch 64.

Usage (device):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/scale_rehearsal.py \
      --n 300000 --epochs 2 --steps_cap 300
CPU smoke:
  JAX_PLATFORMS=cpu python tools/scale_rehearsal.py --n 2000 \
      --hidden 64 --layers 2 --steps_cap 20
"""

import argparse
import json
import os
import shutil
import tempfile
import time

import numpy as np

from tools.data_soak import rss_mb, synth_records


def synth_ff_records(n: int, seed: int = 0):
    """ALIGNN-FF schema: total-energy target + per-atom forces + stress."""
    rng = np.random.default_rng(seed + 7)
    for rec in synth_records(n, seed=seed):
        na = len(rec["atoms"]["elements"])
        rec["forces"] = (0.1 * rng.standard_normal((na, 3))).tolist()
        rec["stresses"] = (0.01 * rng.standard_normal((3, 3))
                           + np.eye(3) * 0.02).tolist()
        yield rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=300_000)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--steps_cap", type=int, default=None,
                   help="cap train steps per epoch (time-bounded runs); "
                        "epoch rate is reported over the capped steps")
    p.add_argument("--dense", action="store_true", default=True)
    p.add_argument("--sparse", dest="dense", action="store_false")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--keep", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from alignn_tpu.backend_retry import probe_devices, retry_transient
    from alignn_tpu.data.loader import get_train_val_loaders
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state, make_train_step

    retry_transient(probe_devices)
    # Enable the cache only AFTER the guarded probe: it must never be
    # the first thing to touch backend init on a wedged tunnel
    # (ADVICE r3; bench.py uses the same ordering).
    from alignn_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    print(json.dumps({"phase": "devices",
                      "devices": [str(d) for d in jax.devices()][:2]}),
          flush=True)

    workdir = tempfile.mkdtemp(prefix="alignn_tpu_rehearsal_")
    try:
        t0 = time.time()
        records = list(synth_ff_records(args.n))
        print(json.dumps({"phase": "records", "n": args.n,
                          "sec": round(time.time() - t0, 1),
                          "rss_mb": round(rss_mb(), 1)}), flush=True)

        t0 = time.time()
        train_loader, _val, _test, _mad = get_train_val_loaders(
            records, batch_size=args.batch_size,
            cache_dir=os.path.join(workdir, "cache"),
            output_dir=workdir, num_workers=args.workers,
            train_ratio=0.98, val_ratio=0.01, test_ratio=0.01,
            keep_data_order=True, progress=False, dense=args.dense)
        print(json.dumps({"phase": "build+cache",
                          "graphs": len(train_loader.dataset),
                          "sec": round(time.time() - t0, 1),
                          "rss_mb": round(rss_mb(), 1)}), flush=True)

        cfg = ALIGNNAtomWiseConfig(
            name="alignn_atomwise", alignn_layers=args.layers,
            gcn_layers=args.layers, hidden_features=args.hidden,
            embedding_features=64, graphwise_weight=1.0,
            gradwise_weight=10.0, stresswise_weight=0.1)
        dtype = None if args.f32 else jnp.bfloat16
        model = ALIGNNAtomWise(cfg=cfg, dtype=dtype)
        tx = build_optimizer("adamw", 1e-3, 1e-5)

        first = next(iter(train_loader))
        state = create_train_state(model, first, tx)
        step = make_train_step(model, criterion="l1", donate=False)
        # compile + warm
        state, losses = step(state, first)
        float(jax.device_get(losses["loss"]))

        # ---- step-only rate on the pinned batch (bench methodology)
        n_edges_first = int(np.asarray(first.edge_mask).sum()
                            + np.asarray(first.lg_mask).sum())
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            state, losses = step(state, first)
        float(jax.device_get(losses["loss"]))
        t_step = (time.perf_counter() - t0) / iters
        print(json.dumps({"phase": "step_only",
                          "ms": round(t_step * 1e3, 2),
                          "edges_per_s": round(n_edges_first / t_step)}),
              flush=True)

        # ---- real epochs through the cached prefetch loader.
        # buckets come in several padded shapes; the sound step-only
        # baseline is sum(count_shape * t_shape), with one sample batch
        # kept per shape and timed after the epoch (warm).
        def _shape_key(b):
            return (b.z.shape[0], b.src.shape[0], b.lg_src.shape[0],
                    b.dense_D)

        shape_samples, shape_counts = {}, {}
        epoch_stats = []
        for epoch in range(args.epochs):
            train_loader.set_epoch(epoch)
            t0 = time.perf_counter()
            n_steps = n_edges = 0
            last = None
            counts = {}
            for batch in train_loader:
                state, last = step(state, batch)
                n_steps += 1
                n_edges += int(np.asarray(batch.edge_mask).sum()
                               + np.asarray(batch.lg_mask).sum())
                k = _shape_key(batch)
                counts[k] = counts.get(k, 0) + 1
                shape_samples.setdefault(k, batch)
                if args.steps_cap and n_steps >= args.steps_cap:
                    break
            float(jax.device_get(last["loss"]))  # hard fence
            dt = time.perf_counter() - t0
            epoch_stats.append((epoch, n_steps, n_edges, dt, counts))

        # warm per-shape step times (no compiles left at this point)
        t_shape = {}
        for k, sample in shape_samples.items():
            state, losses = step(state, sample)
            float(jax.device_get(losses["loss"]))
            t0 = time.perf_counter()
            for _ in range(10):
                state, losses = step(state, sample)
            float(jax.device_get(losses["loss"]))
            t_shape[k] = (time.perf_counter() - t0) / 10

        for epoch, n_steps, n_edges, dt, counts in epoch_stats:
            expected = sum(c * t_shape[k] for k, c in counts.items())
            print(json.dumps({
                "phase": f"epoch{epoch}", "steps": n_steps,
                "sec": round(dt, 1),
                "epoch_edges_per_s": round(n_edges / dt),
                "step_only_expected_sec": round(expected, 1),
                "loader_overhead": round(dt / expected - 1.0, 4),
                "n_bucket_shapes": len(counts),
                "note": ("epoch0 includes bucket compiles"
                         if epoch == 0 else "warm"),
                "rss_mb": round(rss_mb(), 1)}), flush=True)
    finally:
        if not args.keep:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
