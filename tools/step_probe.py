"""TPU probe round 5: concat-gather effect + backward super-linearity.

gather_probe3 localized the super-linear batch scaling to the BACKWARD
(fwd 6->43 ms is linear for 32->256; full step 24.9->290 is not).  This
probe:
  A. measures the full train step at batch 64/128/256 on the current
     tree (concat-gather fused src_gate||bh, nn/layers.py) vs the
     round-2 ledger (53.2 / 116.6 / 347.5 ms)
  B. prints XLA's own per-step cost analysis (flops, bytes) and
     memory analysis (argument/output/temp/peak) per batch size --
     if flops/bytes scale ~linearly while temp allocation explodes,
     the super-linearity is scheduling/spill pressure, not math.

Usage: python -u -m tools.step_probe [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[64, 128, 256])
    args = ap.parse_args()

    from bench import build_batch
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state, make_train_step

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=4, gcn_layers=4,
        hidden_features=256, embedding_features=64,
        gradwise_weight=10.0, stresswise_weight=0.1, graphwise_weight=1.0)
    model = ALIGNNAtomWise(cfg=cfg, dtype=jnp.bfloat16)
    tx = build_optimizer("adamw", 1e-3, 1e-5)

    for bs in args.batches:
        batch = jax.device_put(build_batch(batch_size=bs))
        n_edges = batch.src.shape[0] + batch.lg_src.shape[0]
        state = create_train_state(model, batch, tx)
        step = make_train_step(model, criterion="l1", donate=False)

        state, losses = step(state, batch)  # compile
        float(jax.device_get(losses["loss"]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, losses = step(state, batch)
        float(jax.device_get(losses["loss"]))
        dt = (time.perf_counter() - t0) / args.iters
        rec = {"probe": f"step_b{bs}", "ms": round(1e3 * dt, 1),
               "edges_per_s": round(n_edges / dt)}

        try:
            compiled = jax.jit(step.__wrapped__
                               if hasattr(step, "__wrapped__") else step,
                               donate_argnums=()).lower(
                state, batch).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            ma = compiled.memory_analysis()
            rec["gflops"] = round(float(ca.get("flops", 0)) / 1e9, 1)
            rec["gbytes"] = round(float(ca.get("bytes accessed", 0)) / 1e9,
                                  2)
            if ma is not None:
                rec["temp_mb"] = round(ma.temp_size_in_bytes / 1e6)
                rec["peak_mb"] = round(
                    (ma.temp_size_in_bytes + ma.argument_size_in_bytes +
                     ma.output_size_in_bytes) / 1e6)
        except Exception as exc:  # noqa: BLE001
            rec["analysis_error"] = str(exc)[:120]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
