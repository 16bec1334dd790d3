"""TPU probe round 4: why does the train step grow super-linearly?

Round-2 honest sweep (BENCH_NOTES): step time per batch doubling grows
2.13x, 2.19x, 2.98x (32->64->128->256).  Remat makes it slower, so it is
not HBM capacity.  Standing hypothesis: XLA's random-access gather cost
per row grows once the source table outruns on-chip cache (~6.4 MB at
batch 128, ~13 MB at 256 for the [E,256] bf16 edge tables).

Probes (all bf16, fenced with device_get on a chained scalar):
  A. gather ns/row vs table rows R at fixed idx count (random idx)
  B. ditto with block-local idx (each idx within 512 rows of its slot)
  C. ditto with sorted random idx
  D. REAL L-stage shapes: gather [E_pad, 256] by the actual lg_src of
     bench batches 32/64/128/256 (+ the windowed kernel at the same
     shape, window from GraphBatch.win_lg_src)
  E. concat law at batch-128 shape: 4 separate same-idx gathers vs one
     [E, 1024] concat gather
  F. component split at batch 32 vs 256: forward-only vs full E/F/S
     train step (where does the 2.98x doubling live?)

Usage: python -u -m tools.gather_probe3 [--iters 30] [--skip_f]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def timed(fn, *args):
    import jax

    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: None, jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jax.device_get(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--skip_f", action="store_true")
    args = ap.parse_args()
    iters = args.iters
    rng = np.random.default_rng(0)

    def chain(fn, x, iters):
        def body(carry, _):
            out = fn(x + carry.astype(x.dtype))
            return jnp.float32(out.reshape(-1)[0]), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    def run_gather(x, idx, tag, m):
        f = jax.jit(functools.partial(chain, lambda t: t[idx], iters=iters))
        dt = timed(f, x)
        print(json.dumps({"probe": tag, "ms": round(1e3 * dt / iters, 3),
                          "ns_per_row": round(1e9 * dt / iters / m, 1)}),
              flush=True)

    # A/B/C: table-size scaling laws at fixed idx count
    M, F = 262144, 256
    for r in (8192, 32768, 131072, 524288):
        x = jnp.asarray(rng.normal(size=(r, F)), jnp.bfloat16)
        ridx = rng.integers(0, r, size=M)
        run_gather(x, jnp.asarray(ridx), f"A_rand_R{r}", M)
        # block-local: idx within a 512-row window around scaled slot
        base = (np.arange(M) * r) // M
        lidx = np.clip(base + rng.integers(-256, 256, size=M), 0, r - 1)
        run_gather(x, jnp.asarray(lidx), f"B_local_R{r}", M)
        run_gather(x, jnp.asarray(np.sort(ridx)), f"C_sorted_R{r}", M)

    # D: real L-stage shapes
    from bench import build_batch

    batches = {}
    for bs in (32, 64, 128, 256):
        b = build_batch(batch_size=bs)
        batches[bs] = b
        e_pad, l_pad = b.src.shape[0], b.lg_src.shape[0]
        x = jnp.asarray(rng.normal(size=(e_pad, F)), jnp.bfloat16)
        idx = jnp.asarray(b.lg_src)
        run_gather(x, idx, f"D_lstage_b{bs}_E{e_pad}_L{l_pad}", l_pad)
        if b.win_lg_src:
            from alignn_tpu.ops.pallas_gather import windowed_gather

            w = b.win_lg_src
            fK = jax.jit(functools.partial(
                chain, lambda t: windowed_gather(t, idx, w), iters=iters))
            dt = timed(fK, x)
            print(json.dumps(
                {"probe": f"Dk_window_b{bs}_w{w}",
                 "ms": round(1e3 * dt / iters, 3),
                 "ns_per_row": round(1e9 * dt / iters / l_pad, 1)}),
                flush=True)

    # E: concat law at batch-128 L-stage shape
    b = batches[128]
    e_pad, l_pad = b.src.shape[0], b.lg_src.shape[0]
    idx = jnp.asarray(b.lg_src)
    xs = [jnp.asarray(rng.normal(size=(e_pad, F)), jnp.bfloat16)
          for _ in range(4)]
    xc = jnp.concatenate(xs, axis=1)

    def sep(t):
        return sum(x[idx].sum() for x in [t, xs[1], xs[2], xs[3]])[None]

    def cat(t):
        return t[idx].sum()[None]

    fE1 = jax.jit(functools.partial(chain, sep, iters=iters))
    dt = timed(fE1, xs[0])
    print(json.dumps({"probe": "E_sep4_F256",
                      "ms": round(1e3 * dt / iters, 3)}), flush=True)
    fE2 = jax.jit(functools.partial(chain, cat, iters=iters))
    dt = timed(fE2, xc)
    print(json.dumps({"probe": "E_concat_F1024",
                      "ms": round(1e3 * dt / iters, 3)}), flush=True)

    if args.skip_f:
        return

    # F: forward vs full-step at batch 32 and 256
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state, make_train_step

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=4, gcn_layers=4,
        hidden_features=256, embedding_features=64,
        gradwise_weight=10.0, stresswise_weight=0.1, graphwise_weight=1.0)
    model = ALIGNNAtomWise(cfg=cfg, dtype=jnp.bfloat16)
    tx = build_optimizer("adamw", 1e-3, 1e-5)
    for bs in (32, 256):
        batch = jax.device_put(batches[bs])
        state = create_train_state(model, batch, tx)
        step = make_train_step(model, criterion="l1", donate=False)

        state, losses = step(state, batch)  # compile
        float(jax.device_get(losses["loss"]))
        t0 = time.perf_counter()
        for _ in range(10):
            state, losses = step(state, batch)
        float(jax.device_get(losses["loss"]))
        dt = (time.perf_counter() - t0) / 10
        print(json.dumps({"probe": f"F_full_b{bs}",
                          "ms": round(1e3 * dt, 1)}), flush=True)

        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        def fwd(b):
            out = model.apply(variables, b, b.r, train=False)
            return out["en_out"].sum()[None]

        fG = jax.jit(fwd)
        out = fG(batch)  # compile
        float(jax.device_get(out[0]))
        t0 = time.perf_counter()
        for _ in range(10):
            out = fG(batch)
        float(jax.device_get(out[0]))
        dt = (time.perf_counter() - t0) / 10
        print(json.dumps({"probe": f"F_fwd_b{bs}",
                          "ms": round(1e3 * dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
