"""TPU microbench: windowed one-hot gather vs XLA dynamic gather.

Validates ops/pallas_gather on real hardware (Mosaic acceptance +
numeric parity vs `x[idx]`) and measures throughput at bench scale,
under honest fencing: K gathers chained through a scalar carry inside
ONE jit (no per-call dispatch; the carry defeats CSE/hoisting), fenced
by a terminal `jax.device_get`.

Usage: python -u -m tools.gather_bench [--batch 64] [--iters 50]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def timed(fn, *args):
    import jax

    out = fn(*args)
    float(jax.device_get(out))  # compile + fence
    t0 = time.perf_counter()
    out = fn(*args)
    res = float(jax.device_get(out))
    dt = time.perf_counter() - t0
    return dt, res


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from bench import build_batch
    from alignn_tpu.ops.pallas_gather import (
        _windowed_gather_impl, window_for, windowed_gather)

    batch = build_batch(batch_size=args.batch)
    e_pad = batch.src.shape[0]
    l_pad = batch.lg_src.shape[0]
    n_pad = batch.z.shape[0]
    f = 256
    rng = np.random.default_rng(0)
    x_e = rng.normal(size=(e_pad, f)).astype(np.float32)

    w_lg_src = window_for(batch.lg_src, e_pad - 1)
    w_lg_dst = window_for(batch.lg_dst, e_pad - 1)
    w_src = window_for(batch.src, n_pad - 1)
    print(json.dumps({"shapes": {"E": e_pad, "L": l_pad, "N": n_pad},
                      "windows": {"lg_src": w_lg_src, "lg_dst": w_lg_dst,
                                  "src": w_src}}), flush=True)

    # ---- numeric parity on the real chip (Mosaic path) ----
    for dtype, tol in ((jnp.float32, 1e-6), (jnp.bfloat16, 0.0)):
        xd = jnp.asarray(x_e, dtype)
        got = np.asarray(
            windowed_gather(xd, jnp.asarray(batch.lg_src), w_lg_src)
        ).astype(np.float32)
        ref = np.asarray(xd)[batch.lg_src].astype(np.float32)
        real = batch.lg_src != e_pad - 1
        err = np.abs(got[real] - ref[real]).max()
        denom = np.abs(ref[real]).max()
        ok = bool(err <= tol * denom) if tol else bool(err == 0)
        print(json.dumps({"parity": str(jnp.dtype(dtype)),
                          "max_abs_err_real_rows": float(err),
                          "trash_rows_zero":
                          bool((got[~real] == 0).all()),
                          "ok": ok}), flush=True)

    # ---- throughput: K chained gathers in one jit ----
    def chain(gather_fn, x, idx, iters):
        def body(carry, _):
            out = gather_fn(x + carry, idx)
            return jnp.float32(out[0, 0]), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    idx_lg = jnp.asarray(batch.lg_src)
    idx_lgd = jnp.asarray(batch.lg_dst)
    mb_out = l_pad * f
    for name, idx_arr, w in (("lg_src", idx_lg, w_lg_src),
                             ("lg_dst(sorted)", idx_lgd, w_lg_dst)):
        for dtype in (jnp.bfloat16, jnp.float32):
            xd = jnp.asarray(x_e, dtype)
            bytes_out = mb_out * xd.dtype.itemsize

            xla_fn = jax.jit(functools.partial(
                chain, lambda x, i: x[i], iters=args.iters))
            dt_xla, _ = timed(xla_fn, xd, idx_arr)

            win_fn = jax.jit(functools.partial(
                chain,
                lambda x, i: _windowed_gather_impl(x, i, w, False),
                iters=args.iters))
            dt_win, _ = timed(win_fn, xd, idx_arr)

            print(json.dumps({
                "gather": name, "dtype": str(jnp.dtype(dtype)),
                "window": w,
                "xla_ms_per_pass": round(1e3 * dt_xla / args.iters, 3),
                "windowed_ms_per_pass":
                    round(1e3 * dt_win / args.iters, 3),
                "speedup": round(dt_xla / dt_win, 2),
                "out_GB_per_s_windowed":
                    round(bytes_out * args.iters / dt_win / 1e9, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
