"""TPU probe round 3: width-scaling laws for gather strategies.

Round-2 probe results (v5e via axon, batch 64, L=74240, E=6272):
stream 975 GB/s, matmul4096 100 TF/s, XLA gather ~0.8 ms at ANY dtype
(~11 ns/row -> latency/row-bound), one-hot matmul [L,512]@[512,256]
25.9 TF/s (N=256 too narrow), kernel-with-precomputed-oh 0.82 ms
(parity with XLA gather; the 1.56 ms full wrapper was dominated by the
unhoisted one-hot build).

This round measures what actually sets the cost:
  A. XLA gather vs feature width F (is it per-row latency or row-BW?)
  B. one-hot matmul TF/s vs output width N (does MXU scale with N?)
  C. 2 same-index gathers: separate vs one concat-table gather
  D. one-hot matmul vs K (window) at N=256

Usage: python -u -m tools.gather_probe2 [--batch 64] [--iters 50]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def timed(fn, *args):
    import jax

    out = fn(*args)
    float(jax.device_get(out))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jax.device_get(out))
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from bench import build_batch

    batch = build_batch(batch_size=args.batch)
    e_pad = batch.src.shape[0]
    idx = jnp.asarray(batch.lg_src)
    m = idx.shape[0]
    iters = args.iters
    rng = np.random.default_rng(0)
    print(json.dumps({"L": m, "E": e_pad}), flush=True)

    def chain(fn, x, iters):
        def body(carry, _):
            out = fn(x + carry.astype(x.dtype))
            return jnp.float32(out.reshape(-1)[0]), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    # A. XLA gather vs F
    for f in (128, 256, 512, 768, 1024):
        x = jnp.asarray(rng.normal(size=(e_pad, f)), jnp.bfloat16)
        fA = jax.jit(functools.partial(chain, lambda x: x[idx],
                                       iters=iters))
        dt = timed(fA, x)
        print(json.dumps({"probe": f"A_gather_F{f}",
                          "ms": round(1e3 * dt / iters, 3),
                          "ns_per_row": round(1e9 * dt / iters / m, 1)}),
              flush=True)

    # B. one-hot matmul vs N (K=512 window shape, M=L)
    k = 512
    oh = jnp.asarray(rng.integers(0, 2, size=(m, k)), jnp.bfloat16)
    for n in (128, 256, 512, 768, 1024):
        x = jnp.asarray(rng.normal(size=(e_pad, n)), jnp.bfloat16)

        def mm(x, n=n):
            return jax.lax.dot_general(
                oh, x[:k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        fB = jax.jit(functools.partial(chain, mm, iters=iters))
        dt = timed(fB, x)
        gf = 2 * m * k * n / 1e9
        print(json.dumps({"probe": f"B_ohmm_N{n}",
                          "ms": round(1e3 * dt / iters, 3),
                          "TFs": round(gf / (dt / iters) / 1e3, 1)}),
              flush=True)

    # C. two same-index gathers: separate vs concat table
    f = 256
    xa = jnp.asarray(rng.normal(size=(e_pad, f)), jnp.bfloat16)
    xb = jnp.asarray(rng.normal(size=(e_pad, f)), jnp.bfloat16)

    def two_sep(x):
        return x[idx] + xb[idx]          # two gathers, same idx

    xcat = jnp.concatenate([xa, xb], axis=1)

    def one_cat(x):
        g = x[idx]                       # one [L, 2F] gather
        return g[:, :f] + g[:, f:]

    fC1 = jax.jit(functools.partial(chain, two_sep, iters=iters))
    dt1 = timed(fC1, xa)
    fC2 = jax.jit(functools.partial(chain, one_cat, iters=iters))
    dt2 = timed(fC2, xcat)
    print(json.dumps({"probe": "C_two_separate_gathers_F256",
                      "ms": round(1e3 * dt1 / iters, 3)}), flush=True)
    print(json.dumps({"probe": "C_one_concat_gather_2xF256",
                      "ms": round(1e3 * dt2 / iters, 3)}), flush=True)

    # D. one-hot matmul vs K at N=256
    for k2 in (128, 256, 512):
        oh2 = jnp.asarray(rng.integers(0, 2, size=(m, k2)), jnp.bfloat16)
        x = jnp.asarray(rng.normal(size=(e_pad, 256)), jnp.bfloat16)

        def mm2(x, k2=k2, oh2=oh2):
            return jax.lax.dot_general(
                oh2, x[:k2], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        fD = jax.jit(functools.partial(chain, mm2, iters=iters))
        dt = timed(fD, x)
        print(json.dumps({"probe": f"D_ohmm_K{k2}_N256",
                          "ms": round(1e3 * dt / iters, 3)}), flush=True)


if __name__ == "__main__":
    main()
