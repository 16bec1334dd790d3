"""TPU probe: where does the windowed-gather kernel spend its time?

gather_bench showed the v3 kernel bit-exact but 0.5-0.87x vs the XLA
dynamic gather.  First probe round found the real story: the SAME-FLOPs
plain XLA matmul ([L,512]@[512,256] bf16) also runs at ~0.75 ms
(~26 TF/s, ~150 GB/s effective) — i.e. at these shapes both the
dynamic gather and the one-hot matmul appear pinned at ~150 GB/s, far
under the v5e HBM spec (~819 GB/s).  This round calibrates the chip's
actual rooflines (sequential stream, compute-bound matmul) and fixes a
probe bug (the chain carry promoted bf16 operands to f32).

All probes run in ONE process (the remote compile service degrades).

Usage: python -u -m tools.gather_probe [--batch 64] [--iters 50]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


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
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from bench import build_batch
    from alignn_tpu.ops import pallas_gather as pg

    batch = build_batch(batch_size=args.batch)
    e_pad = batch.src.shape[0]
    idx = jnp.asarray(batch.lg_src)
    m = idx.shape[0]
    f = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(e_pad, f)), jnp.bfloat16)
    w = pg.window_for(batch.lg_src, e_pad - 1)
    iters = args.iters
    print(json.dumps({"L": m, "E": e_pad, "window": w}), flush=True)

    def chain(fn, x, iters):
        # carry cast to x.dtype: keeps the pass at the operand dtype
        # (f32 carry silently promoted everything in probe round 1)
        def body(carry, _):
            out = fn(x + carry.astype(x.dtype))
            return jnp.float32(out.reshape(-1)[0]), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    # -- calibration: sequential-stream bandwidth --------------------------
    big = jnp.asarray(rng.normal(size=(64 * 1024 * 1024,)), jnp.float32)

    def stream(x):  # read 256 MB, write 256 MB
        return x * jnp.float32(1.0000001)

    fS = jax.jit(functools.partial(chain, stream, iters=iters))
    dtS, _ = timed(fS, big)
    gb = 2 * big.nbytes / 1e9
    print(json.dumps({"probe": "S_stream_copy_256MB",
                      "ms": round(1e3 * dtS / iters, 3),
                      "GBs": round(gb / (dtS / iters), 1)}), flush=True)

    def reduce(x):  # read 256 MB, write ~nothing
        return x.reshape(-1, 1024).sum(axis=0, keepdims=True)

    fR = jax.jit(functools.partial(chain, reduce, iters=iters))
    dtR, _ = timed(fR, big)
    print(json.dumps({"probe": "R_stream_reduce_256MB",
                      "ms": round(1e3 * dtR / iters, 3),
                      "GBs": round(big.nbytes / 1e9 / (dtR / iters), 1)}),
          flush=True)

    # -- calibration: compute-bound matmul ---------------------------------
    a4 = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.bfloat16)

    def mm4(x):
        return jax.lax.dot_general(
            x, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    fM = jax.jit(functools.partial(chain, mm4, iters=iters))
    dtM, _ = timed(fM, a4)
    gf4 = 2 * 4096**3 / 1e9
    print(json.dumps({"probe": "M_matmul_4096",
                      "ms": round(1e3 * dtM / iters, 3),
                      "TFs": round(gf4 / (dtM / iters) / 1e3, 1)}),
          flush=True)

    # -- A. XLA gather at both dtypes --------------------------------------
    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        xd = x.astype(dt)
        fA = jax.jit(functools.partial(chain, lambda x: x[idx],
                                       iters=iters))
        dtA, _ = timed(fA, xd)
        out_gb = (m * f * xd.dtype.itemsize
                  + e_pad * f * xd.dtype.itemsize) / 1e9
        print(json.dumps({"probe": f"A_xla_gather_{dt_name}",
                          "ms": round(1e3 * dtA / iters, 3),
                          "GBs_mintraffic":
                          round(out_gb / (dtA / iters), 1)}), flush=True)

    # -- B. same-FLOPs matmul (one-hot-shaped, A operand from HBM) ---------
    ohB = jnp.asarray(rng.integers(0, 2, size=(m, w)), jnp.bfloat16)

    def mm(x):
        return jax.lax.dot_general(
            ohB, x[:w], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    fB = jax.jit(functools.partial(chain, mm, iters=iters))
    dtB, _ = timed(fB, x)
    gf = 2 * m * w * f / 1e9
    print(json.dumps({"probe": "B_xla_matmul_same_flops",
                      "ms": round(1e3 * dtB / iters, 3),
                      "TFs": round(gf / (dtB / iters) / 1e3, 1),
                      "GBs_A_read":
                      round(ohB.nbytes / 1e9 / (dtB / iters), 1)}),
          flush=True)

    # -- kernel variants ---------------------------------------------------
    def prep(tls):
        num_tiles = m // tls
        trash = e_pad - 1
        t = np.asarray(idx).reshape(num_tiles, tls)
        real = t != trash
        lo = np.where(real, t, e_pad).min(axis=1)
        base = np.where(lo >= e_pad, 0, (lo // pg._ALIGN) * pg._ALIGN
                        ).astype(np.int32)
        local = t - base[:, None]
        oh = jax.nn.one_hot(
            jnp.asarray(np.where(real, local, -1).reshape(m)), w,
            dtype=jnp.int8)
        return jnp.asarray(base), oh

    def call_kernel(base, oh, x_p, tls):
        num_tiles = m // tls
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((tls, w), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (tls, f), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, w, f), x_p.dtype),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            pg._gather_kernel,
            out_shape=jax.ShapeDtypeStruct((m, f), x_p.dtype),
            grid_spec=grid_spec,
        )(base, oh, x_p)

    for name, tls, zero_base in (("C_kernel_pre_oh_tls512", 512, False),
                                 ("D_kernel_zero_base_tls512", 512, True),
                                 ("E_kernel_pre_oh_tls256", 256, False),
                                 ("E_kernel_pre_oh_tls128", 128, False)):
        base, oh = prep(tls)
        if zero_base:
            base = jnp.zeros_like(base)

        def kfn(x_p, base=base, oh=oh, tls=tls):
            return call_kernel(base, oh, x_p, tls)

        x_p0 = jnp.pad(x, ((0, w), (0, 0)))
        fK = jax.jit(functools.partial(chain, kfn, iters=iters))
        dtK, _ = timed(fK, x_p0)
        print(json.dumps({"probe": name,
                          "ms": round(1e3 * dtK / iters, 3)}), flush=True)

    # -- F. full wrapper, correct dtype ------------------------------------
    fF = jax.jit(functools.partial(
        chain, lambda x: pg._windowed_gather_impl(x, idx, w, False),
        iters=iters))
    dtF, _ = timed(fF, x)
    print(json.dumps({"probe": "F_full_wrapper_bf16",
                      "ms": round(1e3 * dtF / iters, 3)}), flush=True)


if __name__ == "__main__":
    main()
