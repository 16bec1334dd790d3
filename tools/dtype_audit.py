#!/usr/bin/env python
"""Audit the dtypes of L-sized streams in the lowered train step.

VERDICT r4 #7: the fp8 post-mortem attributed the HBM roofline to the
working/cotangent streams; this verifies from the lowered program that
the first- and second-order cotangent streams for the L-stage (the
[L, F] pair tensors — ~97% of traffic at flagship shapes) ride bf16
rather than f32.

Two modes:
  --stablehlo   (default) inspect the backend-independent lowering's
                logical intermediates on any host
  --optimized   AOT-compile for the attached backend (run on the TPU)
                and inspect the post-fusion buffers that actually hit
                HBM

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/dtype_audit.py
    PYTHONPATH=/root/repo:/root/.axon_site python tools/dtype_audit.py --optimized
"""

import argparse
import json
import re
import sys
from collections import defaultdict


def classify(hlo_text: str, l_dims, f_dim: int):
    """Histogram tensor types whose shape looks like an L-sized stream.

    `l_dims` — set of plausible L-space leading sizes (padded L for the
    sparse layout; n_pad*D and n_pad*D*D for the dense pair space).
    Matches both 2-D [L, F] and the dense 4-D [n, D, D, F] spellings.
    """
    counts = defaultdict(lambda: [0, 0])  # dtype -> [tensors, bytes]
    bytes_per = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8,
                 "f8E4M3FN": 1, "f8E5M2": 1}
    for m in re.finditer(r"tensor<([0-9x]+)x(f32|bf16|f16|f64|"
                         r"f8E4M3FN|f8E5M2)>", hlo_text):
        dims = [int(d) for d in m.group(1).split("x")]
        dt = m.group(2)
        if len(dims) < 2 or dims[-1] != f_dim:
            continue
        lead = 1
        for d in dims[:-1]:
            lead *= d
        if lead in l_dims:
            counts[dt][0] += 1
            counts[dt][1] += lead * f_dim * bytes_per[dt]
    # HLO text spelling (optimized mode): f32[a,b]{...}
    for m in re.finditer(r"\b(f32|bf16|f16|f64|f8e4m3fn|f8e5m2)\[([0-9,]+)\]",
                         hlo_text):
        dims = [int(d) for d in m.group(2).split(",") if d]
        dt = m.group(1).replace("f8e4m3fn", "f8E4M3FN").replace(
            "f8e5m2", "f8E5M2")
        if len(dims) < 2 or dims[-1] != f_dim:
            continue
        lead = 1
        for d in dims[:-1]:
            lead *= d
        if lead in l_dims:
            counts[dt][0] += 1
            counts[dt][1] += lead * f_dim * bytes_per[dt]
    return {k: {"tensors": v[0], "MB": round(v[1] / 1e6, 1)}
            for k, v in sorted(counts.items())}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--optimized", action="store_true",
                    help="AOT-compile for the attached backend and "
                         "audit post-fusion HLO (run on TPU)")
    ap.add_argument("--sparse", action="store_true",
                    help="audit the sparse layout instead of dense")
    ap.add_argument("--b", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_batch
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state, make_train_step

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=4, gcn_layers=4,
        hidden_features=256, embedding_features=64,
        gradwise_weight=10.0, stresswise_weight=0.1, graphwise_weight=1.0)
    model = ALIGNNAtomWise(cfg=cfg, dtype=jnp.bfloat16)
    batch = build_batch(batch_size=args.b, dense=not args.sparse)
    tx = build_optimizer("adamw", 1e-3, 1e-5)
    state = create_train_state(model, batch, tx)
    step = make_train_step(model, criterion="l1", donate=False)

    f = cfg.hidden_features
    l_dims = set()
    if getattr(batch, "dense_D", 0):
        n_pad = batch.z.shape[0]
        d = batch.dense_D
        l_dims |= {n_pad * d, n_pad * d * d}
        shapes = {"layout": "dense", "n_pad": n_pad, "D": d,
                  "pair_rows": n_pad * d * d}
    else:
        l_pad = batch.lg_src.shape[0]
        e_pad = batch.src.shape[0]
        l_dims |= {l_pad, e_pad}
        shapes = {"layout": "sparse", "L_pad": l_pad, "E_pad": e_pad}

    lowered = jax.jit(step).lower(state, batch)
    if args.optimized:
        compiled = lowered.compile()
        texts = [m.to_string() for m in compiled.runtime_executable()
                 .hlo_modules()] if hasattr(
            compiled, "runtime_executable") else [
            compiled.as_text()]
        text = "\n".join(texts)
        mode = "optimized"
    else:
        text = lowered.as_text()
        mode = "stablehlo"

    hist = classify(text, l_dims, f)
    out = {"mode": mode, **shapes, "F": f, "l_sized_streams": hist}
    print(json.dumps(out, indent=1))
    f32_mb = hist.get("f32", {}).get("MB", 0)
    bf16_mb = hist.get("bf16", {}).get("MB", 0)
    if f32_mb > 0.25 * max(bf16_mb, 1e-9):
        print(f"NOTE: substantial f32 L-sized traffic remains "
              f"({f32_mb} MB vs {bf16_mb} MB bf16)", file=sys.stderr)
    else:
        print("L-sized streams ride bf16 (f32 share "
              f"{f32_mb}/{f32_mb + bf16_mb} MB)", file=sys.stderr)


if __name__ == "__main__":
    main()
