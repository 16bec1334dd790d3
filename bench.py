"""Throughput benchmark: full FF training step, edges/s on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The workload is the flagship ALIGNN-FF configuration (4 ALIGNN + 4 GCN
layers, 256 hidden — reference models/alignn.py:19-32 scale) with
energy+force+stress heads, i.e. forward + grad-of-grad backward, on a
realistic padded batch.  `vs_baseline` compares against a DGL/torch-CPU
measurement recorded in BASELINE.json terms; the reference publishes no
throughput numbers (BASELINE.md), so the baseline constant below was
measured by running the reference's train step shape on this machine's
host CPU (documented in BENCH_NOTES.md).
"""

import json
import os
import sys
import time

import numpy as np


def env_on(name: str) -> bool:
    """Truthy env knob: unset, empty, and '0' all mean OFF.

    bool(os.environ.get(...)) treats '0' as ON, which silently turns a
    scripted `for v in 0 1` A/B sweep into two identical arms.
    """
    return os.environ.get(name, "") not in ("", "0")


# edges+line-graph-edges per second, reference-equivalent torch path on
# this machine's CPU: tools/baseline_torch.py measured 3956 edges/s
# (see BENCH_NOTES.md for the recipe and caveats)
BASELINE_EDGES_PER_S = 3.96e3


def build_largecell_batch(batch_size=2, seed=0, lg_cutoff=None):
    """mlearn-shaped leg (VERDICT r3 #6): 108-atom cells, radius graph
    cutoff 5, sparse layout — the reference's canonical FF-training
    recipe (examples/sample_data_ff/mlearn_data/Si/config.json shape,
    radius_graph as in its config_example) and the regime where the
    dense layout measured SLOWER (BENCH_NOTES md_jit A/B), so the perf
    record covers the production envelope, not only the k-NN sweet
    spot."""
    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs

    rng = np.random.default_rng(seed)
    fcc = np.array([[0, 0, 0], [0.5, 0.5, 0],
                    [0.5, 0, 0.5], [0, 0.5, 0.5]])
    graphs = []
    for i in range(batch_size):
        base = Atoms(lattice_mat=np.eye(3) * 4.05, frac_coords=fcc,
                     elements=["Al"] * 4).make_supercell((3, 3, 3))
        frac = base.frac_coords + 0.02 * rng.standard_normal(
            base.frac_coords.shape)
        atoms = Atoms(lattice_mat=base.lattice_mat, frac_coords=frac,
                      elements=base.elements)
        g = build_graph(atoms, neighbor_strategy="radius_graph",
                        cutoff=5.0, lg_cutoff=lg_cutoff)
        n = len(atoms.elements)
        g.target = np.array([rng.standard_normal()])
        g.forces = rng.standard_normal((n, 3)) * 0.1
        g.stress = np.eye(3) * 0.01
        graphs.append(g)
    return batch_graphs(graphs, BucketSpec.tight_for_batch(graphs),
                        target_width=1)


def build_batch(batch_size=32, seed=0, dense=False):
    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs

    rng = np.random.default_rng(seed)
    graphs = []
    elems = ["Na", "Cl", "K", "Br", "Mg", "O", "Ca", "S"]
    for i in range(batch_size):
        a = 4.2 + 0.3 * rng.standard_normal()
        # 8-atom rocksalt supercell-ish cell
        base = np.array([
            [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
            [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5]])
        frac = base + 0.02 * rng.standard_normal((8, 3))
        atoms = Atoms(lattice_mat=np.eye(3) * a, frac_coords=frac,
                      elements=[elems[j % len(elems)] for j in range(8)])
        g = build_graph(atoms, cutoff=8.0, max_neighbors=12)
        g.target = np.array([rng.standard_normal()])
        g.forces = rng.standard_normal((8, 3)) * 0.1
        g.stress = np.eye(3) * 0.01
        graphs.append(g)
    if dense:
        from alignn_tpu.graph.dense import (
            dense_batch_graphs, dense_spec_for_batch)

        return dense_batch_graphs(graphs, dense_spec_for_batch(graphs),
                                  target_width=1)
    spec = BucketSpec.tight_for_batch(graphs)
    return batch_graphs(graphs, spec, target_width=1)


def main():
    import jax
    import jax.numpy as jnp

    # Readiness probe with retry: one transient axon-backend UNAVAILABLE
    # at first dispatch cost round 2 its driver perf record (BENCH_r02
    # rc=1), and round 3 observed *hung* inits.  A killable subprocess
    # probe bounds each attempt; only then touch the device in-process.
    from alignn_tpu.backend_retry import (
        ProbesExhausted, probe_devices, probe_devices_subprocess,
        retry_transient)

    _log = lambda m: print(f"# bench: {m}", file=sys.stderr)  # noqa: E731
    try:
        retry_transient(probe_devices_subprocess, attempts=3, log=_log)
        retry_transient(probe_devices, log=_log)
    except Exception as e:  # noqa: BLE001 — the cycle already retried
        from alignn_tpu.backend_retry import is_transient

        # Only a TRANSIENT failure that survived the full cycle counts
        # as "probes exhausted" (reported transient, worth re-running);
        # a persistent error (bad plugin, import failure) must propagate
        # as-is so the error JSON carries transient=false and the driver
        # doesn't loop on a dead config.
        if is_transient(e):
            raise ProbesExhausted(
                f"backend unavailable after full probe retry cycle: "
                f"{type(e).__name__}: {e}") from e
        raise

    # Persistent compile cache: only compile TIME is cached (entries
    # key on exact HLO+compiler version), measured step timings are
    # unaffected; repeat driver runs skip the minutes-long tunnel
    # compile of the train step.
    from alignn_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state, make_train_step

    # batch-size + remat knobs for capacity A/Bs: the b256 compiled step
    # temps at ~19 GB (> v5e's 16 GB HBM; BENCH_NOTES round 3), so large
    # batches sit on the HBM-capacity cliff where per-layer remat —
    # measured slower at b64 — may flip to a win.
    bench_b = int(os.environ.get("ALIGNN_TPU_BENCH_B", "64"))
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=4, gcn_layers=4,
        hidden_features=256, embedding_features=64,
        gradwise_weight=10.0, stresswise_weight=0.1,
        graphwise_weight=1.0,
        remat_layers=env_on("ALIGNN_TPU_BENCH_REMAT"))
    # mixed precision: bf16 matmul/stream dtype, f32 params + f32 MXU
    # accumulation.  Training-loss trajectories match f32 step-for-step
    # on this workload (BENCH_NOTES.md); set ALIGNN_TPU_BENCH_F32=1 to
    # measure the full-f32 path.
    dtype = None if env_on("ALIGNN_TPU_BENCH_F32") else jnp.bfloat16
    model = ALIGNNAtomWise(cfg=cfg, dtype=dtype)
    # batch 64 = the reference's default training batch size.  Default
    # execution layout is dense neighborhoods (graph/dense.py): the
    # honest device sweep (BENCH_NOTES.md "Dense-neighborhood layout on
    # device") measured b64 44.6 ms vs 49.1 sparse, and b256 212 vs 288
    # — the dense layout removes the L-stage gathers and tames the
    # super-linear batch growth.  ALIGNN_TPU_BENCH_SPARSE=1 runs the
    # sparse (sorted-segment / Pallas one-hot) path instead.
    dense = not env_on("ALIGNN_TPU_BENCH_SPARSE")
    largecell = env_on("ALIGNN_TPU_BENCH_LARGECELL")
    if largecell:
        # large-cell / radius-graph production-envelope leg: 108-atom
        # cells, radius cutoff 5, SPARSE layout (see
        # build_largecell_batch); batch via ALIGNN_TPU_BENCH_B
        # (default 2 mirrors the mlearn per-step cell count at bs=5's
        # per-bucket scale — override for capacity sweeps)
        # ALIGNN_TPU_BENCH_LG_CUTOFF=<A> prunes L(g) to short-bond
        # pairs (graph/build.py lg_cutoff) — the round-5 large-cell
        # lever (L drops to ~15% at 3.5 A on this shape)
        lgc = os.environ.get("ALIGNN_TPU_BENCH_LG_CUTOFF")
        batch = build_largecell_batch(
            batch_size=int(os.environ.get("ALIGNN_TPU_BENCH_B", "2")),
            lg_cutoff=float(lgc) if lgc else None)
    else:
        batch = build_batch(batch_size=bench_b, dense=dense)
    tx = build_optimizer("adamw", 1e-3, 1e-5)
    state = create_train_state(model, batch, tx)
    if env_on("ALIGNN_TPU_BENCH_FJVP"):
        # forward-over-reverse research step — measured SLOWER (+19%
        # flops; train/fjvp.py docstring + BENCH_NOTES round 3); flag
        # kept for device A/B verification. Requires the XLA path
        # (custom-VJP Pallas kernels block jvp), so combine with
        # ALIGNN_TPU_DISABLE_PALLAS=1 on sparse layouts.
        from alignn_tpu.train.fjvp import make_train_step_fjvp

        step = make_train_step_fjvp(model, criterion="l1", donate=False)
    else:
        step = make_train_step(model, criterion="l1", donate=False)

    # REAL (unpadded) edges + L-edges — comparable across layouts and
    # against the torch-CPU baseline, which also counts real edges.
    n_edges = int(np.asarray(batch.edge_mask).sum()
                  + np.asarray(batch.lg_mask).sum())

    # warmup / compile (device_get = hard fence; on the axon remote
    # backend block_until_ready can return before execution completes,
    # which inflated early round measurements — BENCH_NOTES.md round 2)
    state, losses = step(state, batch)
    float(jax.device_get(losses["loss"]))

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, batch)
    float(jax.device_get(losses["loss"]))
    dt = time.perf_counter() - t0
    edges_per_s = n_edges * iters / dt

    # --- MFU accounting (VERDICT r1 #6): XLA's own per-step FLOP count
    # over the chip's peak.  Pallas kernels appear to XLA as custom calls
    # with zero FLOPs, so this is a LOWER bound on true MFU; the fused
    # aggregation matmuls add ~2*(E+L)*128*2F flops per invocation on
    # top (methodology + hand count in BENCH_NOTES.md).
    mfu = None
    step_flops = None
    try:
        compiled = jax.jit(step, donate_argnums=()).lower(
            state, batch).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        step_flops = float(ca.get("flops", 0.0))
        kind = jax.devices()[0].device_kind.lower()
        # dense bf16 peak FLOP/s per chip (f32 is half on v4/v5)
        peaks = {"v4": 275e12, "v5 lite": 197e12, "v5e": 197e12,
                 "v5p": 459e12, "v6 lite": 918e12, "v6e": 918e12}
        peak = next((v for k, v in peaks.items() if k in kind), 197e12)
        if step_flops > 0:
            mfu = (step_flops * iters / dt) / peak
    except Exception:
        pass

    out = {
        "metric": "train_step_edges_per_s",
        "value": float(edges_per_s),
        "unit": "edges/s/chip (g + L(g), fwd+bwd incl. force grad)",
        "vs_baseline": float(edges_per_s / BASELINE_EDGES_PER_S),
        "mfu_lower_bound": None if mfu is None else round(mfu, 4),
        "xla_flops_per_step": step_flops,
    }
    if largecell:
        out["workload"] = "largecell_radius5_108atom_sparse"
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        from alignn_tpu.backend_retry import (
            ProbesExhausted, is_transient, retry_transient)

        # Retry the whole workload for MID-RUN transients (post-probe);
        # ProbesExhausted is excluded from retry (is_transient: False),
        # so a dead backend fails once, bounded — not attempts^2 probes.
        retry_transient(main, attempts=3,
                        log=lambda m: print(f"# bench: {m}",
                                            file=sys.stderr))
    except Exception as e:  # noqa: BLE001 — structured error, not traceback
        print(json.dumps({
            "metric": "train_step_edges_per_s",
            "value": None,
            "unit": "edges/s/chip (g + L(g), fwd+bwd incl. force grad)",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}",
            "transient": (is_transient(e)
                          or isinstance(e, ProbesExhausted)),
        }))
        sys.exit(1)
