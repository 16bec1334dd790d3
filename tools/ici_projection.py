#!/usr/bin/env python
"""ICI-bandwidth cost model for GP ring scaling (VERDICT r2 #3).

Real multi-chip ICI is unavailable in this environment (one tunneled
chip), so the >=80% scaling-efficiency target (BASELINE.json) is argued
as a *quantified projection*: measured single-chip step time + exact
wire bytes from the compiled SPMD module + public ICI link bandwidths.

Model (per training step, ring on ONE torus axis):

  T_comp(D)   = T1 / D                  [edge space is partitioned in
                                         equal static pads; the ring's
                                         per-step groups sum to the same
                                         total L work]
  ring bytes  = audited exactly by alignn_tpu/parallel/hlo_audit (tests/
                test_ring_overlap.py pins permute bytes == analytic
                (D-1) * E/D * 2F * dtype per L-stage, mirrored in the
                transpose pass) — per chip per direction.
  psum bytes  = ring all-reduce cost 2*(D-1)/D * payload per chip; the
                node-stage psums are [N, F] f32 per EGGC (fwd + bwd),
                plus small head reductions.

Exposure assumptions (from the audited dependency structure):
  - FORWARD ring permutes are within-stage scatter-free (audited) ->
    XLA's latency-hiding scheduler can run them under the local
    aggregation; exposed = max(0, t_wire - t_overlap_window) where the
    window is the forward L-stage compute share of the step.
  - REVERSE L-stage rings are accumulate-and-forward (audited: payload
    contains the local scatter-add) -> fully exposed. Conservative: the
    per-step local VJP compute could still hide part of it.
  - psum all-reduces: fully exposed (conservative).

ICI link bandwidths (public "How to Scale Your Model" / TPU docs):
  v5e: 2D torus, ~45 GB/s per link per direction
  v5p: 3D torus, ~90 GB/s per link per direction (only ONE axis is
       charged for the ring; the other axes stay free for dp/other)

Single-chip anchor: the driver-benched E/F/S train step (BENCH_NOTES
round 2): 44.2 ms at b64 (8-atom rocksalt, k-NN 12, 4+4 layers, h=256,
bf16 operands) = ~1.7M (g+L) edges/s; forward share 6.3/44.2 = 14.3%.

Usage:
  python tools/ici_projection.py                      # analytic bytes
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/ici_projection.py --audit          # + exact-HLO check
"""

import argparse
import json
import os
import sys

# allow bare `python tools/ici_projection.py` (sys.path[0] is tools/)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

GB = 1e9


def analytic_bytes(d, e_pad, n_nodes, n_graphs, hidden, alignn_layers,
                   gcn_layers, buf_bytes=2, ring="chain"):
    """Per-chip wire bytes per train step (fwd+bwd) for the GP mode.

    buf_bytes: ring payload dtype (bf16 operands on TPU = 2).
    ring="gather": the gather-then-reduce reverse
    (ALIGNN_TPU_GP_RING=gather, parallel/gp_model.ring_broadcast) —
    reverse payload bytes are unchanged (D-1 permutes of the same
    buffer) but each shift-k permute rides min(k, D-k) physical links
    on a bidirectional torus axis, so reverse LINK-bytes scale by
    sum_k min(k, D-k) / (D-1) (2.29x at D=8) — the price of making the
    hops independent/overlappable."""
    from alignn_tpu.parallel.hlo_audit import expected_ring_bytes

    # ring terms from the test-pinned model (tests/test_ring_overlap.py)
    ring_fwd = expected_ring_bytes(
        d, e_pad, hidden, dtype_bytes=buf_bytes,
        alignn_layers=alignn_layers)["forward_total"]
    ring_bwd = ring_fwd                                # transpose mirrors
    if ring == "gather":
        hop_factor = sum(min(k, d - k) for k in range(1, d)) / (d - 1)
        ring_bwd = ring_fwd * hop_factor
    # node-stage psums: packed [N, 2F] (num+den) f32 per EGGC node
    # update, fwd + bwd (payload audited: 17 all-reduces / 21.0 MB at
    # 4+4/256 — matches)
    n_psums = 2 * (alignn_layers + gcn_layers)
    psum_payload = n_psums * n_nodes * 2 * hidden * 4 \
        + n_nodes * 3 * 4 + n_graphs * 9 * 4           # forces + stress
    ar = 2 * (d - 1) / d * psum_payload                # ring all-reduce
    return {"ring_fwd": ring_fwd, "ring_bwd": ring_bwd, "all_reduce": ar,
            "total": ring_fwd + ring_bwd + ar, "ring": ring}


def project(d, t1_s, wire, bw_gbps, fwd_frac=0.143, overlap=True):
    t_comp = t1_s / d
    bw = bw_gbps * GB
    t_fwd = wire["ring_fwd"] / bw
    t_bwd = wire["ring_bwd"] / bw
    t_ar = wire["all_reduce"] / bw
    if overlap:
        window = fwd_frac * t_comp          # forward L-stage compute
        if wire.get("ring") == "gather":
            # gather reverse: hops are chain-free (pinned by
            # tests/test_ring_gather.py) -> the scheduler can hide them
            # under the reverse L-stage compute, which is >= the
            # forward share; charge the same conservative window
            exposed = (max(0.0, t_fwd - window)
                       + max(0.0, t_bwd - window) + t_ar)
        else:
            # chain reverse: accumulate-and-forward, fully exposed
            exposed = max(0.0, t_fwd - window) + t_bwd + t_ar
    else:
        exposed = t_fwd + t_bwd + t_ar
    t_step = t_comp + exposed
    return {"t_comp_ms": t_comp * 1e3, "t_wire_ms":
            (t_fwd + t_bwd + t_ar) * 1e3, "exposed_ms": exposed * 1e3,
            "t_step_ms": t_step * 1e3,
            "efficiency": t_comp / t_step}


def build_recipe_batch(n_graphs):
    """The bench recipe batch + its edge/node counts (built ONCE in
    main and passed to every audit — the k-NN build is seconds)."""
    from tools.gp_sweep import build_batch

    batch = build_batch(n_graphs)
    counts = {"e_pad": int(batch.src.shape[0]),
              "l_pad": int(batch.lg_src.shape[0]),
              "n_nodes": int(batch.z.shape[0]),
              "n_graphs": int(batch.graph_mask.shape[0])}
    return batch, counts


def _gp_compiled_text(mesh, cfg, variables, batch, ring, d):
    """Lower + compile the GP per-device module on `mesh` and return
    the executable text (shared by the CPU byte audit and the AOT TPU
    schedule audit — one copy of the lowering recipe)."""
    import jax
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from alignn_tpu.parallel.graph_parallel import (
        GRAPH_AXIS, batch_specs, gp_device_outputs, ring_specs)
    from alignn_tpu.parallel.gp_model import GPALIGNNAtomWise

    gpm = GPALIGNNAtomWise(cfg=cfg, axis_name=GRAPH_AXIS)

    def per_device(b, rg):
        o, f, s, _ = gp_device_outputs(gpm, cfg, variables, b, rg, d)
        return o, f, s

    return jax.jit(shard_map(
        per_device, mesh=mesh,
        in_specs=(batch_specs(batch), ring_specs(ring)),
        out_specs=(P(), P(), P()), check_rep=False)
    ).lower(batch, ring).compile().as_text()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--graphs", type=int, default=64,
                   help="bench recipe batch size")
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--alignn-layers", type=int, default=4)
    p.add_argument("--gcn-layers", type=int, default=4)
    p.add_argument("--rate", type=float, default=1.7e6,
                   help="measured single-chip train-step (g+L) edges/s")
    p.add_argument("--fwd-frac", type=float, default=0.143,
                   help="forward share of the step (measured 6.3/44.2)")
    p.add_argument("--audit", action="store_true",
                   help="cross-check ring bytes against compiled HLO "
                        "(needs the 8-device CPU mesh env)")
    p.add_argument("--dp", action="store_true",
                   help="also project DP weak scaling (grad all-reduce "
                        "bytes from the compiled DP step; needs the "
                        "8-device CPU mesh env)")
    p.add_argument("--tpu_topology", default=None, metavar="NAME",
                   help="AOT-compile the GP module against an abstract "
                        "TPU topology (e.g. v5e:2x4) and audit the "
                        "POST-SCHEDULING HLO: async permute start/done "
                        "placement = the real overlap evidence (needs "
                        "the TPU plugin, not real chips)")
    p.add_argument("--dense", action="store_true",
                   help="audit the halo dense-GP mode "
                        "(parallel/dense_gp.py) instead: wire bytes vs "
                        "the analytic halo model + sparse-ring "
                        "comparison; with --tpu_topology also the "
                        "post-scheduling window audit")
    p.add_argument("--ring", default="chain",
                   choices=["chain", "gather"],
                   help="reverse-ring structure for the audited sparse "
                        "GP module (ALIGNN_TPU_GP_RING; see "
                        "parallel/gp_model.ring_mode)")
    p.add_argument("--supercell", type=int, default=0, metavar="N",
                   help="with --dense: ONE NxNx N rocksalt supercell "
                        "(8N^3 atoms) instead of --graphs small cells "
                        "— exercises a real (non-empty) halo")
    args = p.parse_args()

    batch, counts = build_recipe_batch(args.graphs)
    edges = counts["e_pad"] + counts["l_pad"]
    t1 = edges / args.rate
    print(json.dumps({"recipe": counts, "t1_ms": round(t1 * 1e3, 2),
                      "anchor_rate_edges_per_s": args.rate}))

    platforms = {"v5e": 45.0, "v5p": 90.0}
    rows = []
    for d in (2, 4, 8, 16):
        for ring in ("chain", "gather"):
            wire = analytic_bytes(d, counts["e_pad"], counts["n_nodes"],
                                  counts["n_graphs"], args.hidden,
                                  args.alignn_layers, args.gcn_layers,
                                  ring=ring)
            for plat, bw in platforms.items():
                for overlap in (True, False):
                    r = project(d, t1, wire, bw, args.fwd_frac, overlap)
                    rows.append({"platform": plat, "devices": d,
                                 "ring": ring, "overlap": overlap,
                                 "wire_mb_per_chip": round(
                                     wire["total"] / 1e6, 2),
                                 **{k: round(v, 4)
                                    for k, v in r.items()}})
    for row in rows:
        print(json.dumps(row))

    # headline: the target claim with assumptions met (select by key —
    # positional indexing would silently swap on a loop-order change)
    v5p8 = [r for r in rows if r["platform"] == "v5p"
            and r["devices"] == 8]
    print(json.dumps({
        "claim": ">=80% GP scaling efficiency at D=8 on v5p",
        "projected_overlapped": next(
            r["efficiency"] for r in v5p8
            if r["overlap"] and r["ring"] == "chain"),
        "projected_overlapped_gather_ring": next(
            r["efficiency"] for r in v5p8
            if r["overlap"] and r["ring"] == "gather"),
        "projected_serialized": next(
            r["efficiency"] for r in v5p8
            if not r["overlap"] and r["ring"] == "chain"),
        "assumptions": [
            "single-chip anchor 44.2 ms / 1.7M edges/s (device-measured)",
            "ring rides ONE v5p torus axis at 90 GB/s/dir",
            "fwd ring overlaps (audited scatter-free), reverse + psum "
            "fully exposed (conservative)",
            "wire bytes pinned exact by tests/test_ring_overlap.py"],
    }))

    if args.audit:
        _audit(batch, counts, args)
    if args.dp:
        _dp_projection(args, t1)
    if args.tpu_topology:
        _tpu_schedule_audit(batch, counts, args)
    if args.dense:
        _dense_halo_audit(args)


def _gp_cfg(args):
    from alignn_tpu.nn.models import ALIGNNAtomWiseConfig

    return ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=args.alignn_layers,
        gcn_layers=args.gcn_layers, hidden_features=args.hidden,
        embedding_features=64, gradwise_weight=1.0, stresswise_weight=0.1)


def _audit(batch, counts, args):
    """Exact-HLO cross-check of the analytic ring bytes at D=8 (CPU)."""
    from alignn_tpu.nn.models import ALIGNNAtomWise
    from alignn_tpu.parallel.gp_batch import make_ring_index
    from alignn_tpu.parallel.graph_parallel import (GRAPH_AXIS,
                                                    check_divisible)
    from alignn_tpu.parallel.hlo_audit import audit_collectives
    from alignn_tpu.parallel.mesh import make_mesh
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state

    d = 8
    check_divisible(batch, d)
    cfg = _gp_cfg(args)
    model = ALIGNNAtomWise(cfg=cfg)
    state = create_train_state(model, batch,
                               build_optimizer("adamw", 1e-3, 0.0))
    ring = make_ring_index(batch, d)
    mesh = make_mesh(d, axis_names=(GRAPH_AXIS,))
    text = _gp_compiled_text(mesh, cfg, state.variables(), batch, ring, d)
    a = audit_collectives(text)
    s = a.summary()
    # CPU compiles in f32 -> scale the analytic to f32 for comparison
    wire = analytic_bytes(d, counts["e_pad"], counts["n_nodes"],
                          counts["n_graphs"], args.hidden,
                          args.alignn_layers, args.gcn_layers,
                          buf_bytes=4)
    print(json.dumps({"audit": s,
                      "analytic_f32_ring_fwd": wire["ring_fwd"],
                      "match_fwd": s["permute_bytes_forward"]
                      == wire["ring_fwd"]}))


def _tpu_schedule_audit(batch, counts, args):
    """Audit the GP module's REAL TPU schedule via AOT topology compile.

    jax.experimental.topologies lets the TPU compiler target an abstract
    8-chip v5e slice without owning one; the resulting executable text
    is post-scheduling, so collective-permute-start/done placement is
    the latency-hiding scheduler's actual decision — upgrading the ring
    'overlap-capable' claim (CPU dependency audit) to 'overlap
    SCHEDULED' (TPU schedule windows with compute inside).
    """
    import numpy as np
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from alignn_tpu.nn.models import ALIGNNAtomWise
    from alignn_tpu.parallel.gp_batch import make_ring_index
    from alignn_tpu.parallel.graph_parallel import (GRAPH_AXIS,
                                                    check_divisible)
    from alignn_tpu.parallel.hlo_audit import (
        audit_collectives, audit_schedule_overlap)

    os.environ["ALIGNN_TPU_GP_RING"] = args.ring
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=args.tpu_topology)
    devs = np.array(topo.devices)
    d = devs.size
    mesh = Mesh(devs.reshape(d), (GRAPH_AXIS,))

    check_divisible(batch, d)
    cfg = _gp_cfg(args)
    model = ALIGNNAtomWise(cfg=cfg)
    # abstract init (no device work): AOT needs only shapes for lowering
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False))
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables)
    ring = make_ring_index(batch, d)
    text = _gp_compiled_text(mesh, cfg, variables, batch, ring, d)
    a = audit_collectives(text)
    s = a.summary()
    windows = audit_schedule_overlap(text)
    fwd = [w for w in windows if w["phase"] == "forward"]
    bwd = [w for w in windows if w["phase"] == "transpose"]

    def _stats(ws):
        if not ws:
            return None
        covered = [w for w in ws if w["window_compute_ops"] > 0]
        return {
            "n": len(ws),
            "with_compute_in_window": len(covered),
            "frac_overlapped": round(len(covered) / len(ws), 4),
            "median_window_instrs": int(np.median(
                [w["window_instrs"] for w in ws])),
            "median_compute_ops_in_window": int(np.median(
                [w["window_compute_ops"] for w in ws])),
        }

    # byte cross-check vs the analytic model (f32: default model dtype)
    wire = analytic_bytes(d, counts["e_pad"], counts["n_nodes"],
                          counts["n_graphs"], args.hidden,
                          args.alignn_layers, args.gcn_layers,
                          buf_bytes=4)
    print(json.dumps({
        "tpu_schedule_audit": args.tpu_topology,
        "ring": args.ring,
        "devices": d,
        "summary": s,
        "analytic_f32_ring_fwd": wire["ring_fwd"],
        "match_fwd": s["permute_bytes_forward"] == wire["ring_fwd"],
        "forward_windows": _stats(fwd),
        "transpose_windows": _stats(bwd),
    }))


def _dense_halo_audit(args):
    """Audit + project the halo dense-GP mode (VERDICT r3 #3).

    Compiles the node-block-sharded dense module (parallel/dense_gp.py)
    on whatever platform is active — the 8-device CPU mesh for the
    byte/structure audit, or the abstract TPU topology when
    --tpu_topology is given (post-scheduling windows) — and checks the
    wire bytes against hlo_audit.expected_halo_bytes, then compares
    against the sparse ring's analytic bytes at the same batch.
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from alignn_tpu.graph.dense import (dense_batch_graphs,
                                        dense_spec_for_batch)
    from alignn_tpu.nn.models import ALIGNNAtomWise
    from alignn_tpu.parallel.dense_gp import (
        GRAPH_AXIS,
        DenseGPALIGNNAtomWise,
        _squeeze_index,
        dense_batch_specs,
        dense_gp_device_outputs,
        index_specs,
        make_dense_gp_index,
    )
    from alignn_tpu.parallel.hlo_audit import (
        audit_collectives,
        audit_schedule_overlap,
        expected_halo_bytes,
        expected_ring_bytes,
    )

    if args.tpu_topology:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(
            platform="tpu", topology_name=args.tpu_topology)
        devs = np.array(topo.devices)
        d = devs.size
        mesh = Mesh(devs.reshape(d), (GRAPH_AXIS,))
        abstract = True
    else:
        d = 8
        from alignn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(d, axis_names=(GRAPH_AXIS,))
        abstract = False

    # the bench-recipe graphs, dense layout
    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.graph.build import build_graph

    rng = np.random.default_rng(0)
    elems = ["Na", "Cl", "K", "Br", "Mg", "O", "Ca", "S"]
    base = np.array([
        [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
        [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5]])
    graphs = []
    if args.supercell:
        # ONE large cell spanning chips — the regime GP exists for.
        # Supercell atom order is image-major (slabs along the first
        # axis), so node-block sharding = spatial domain decomposition
        # and the halo is the slab boundary, not the volume.
        n = args.supercell
        atoms = Atoms(lattice_mat=np.eye(3) * 4.2, frac_coords=base,
                      elements=[elems[j] for j in range(8)]
                      ).make_supercell((n, n, n))
        frac = atoms.frac_coords + 0.02 * rng.standard_normal(
            atoms.frac_coords.shape)
        atoms = Atoms(lattice_mat=atoms.lattice_mat, frac_coords=frac,
                      elements=atoms.elements)
        g = build_graph(atoms, cutoff=8.0, max_neighbors=12)
        g.target = np.array([0.0])
        graphs = [g]
    else:
        for i in range(args.graphs):
            a = 4.2 + 0.3 * rng.standard_normal()
            frac = base + 0.02 * rng.standard_normal((8, 3))
            atoms = Atoms(lattice_mat=np.eye(3) * a, frac_coords=frac,
                          elements=[elems[j % len(elems)]
                                    for j in range(8)])
            g = build_graph(atoms, cutoff=8.0, max_neighbors=12)
            g.target = np.array([rng.standard_normal()])
            graphs.append(g)
    spec = dense_spec_for_batch(graphs, node_quantum=128)
    batch = dense_batch_graphs(graphs, spec, target_width=1)
    idx = make_dense_gp_index(batch, d)

    cfg = _gp_cfg(args)
    model = ALIGNNAtomWise(cfg=cfg)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False))
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables)
    gp_model = DenseGPALIGNNAtomWise(cfg=cfg)

    def per_device(b, ix):
        ix = _squeeze_index(ix)
        out, forces, stress, _ = dense_gp_device_outputs(
            gp_model, cfg, variables, b, ix, d)
        return out, forces, stress

    text = jax.jit(shard_map(
        per_device, mesh=mesh,
        in_specs=(dense_batch_specs(batch), index_specs(idx)),
        out_specs=(P(), P(), P()), check_rep=False)
    ).lower(batch, idx).compile().as_text()

    a = audit_collectives(text)
    s = a.summary()
    want = expected_halo_bytes(
        idx.node_halo.steps, idx.edge_halo.steps, cfg.hidden_features,
        dtype_bytes=4, r_dtype_bytes=4,
        alignn_layers=args.alignn_layers, gcn_layers=args.gcn_layers)

    # sparse-ring comparison at the same batch content
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs

    sparse = batch_graphs(graphs, BucketSpec.tight_for_batch(graphs),
                          target_width=1)
    ring_f32 = expected_ring_bytes(
        d, int(sparse.src.shape[0]), cfg.hidden_features, dtype_bytes=4,
        alignn_layers=args.alignn_layers)
    out = {
        "dense_halo_audit": args.tpu_topology or "cpu-mesh",
        "devices": d,
        "node_halo_steps": list(idx.node_halo.steps),
        "edge_halo_steps": list(idx.edge_halo.steps),
        "summary": s,
        "analytic": want,
        "match_fwd": s["permute_bytes_forward"] == want["forward_total"],
        "match_transpose": s["permute_bytes_transpose"]
        == want["transpose_total"],
        "sparse_ring_fwd_f32": ring_f32["forward_total"],
        "dense_vs_sparse_fwd_bytes": round(
            want["forward_total"]
            / max(ring_f32["forward_total"], 1), 4),
    }
    if abstract:
        windows = audit_schedule_overlap(text)
        fwd = [w for w in windows if w["phase"] == "forward"]
        bwd = [w for w in windows if w["phase"] == "transpose"]

        def _stats(ws):
            if not ws:
                return None
            covered = [w for w in ws if w["window_compute_ops"] > 0]
            return {"n": len(ws),
                    "with_compute_in_window": len(covered),
                    "frac_overlapped": round(len(covered) / len(ws), 4)}

        out["forward_windows"] = _stats(fwd)
        out["transpose_windows"] = _stats(bwd)
    print(json.dumps(out))


def _dp_projection(args, t1):
    """DP WEAK scaling: per-chip batch fixed, cost = grad all-reduce.

    VERDICT r2 weak #5: the CPU-mesh DP sweep cannot locate the knee
    (core contention), so argue the >=80% claim from measured step time
    + exact collective bytes out of the compiled DP module + ICI
    bandwidth.  Ring all-reduce moves 2*(D-1)/D * payload per chip.
    """
    import jax
    import numpy as np

    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.parallel.dp import make_dp_train_step
    from alignn_tpu.parallel.hlo_audit import audit_collectives
    from alignn_tpu.parallel.mesh import make_mesh
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state
    from tools.gp_sweep import build_batch

    d = 8
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=args.alignn_layers,
        gcn_layers=args.gcn_layers, hidden_features=args.hidden,
        embedding_features=64, graphwise_weight=1.0,
        gradwise_weight=10.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    batch = build_batch(8)
    rng = np.random.default_rng(0)
    batch = batch.replace(
        forces=rng.standard_normal(batch.forces.shape
                                   ).astype(np.float32) * 0.1,
        stress=rng.standard_normal(batch.stress.shape
                                   ).astype(np.float32) * 0.01)
    state = create_train_state(model, batch,
                               build_optimizer("adamw", 1e-3, 1e-5))
    stacked = jax.tree_util.tree_map(
        lambda x: np.broadcast_to(np.asarray(x)[None],
                                  (d,) + np.asarray(x).shape), batch)
    mesh = make_mesh(d)
    step = make_dp_train_step(model, mesh, donate=False)
    text = step.lower(state, stacked).compile().as_text()
    a = audit_collectives(text)
    ar_payload = sum(c.payload_bytes for c in a.all_reduces())
    n_params = sum(int(np.prod(x.shape)) for x in
                   jax.tree_util.tree_leaves(state.params))
    print(json.dumps({
        "dp": "audit", "all_reduces": len(a.all_reduces()),
        "all_reduce_payload_mb": round(ar_payload / 1e6, 2),
        "param_mb_f32": round(float(n_params) * 4 / 1e6, 2)}))
    for plat, bw in (("v5e", 45.0), ("v5p", 90.0)):
        for dd in (8, 64, 256):
            wire = 2 * (dd - 1) / dd * ar_payload / (bw * GB)
            eff = t1 / (t1 + wire)
            print(json.dumps({
                "dp": "projection", "platform": plat, "devices": dd,
                "exposed_ms": round(wire * 1e3, 3),
                "weak_scaling_efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main()
