"""Honest md_jit throughput measurement (device_get-fenced).

Round-1 claimed 318 MD steps/s for the 50-step scan chunk and 22 steps/s
for the host loop (BENCH_NOTES.md "On-device MD"); both predate the
fencing correction, so this script re-measures under the round-2 rules:
wall-clock over several steady-state chunks, each fenced by a
`jax.device_get` that transitively depends on every integration step
(the final positions/energies), compile excluded via a warmup chunk.

Usage:  python -u tools/md_measure.py [--steps-per-chunk 50]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--n-chunks", type=int, default=10)
    ap.add_argument("--atoms", type=int, default=16)
    ap.add_argument("--host-steps", type=int, default=30)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--dense", action="store_true",
                    help="dense-neighborhood layout (graph/dense.py)")
    args = ap.parse_args()

    from alignn_tpu.chem.atoms import Atoms, atomic_masses
    from alignn_tpu.ff.md import maxwell_boltzmann_velocities, FS
    from alignn_tpu.ff.md_jit import _make_chunk_fn
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig

    # 16-atom rocksalt supercell, same regime as the round-1 note
    rng = np.random.default_rng(0)
    n_cell = max(args.atoms // 8, 1)
    a = 4.1
    lat = np.diag([a * n_cell, a, a * 2])
    base = np.array([[0, 0, 0], [0.5, 0.5, 0.5],
                     [0.5, 0, 0.5], [0, 0.5, 0],
                     [0, 0, 0.5], [0.5, 0.5, 0],
                     [0.5, 0, 0], [0, 0.5, 0.5]])
    fracs = []
    nums = []
    for i in range(n_cell):
        f = base.copy()
        f[:, 0] = (f[:, 0] + i) / n_cell
        fracs.append(f)
        nums.extend([11, 17] * 4)
    frac = np.concatenate(fracs) + rng.normal(scale=0.01, size=(args.atoms, 3))
    elements = ["Na" if z == 11 else "Cl" for z in nums]
    atoms = Atoms(lattice_mat=lat, frac_coords=frac, elements=elements)

    cfg = ALIGNNAtomWiseConfig(
        alignn_layers=args.layers, gcn_layers=args.layers,
        hidden_features=args.hidden,
        calculate_gradient=False, gradwise_weight=0.0)
    model = ALIGNNAtomWise(cfg)

    g = build_graph(atoms, neighbor_strategy="radius_graph", cutoff=5.0,
                    max_neighbors=12)
    if args.dense:
        from alignn_tpu.graph.dense import (
            dense_batch_graphs, dense_spec_with_slack)

        spec = dense_spec_with_slack(g, bucket_slack=1.4)
        batch = dense_batch_graphs([g], spec, atom_features="cgcnn")
    else:
        spec = BucketSpec(
            n_nodes=((int(g.num_nodes * 1.4) + 128) // 128) * 128,
            n_edges=((int(g.num_edges * 1.4) + 128) // 128) * 128,
            n_lg_edges=((int(g.num_lg_edges * 1.4) + 512) // 512) * 512,
            n_graphs=2)
        batch = batch_graphs([g], spec, atom_features="cgcnn")
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)

    masses_np = atomic_masses()[atoms.atomic_numbers]
    n_pad = batch.z.shape[0]
    masses = np.zeros(n_pad)
    masses[: atoms.num_atoms] = masses_np
    vel_np = maxwell_boltzmann_velocities(atoms, 300.0, 0)
    vel = jnp.zeros((n_pad, 3)).at[: atoms.num_atoms].set(vel_np)
    frac_j = jnp.asarray(batch.frac_coords)
    masses_j = jnp.asarray(masses)
    key = jax.random.PRNGKey(0)
    dt = 1.0 * FS

    chunk_fn = _make_chunk_fn(model, variables, dt, "nve", 300.0, 0.02,
                              args.chunk)

    # warmup chunk = compile; fence with device_get on the outputs
    t0 = time.time()
    frac_w, vel_w, key, epots, ekins = chunk_fn(
        batch, masses_j, frac_j, vel, key)
    _ = jax.device_get((frac_w, epots))
    compile_s = time.time() - t0

    # steady state: mirror run_md_jit's loop (device_get each chunk)
    t0 = time.time()
    fr, ve = frac_j, vel
    for _ in range(args.n_chunks):
        fr, ve, key, epots, ekins = chunk_fn(batch, masses_j, fr, ve, key)
        fr_h, ep_h = jax.device_get((fr, epots))
    wall = time.time() - t0
    total_steps = args.n_chunks * args.chunk
    print(json.dumps({
        "config": f"md_jit chunk={args.chunk} atoms={args.atoms} "
                  f"{args.layers}+{args.layers}/{args.hidden}"
                  + (" dense" if args.dense else ""),
        "compile_s": round(compile_s, 1),
        "chunk_ms": round(1e3 * wall / args.n_chunks, 1),
        "md_steps_per_s": round(total_steps / wall, 1),
        "fence": "device_get per chunk",
    }), flush=True)

    # single-step chunks approximate the host-loop dispatch pattern
    # (per-step device_get) without the graph-rebuild cost
    chunk1 = _make_chunk_fn(model, variables, dt, "nve", 300.0, 0.02, 1)
    fr1, ve1, key, epots, ekins = chunk1(batch, masses_j, frac_j, vel, key)
    _ = jax.device_get((fr1, epots))
    t0 = time.time()
    fr, ve = frac_j, vel
    for _ in range(args.host_steps):
        fr, ve, key, epots, ekins = chunk1(batch, masses_j, fr, ve, key)
        _ = jax.device_get((fr, epots))
    wall = time.time() - t0
    print(json.dumps({
        "config": "per-step dispatch (host-loop pattern, no rebuild)",
        "md_steps_per_s": round(args.host_steps / wall, 1),
        "fence": "device_get per step",
    }), flush=True)


if __name__ == "__main__":
    main()
