"""Fully on-device MD: `lax.scan` velocity-Verlet inside ONE jit.

Beyond the reference's capabilities: its MD path calls the model through
an ASE host loop with a full DGL graph rebuild every step
(ff/calculators.py:284-291) — thousands of host round-trips per
trajectory.  Here the neighbor indices are frozen for a chunk of
`chunk_steps` integration steps, bond vectors are recomputed from
positions *inside* the jitted step (so forces track the moving atoms
exactly), and the whole chunk runs as one `lax.scan` on the TPU.  The
host rebuilds the graph between chunks.

With `chunk_steps=1` this reproduces the host-loop integrator
(`alignn_tpu.ff.md.run_md`) step for step; larger chunks trade the
frozen-topology approximation (standard Verlet-list practice — valid
while intra-chunk motion stays small vs the cutoff shell) for
orders-of-magnitude fewer host round-trips.

Units match :mod:`alignn_tpu.ff.md` (eV / Angstrom / amu, fs input).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from alignn_tpu.chem.atoms import Atoms, atomic_masses
from alignn_tpu.ff.md import FS, KB, MDLog, maxwell_boltzmann_velocities
from alignn_tpu.graph.batch import BucketSpec, batch_graphs
from alignn_tpu.graph.build import build_graph
from alignn_tpu.ops.segment import segment_sum


def _make_chunk_fn(model, variables, dt, ensemble: str,
                   temperature_K: float, friction: float, n_steps: int):
    """Jitted (batch, masses, frac, vel, key) -> end state + energies.

    `batch` and `masses` are traced arguments so one compile serves
    every chunk of the trajectory (the graph indices change between
    chunks, the shapes do not).
    """
    from alignn_tpu.nn.models import compute_cartesian_r

    gamma = friction / FS

    def chunk(batch, masses, frac, vel, key):
        node_mask = batch.node_mask
        inv_mass = jnp.where(masses > 0,
                             1.0 / jnp.maximum(masses, 1e-9), 0.0)
        lat = batch.lattice[0]
        inv_lat = jnp.linalg.inv(lat)
        sigma_v = jnp.sqrt(KB * temperature_K * inv_mass)

        def forces_energy(frac):
            r = compute_cartesian_r(batch, frac_coords=frac)

            def efn(rr):
                res = model.apply(variables, batch, rr, train=False)
                return jnp.sum(res["en_out"] * batch.graph_mask)

            epot, g_r = jax.value_and_grad(efn)(r)
            pair = -g_r
            n = batch.z.shape[0]
            if batch.dense_D:
                # dense layout (graph/dense.py): in-edges of node i are
                # block i, out-edges are rev of block i — both sums are
                # axis reductions (scatter-free, as in atomwise_forward)
                from alignn_tpu.ops.pallas_eggc import permute_rows

                D = batch.dense_D
                forces = (pair.reshape(n, D, 3).sum(axis=1)
                          - permute_rows(pair, batch.rev, batch.rev)
                          .reshape(n, D, 3).sum(axis=1))
            else:
                forces = (segment_sum(pair, batch.dst, n)
                          - segment_sum(pair, batch.src, n))
            return epot, forces * node_mask[:, None]

        def step(carry, _):
            frac, vel, forces, key = carry
            if ensemble == "nvt_langevin":
                key, sub = jax.random.split(key)
                c1 = jnp.exp(-gamma * dt)
                noise = jax.random.normal(sub, vel.shape) * \
                    sigma_v[:, None] * jnp.sqrt(1 - c1 ** 2)
                vel = c1 * vel + noise * node_mask[:, None]
            a = forces * inv_mass[:, None]
            v_half = vel + 0.5 * dt * a
            cart = frac @ lat + dt * v_half
            frac_new = cart @ inv_lat
            epot, forces_new = forces_energy(frac_new)
            vel_new = v_half + 0.5 * dt * forces_new * inv_mass[:, None]
            ekin = 0.5 * jnp.sum(masses[:, None] * vel_new ** 2)
            return (frac_new, vel_new, forces_new, key), (epot, ekin)

        _e0, forces0 = forces_energy(frac)
        (frac, vel, _f, key), (epots, ekins) = jax.lax.scan(
            step, (frac, vel, forces0, key), None, length=n_steps)
        return frac, vel, key, epots, ekins

    return jax.jit(chunk)


def run_md_jit(model, variables, atoms: Atoms,
               steps: int = 1000,
               timestep_fs: float = 1.0,
               ensemble: str = "nve",
               temperature_K: float = 300.0,
               friction: float = 0.02,
               initial_temperature_K: Optional[float] = None,
               cutoff: float = 5.0,
               max_neighbors: int = 12,
               neighbor_strategy: str = "radius_graph",
               chunk_steps: int = 25,
               seed: int = 0,
               atom_features: str = "cgcnn",
               bucket_slack: float = 1.4,
               dense: bool = False) -> Tuple[Atoms, MDLog]:
    """Run MD with on-device scan chunks; returns (final atoms, log).

    ensembles: nve | nvt_langevin.  The graph (and compile bucket) is
    rebuilt between chunks; topology is frozen within a chunk.
    `dense=True` runs the dense-neighborhood execution layout
    (graph/dense.py: gather/scatter-free aggregations — the in-chunk
    bond vectors are recomputed from positions exactly as in the sparse
    layout, and compute_cartesian_r masks padded slots either way).
    """
    if ensemble not in ("nve", "nvt_langevin"):
        raise ValueError(f"run_md_jit supports nve|nvt_langevin, "
                         f"got {ensemble}")
    dt = timestep_fs * FS
    masses_np = atomic_masses()[atoms.atomic_numbers]
    t0 = initial_temperature_K if initial_temperature_K is not None \
        else temperature_K
    vel_np = maxwell_boltzmann_velocities(atoms, t0, seed)
    key = jax.random.PRNGKey(seed)
    log = MDLog()

    spec: Optional[BucketSpec] = None
    sp_spec: Optional[BucketSpec] = None   # sparse fallback bucket
    chunk_cache = {}
    sp_chunk_cache = {}
    dense_warned = False
    done = 0
    cur = atoms

    def _sparse_batch(g):
        nonlocal sp_spec
        if sp_spec is None or g.num_nodes >= sp_spec.n_nodes or \
                g.num_edges >= sp_spec.n_edges or \
                g.num_lg_edges >= sp_spec.n_lg_edges:
            sp_spec = BucketSpec(
                n_nodes=((int(g.num_nodes * bucket_slack) + 128)
                         // 128) * 128,
                n_edges=((int(g.num_edges * bucket_slack) + 128)
                         // 128) * 128,
                n_lg_edges=((int(g.num_lg_edges * bucket_slack) + 512)
                            // 512) * 512,
                n_graphs=2)
            sp_chunk_cache.clear()
        return batch_graphs([g], sp_spec, atom_features=atom_features,
                            gather_windows=False), sp_chunk_cache

    while done < steps:
        g = build_graph(cur, neighbor_strategy=neighbor_strategy,
                        cutoff=cutoff, max_neighbors=max_neighbors)
        if dense:
            from alignn_tpu.graph.dense import (
                AsymmetricEdgesError,
                dense_batch_graphs,
                dense_spec_with_slack,
                max_in_degree,
            )

            if spec is None or g.num_nodes >= spec.n_nodes or \
                    max_in_degree([g]) > spec.dense_D:
                spec = dense_spec_with_slack(g, bucket_slack=bucket_slack)
                chunk_cache.clear()
            try:
                batch = dense_batch_graphs([g], spec,
                                           atom_features=atom_features)
                cache = chunk_cache
            except AsymmetricEdgesError:
                # per-CHUNK sparse fallback: thermal motion can break
                # the reverse involution (a bond within a float ulp of
                # the radius cutoff) — never abort a trajectory over it
                if not dense_warned:
                    print("[md_jit] asymmetric edge set this chunk; "
                          "using the sparse layout for it")
                    dense_warned = True
                batch, cache = _sparse_batch(g)
        else:
            batch, cache = _sparse_batch(g)
        n_pad = batch.z.shape[0]
        masses = np.zeros(n_pad)
        masses[: cur.num_atoms] = masses_np
        n_run = min(chunk_steps, steps - done)
        if n_run not in cache:
            cache[n_run] = _make_chunk_fn(
                model, variables, dt, ensemble, temperature_K,
                friction, n_run)
        frac = jnp.asarray(batch.frac_coords)
        vel = jnp.zeros((n_pad, 3))
        vel = vel.at[: cur.num_atoms].set(vel_np)

        frac, vel, key, epots, ekins = cache[n_run](
            batch, jnp.asarray(masses), frac, vel, key)
        # ONE batched device fetch per chunk (CLAUDE.md fetch rule)
        frac_h, vel_h, epots, ekins = jax.device_get(
            (frac, vel, epots, ekins))
        frac_h = np.asarray(frac_h)[: cur.num_atoms]
        vel_np = np.asarray(vel_h)[: cur.num_atoms]
        epots = np.asarray(epots)
        ekins = np.asarray(ekins)
        cur = cur.with_positions(frac_coords=frac_h)
        n_at = cur.num_atoms
        # the scan already returned EVERY step's energies — log them all
        # (run_md parity: one row per step, not one per chunk)
        for k in range(n_run):
            log.append(done + k + 1, (done + k + 1) * timestep_fs,
                       float(epots[k]), float(ekins[k]),
                       float(2 * ekins[k] / (3 * n_at * KB)))
        done += n_run
    return cur, log
