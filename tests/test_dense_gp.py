"""Dense-layout graph parallelism (parallel/dense_gp.py, VERDICT r3 #3).

Pins: (1) the halo-exchange machinery reproduces global gathers
exactly; (2) the node-block-sharded dense-GP forward matches the
single-chip dense model (out / forces / stress) with the SAME
variables — i.e. single-chip checkpoints drop into the GP mode
unchanged; (3) forced step widths (the monotone jit-cache floor)
preserve results.  Runs on the 8-virtual-device CPU mesh (conftest).
"""

import numpy as np
import pytest

import jax

from alignn_tpu.chem.atoms import Atoms
from alignn_tpu.graph.build import build_graph
from alignn_tpu.graph.dense import dense_batch_graphs, dense_spec_for_batch
from alignn_tpu.nn.models import (
    ALIGNNAtomWise,
    ALIGNNAtomWiseConfig,
    atomwise_forward,
)
from alignn_tpu.parallel.dense_gp import (
    _build_halo,
    make_dense_gp_forward,
    make_dense_gp_index,
)
from alignn_tpu.parallel.mesh import make_mesh


def _graphs(n_graphs=4, seed=0, n_atoms=8):
    rng = np.random.default_rng(seed)
    elems = ["Na", "Cl", "K", "Br", "Mg", "O", "Ca", "S"]
    base = np.array([
        [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
        [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5]])
    graphs = []
    for _ in range(n_graphs):
        a = 4.2 + 0.3 * rng.standard_normal()
        frac = base[:n_atoms] + 0.02 * rng.standard_normal((n_atoms, 3))
        atoms = Atoms(lattice_mat=np.eye(3) * a, frac_coords=frac,
                      elements=[elems[j % len(elems)]
                                for j in range(n_atoms)])
        g = build_graph(atoms, cutoff=8.0, max_neighbors=12)
        g.target = np.array([rng.standard_normal()])
        g.forces = rng.standard_normal((n_atoms, 3)) * 0.1
        g.stress = np.eye(3) * 0.01
        graphs.append(g)
    return graphs


def _dense_batch(n_graphs=4, seed=0):
    graphs = _graphs(n_graphs, seed)
    spec = dense_spec_for_batch(graphs, node_quantum=128)
    return dense_batch_graphs(graphs, spec)


def _supercell_batch(n=2, seed=0):
    """ONE 8n^3-atom supercell — spans shards, so the halo is REAL
    (batches of 8-atom cells pack whole graphs inside one shard and
    exchange zero bytes; that must not be the only tested case)."""
    rng = np.random.default_rng(seed)
    base = np.array([
        [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
        [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5]])
    elems = ["Na", "Cl", "K", "Br", "Mg", "O", "Ca", "S"]
    atoms = Atoms(lattice_mat=np.eye(3) * 4.2, frac_coords=base,
                  elements=elems).make_supercell((n, n, n))
    atoms = Atoms(lattice_mat=atoms.lattice_mat,
                  frac_coords=atoms.frac_coords
                  + 0.02 * rng.standard_normal(atoms.frac_coords.shape),
                  elements=atoms.elements)
    g = build_graph(atoms, cutoff=8.0, max_neighbors=12)
    g.target = np.array([0.3])
    g.forces = rng.standard_normal((len(atoms.elements), 3)) * 0.1
    g.stress = np.eye(3) * 0.01
    spec = dense_spec_for_batch([g], node_quantum=128)
    return dense_batch_graphs([g], spec)


def _halo_gather_host(table, halo, remap, chip, rows_loc):
    """Emulate halo_exchange + remap gather for one chip, host-side."""
    d = len(halo.steps) + 1
    parts = [table[chip * rows_loc:(chip + 1) * rows_loc]]
    off = 0
    for k in range(1, d):
        s = halo.steps[k - 1]
        if s == 0:
            continue
        sender = (chip + k) % d
        idx = halo.send_idx[sender, off:off + s]
        parts.append(table[sender * rows_loc + idx])
        off += s
    return np.concatenate(parts)[remap[chip]]


def test_halo_remap_matches_global_gather():
    """halo plan + local gather == table[targets], per chip."""
    rng = np.random.default_rng(3)
    d, rows, consumers = 8, 32, 64
    targets = rng.integers(0, d * rows, size=d * consumers)
    mask = (rng.random(d * consumers) > 0.15).astype(np.float32)
    halo, remap = _build_halo(targets, mask, rows, d, quantum=4)
    table = rng.standard_normal((d * rows, 5)).astype(np.float32)
    want = table[targets].reshape(d, consumers, 5)
    for c in range(d):
        got = _halo_gather_host(table, halo, remap, c, rows)
        live = mask.reshape(d, consumers)[c] > 0.5
        np.testing.assert_allclose(got[live], want[c][live], rtol=0,
                                   atol=0)


def test_halo_dedup_compactness():
    """Requests are deduplicated: repeated targets cost one halo row."""
    d, rows = 4, 16
    # every consumer on chip 0 wants the SAME remote row (chip 1, row 3)
    targets = np.full(d * 8, rows + 3, dtype=np.int64)
    mask = np.ones(d * 8, dtype=np.float32)
    halo, remap = _build_halo(targets, mask, rows, d, quantum=1)
    assert halo.steps[0] == 1  # distance-1 halo: ONE row, not 8


def test_param_tree_matches_single_chip():
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from alignn_tpu.parallel.dense_gp import (
        DenseGPALIGNNAtomWise,
        _squeeze_index,
        dense_batch_specs,
        index_specs,
    )

    batch = _dense_batch()
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=2, gcn_layers=2,
        hidden_features=64, embedding_features=32,
        gradwise_weight=1.0, stresswise_weight=0.1)
    ref = ALIGNNAtomWise(cfg=cfg)
    vref = jax.eval_shape(
        lambda: ref.init(jax.random.PRNGKey(0), batch, batch.r,
                         train=False))
    idx = make_dense_gp_index(batch, 8)
    gp = DenseGPALIGNNAtomWise(cfg=cfg)
    mesh = make_mesh(8, axis_names=("graph",))

    def init_fn(b, ix):
        ix = _squeeze_index(ix)
        return gp.init(jax.random.PRNGKey(0), b, b.r, ix, train=False)

    vgp = jax.eval_shape(jax.jit(shard_map(
        init_fn, mesh=mesh,
        in_specs=(dense_batch_specs(batch), index_specs(idx)),
        out_specs=P(), check_rep=False)), batch, idx)
    ref_paths = {"/".join(map(str, p)): v.shape for p, v in
                 jax.tree_util.tree_flatten_with_path(vref["params"])[0]}
    gp_paths = {"/".join(map(str, p)): v.shape for p, v in
                jax.tree_util.tree_flatten_with_path(vgp["params"])[0]}
    assert ref_paths == gp_paths


@pytest.mark.parametrize("n_devices,supercell", [(2, False), (8, False),
                                                 (8, True)])
def test_dense_gp_matches_single_chip(n_devices, supercell):
    # supercell=True: ONE graph straddling all shards -> real halo
    # traffic on every exchange; supercell=False: whole graphs pack
    # into shards -> the zero-halo fast case
    batch = _supercell_batch() if supercell else _dense_batch()
    if supercell:
        idx = make_dense_gp_index(batch, n_devices)
        assert sum(idx.node_halo.steps) > 0  # the halo must be REAL
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=2, gcn_layers=2,
        hidden_features=64, embedding_features=32,
        gradwise_weight=1.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    ref = atomwise_forward(model, variables, batch, train=False)

    mesh = make_mesh(n_devices, axis_names=("graph",))
    fwd = make_dense_gp_forward(cfg, mesh, variables)
    out, forces, stress = jax.device_get(fwd(batch))

    np.testing.assert_allclose(out, np.asarray(ref["out"]), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(forces, np.asarray(ref["grad"]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(stress, np.asarray(ref["stresses"]),
                               rtol=2e-4, atol=2e-5)


def test_dense_gp_forced_steps_roundtrip():
    batch = _dense_batch()
    idx = make_dense_gp_index(batch, 8)
    widened = (tuple(s + 128 if s else 128
                     for s in idx.node_halo.steps),
               tuple(s + 128 if s else 128
                     for s in idx.edge_halo.steps))
    idx2 = make_dense_gp_index(batch, 8, force_steps=widened)
    assert idx2.node_halo.steps == widened[0]

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=32, embedding_features=16,
        gradwise_weight=1.0, stresswise_weight=0.0)
    model = ALIGNNAtomWise(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    mesh = make_mesh(8, axis_names=("graph",))
    fwd = make_dense_gp_forward(cfg, mesh, variables)
    o1, f1, _ = jax.device_get(fwd(batch, idx))
    o2, f2, _ = jax.device_get(fwd(batch, idx2))
    np.testing.assert_allclose(o1, o2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(f1, f2, rtol=1e-5, atol=1e-6)


def test_halo_bytes_pinned_by_hlo():
    """Wire bytes of the compiled dense-GP module == the analytic halo
    model (hlo_audit.expected_halo_bytes), phase by phase — the dense
    counterpart of tests/test_ring_overlap.py's byte pin."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from alignn_tpu.parallel.dense_gp import (
        DenseGPALIGNNAtomWise,
        _squeeze_index,
        dense_batch_specs,
        dense_gp_device_outputs,
        index_specs,
    )
    from alignn_tpu.parallel.hlo_audit import (
        audit_collectives,
        expected_halo_bytes,
    )

    d = 8
    batch = _supercell_batch()  # real (non-zero) halo
    idx = make_dense_gp_index(batch, d)
    assert sum(idx.node_halo.steps) > 0
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=2, gcn_layers=1,
        hidden_features=64, embedding_features=32,
        gradwise_weight=1.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    gp_model = DenseGPALIGNNAtomWise(cfg=cfg)
    mesh = make_mesh(d, axis_names=("graph",))

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
        alignn_layers=cfg.alignn_layers, gcn_layers=cfg.gcn_layers)
    assert s["permute_bytes_forward"] == want["forward_total"], (
        s, want)
    assert s["permute_bytes_transpose"] == want["transpose_total"], (
        s, want)
    # hop independence: no collective-permute's payload depends on
    # another collective-permute WITHIN the same exchange.  The sparse
    # ring's reverse is an accumulate-and-forward chain (hop k's payload
    # contains hop k+1's arrival); the halo exchange's hops each permute
    # a disjoint slice, so ACROSS the module permute->permute reachability
    # only reflects layer ordering: count must equal the number of
    # inter-exchange dependencies, never (D-2)-deep within-exchange
    # chains.  Pin the distinguishing case on a single exchange below.
    assert s["forward_overlap_capable"] is True, s


def test_single_exchange_reverse_has_no_permute_chain():
    """Transpose of ONE halo exchange: hops independent (vs the sparse
    ring, whose reverse hops chain through local adds)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from alignn_tpu.parallel.dense_gp import (
        HaloIndex,
        _build_halo,
        halo_exchange,
    )
    from alignn_tpu.parallel.hlo_audit import parse_instructions

    d, rows = 8, 16
    rng = np.random.default_rng(0)
    targets = rng.integers(0, d * rows, size=d * 32)
    mask = np.ones(d * 32, np.float32)
    halo, remap = _build_halo(targets, mask, rows, d, quantum=4)
    mesh = make_mesh(d, axis_names=("graph",))

    def fn(table, send_idx, remap_loc):
        h = HaloIndex(send_idx=send_idx[0], steps=halo.steps)

        def loss(t):
            tbl = halo_exchange(t, h, "graph")
            return (tbl[remap_loc[0]] ** 2).sum()

        val = jax.grad(loss)(table)
        return val

    table = rng.standard_normal((d * rows, 8)).astype(np.float32)
    send = np.broadcast_to(halo.send_idx, (d,) + halo.send_idx.shape[1:])         if halo.send_idx.ndim == 1 else halo.send_idx
    text = jax.jit(shard_map(
        fn, mesh=mesh,
        in_specs=(P("graph"), P("graph"), P("graph")),
        out_specs=P("graph"), check_rep=False)
    ).lower(table, send, remap).compile().as_text()
    instrs = parse_instructions(text)
    from alignn_tpu.parallel.hlo_audit import _phase_of

    # a transpose permute's payload may legitimately depend on FORWARD
    # permutes (the gradient depends on the forward value); the sparse
    # ring's knee is transpose->TRANSPOSE chaining (hop k's payload
    # contains hop k+1's arrival + local add).  Pin its absence.
    tperms = {n for n, i in instrs.items()
              if i.opcode.startswith("collective-permute")
              and _phase_of(i.op_name) == "transpose"}
    assert tperms, "no transpose permutes parsed — phase metadata miss"
    memo = {}

    def reaches_tperm(name):
        if name in memo:
            return memo[name]
        memo[name] = False
        ins = instrs.get(name)
        if ins is None:
            return False
        for dep in ins.deps:
            if dep in tperms or reaches_tperm(dep):
                memo[name] = True
                break
        return memo[name]

    import sys

    sys.setrecursionlimit(100000)
    chained = [t for t in tperms
               if any(d in tperms or reaches_tperm(d)
                      for d in instrs[t].deps)]
    assert not chained, (
        f"transpose->transpose permute chain found: {chained}")


@pytest.mark.parametrize("supercell", [False, True])
def test_dense_gp_train_step_matches_single_chip(supercell):
    """One full E/F/S train step (grad-of-grad) on the 8-device dense-GP
    mesh == the single-device dense train step: same loss components,
    same updated parameters.  Covers both the zero-halo (packed small
    crystals) and real-halo (supercell) regimes."""
    from alignn_tpu.parallel.dense_gp import make_dense_gp_train_step
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state, \
        make_train_step
    from flax import serialization, traverse_util

    batch = _supercell_batch() if supercell else _dense_batch()
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=32, embedding_features=16,
        gradwise_weight=10.0, stresswise_weight=0.1,
        graphwise_weight=1.0)
    model = ALIGNNAtomWise(cfg=cfg)
    tx = build_optimizer("adamw", 1e-3, 1e-5)
    state_ref = create_train_state(model, batch, tx)
    step_ref = make_train_step(model, criterion="l1", donate=False)
    new_ref, losses_ref = step_ref(state_ref, batch)

    mesh = make_mesh(8, axis_names=("graph",))
    state_gp = create_train_state(model, batch, tx)
    step_gp = make_dense_gp_train_step(cfg, mesh, donate=False)
    new_gp, losses_gp = step_gp(state_gp, batch)

    for k in ("loss", "loss1", "loss3", "loss4"):
        np.testing.assert_allclose(
            float(jax.device_get(losses_gp[k])),
            float(jax.device_get(losses_ref[k])), rtol=5e-4,
            atol=1e-6, err_msg=k)

    pa = traverse_util.flatten_dict(serialization.to_state_dict(
        jax.device_get(new_ref.params)))
    pb = traverse_util.flatten_dict(serialization.to_state_dict(
        jax.device_get(new_gp.params)))
    assert pa.keys() == pb.keys()
    for k in pa:
        np.testing.assert_allclose(pb[k], pa[k], rtol=2e-3, atol=2e-5,
                                    err_msg="/".join(k))


def test_dp_dense_gp_matches_averaged_single_device():
    """2-D (data x dense-graph) step on a 2x4 mesh == averaging the two
    micro-batches' single-device dense gradients — pins the nested
    psum-transpose scaling through the halo exchange."""
    import optax
    from jax.sharding import Mesh

    from alignn_tpu.parallel.dense_gp import (
        make_dp_dense_gp_train_step,
    )
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import _forward_and_loss, \
        create_train_state

    # two micro-batches sharing one dense bucket: one supercell each
    # (real halo on the graph axis)
    m0 = _supercell_batch(seed=0)
    m1 = _supercell_batch(seed=1)
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8,
        gradwise_weight=1.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    tx = build_optimizer("adamw", 1e-3, 0.0)
    state = create_train_state(model, m0, tx)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "graph"))
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0), m0, m1)
    step = make_dp_dense_gp_train_step(cfg, mesh, donate=False)
    new_state, losses = step(state, stacked)

    def grad_for(batch):
        def f(params):
            loss, (ls, _res, _bs) = _forward_and_loss(
                model, params, state.batch_stats, batch, "l1", False,
                train=True)
            return loss, ls

        return jax.grad(f, has_aux=True)(state.params)

    g0, l0 = grad_for(m0)
    g1, l1 = grad_for(m1)
    grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g0, g1)
    updates, _ = state.tx.update(grads, state.opt_state, state.params)
    ref_params = optax.apply_updates(state.params, updates)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-6)
    ref_loss = (float(l0["loss"]) + float(l1["loss"])) / 2
    assert float(jax.device_get(losses["loss"])) == pytest.approx(
        ref_loss, rel=2e-4)


def test_trainer_2d_mesh_dense_layout(tmp_path):
    """train_model_dp dispatches to the dense halo-GP step when the
    loader is dense and mesh_shape has graph > 1 — the production
    config surface for dense graph parallelism."""
    from alignn_tpu.config import TrainingConfig
    from alignn_tpu.data.dataset import GraphDataset
    from alignn_tpu.data.loader import BucketedLoader
    from alignn_tpu.parallel.dp import train_model_dp

    graphs = _graphs(8, seed=4)
    ds = GraphDataset(graphs=graphs, ids=[f"s{i}" for i in range(8)])
    tr = BucketedLoader(ds, batch_size=2, shuffle=True, num_shards=2,
                        dense=True)
    va = BucketedLoader(ds, batch_size=2, shuffle=False, dense=True)
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8,
        gradwise_weight=1.0, stresswise_weight=0.1)
    tcfg = TrainingConfig(
        epochs=2, batch_size=2, output_dir=str(tmp_path),
        learning_rate=1e-3, mesh_shape={"data": 2, "graph": 2},
        model=cfg)
    summary = train_model_dp(tcfg, tr, va, n_devices=4)
    assert np.isfinite(summary["best_val_loss"])


def test_stacked_dense_index_shared_floors():
    """Stacked (dp x gp) halo plans share ONE static step tuple across
    data rows (elementwise max, min_steps floor honored) and every
    row's remap stays correct under the forced widths."""
    from alignn_tpu.parallel.dense_gp import (
        make_dense_gp_index,
        make_stacked_dense_index,
    )

    rows = [_supercell_batch(seed=s) for s in (0, 1)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0), *rows)
    idx = make_stacked_dense_index(stacked, 4)
    per_row = [make_dense_gp_index(r, 4) for r in rows]
    for k in range(3):
        assert idx.node_halo.steps[k] == max(
            p.node_halo.steps[k] for p in per_row)
    # min_steps floor wins where larger
    floor = (tuple(s + 8 for s in idx.node_halo.steps),
             tuple(s + 8 for s in idx.edge_halo.steps))
    idx2 = make_stacked_dense_index(stacked, 4, min_steps=floor)
    assert idx2.node_halo.steps == floor[0]
    assert idx2.edge_halo.steps == floor[1]
    # remap correctness under forcing: chip-0 host emulation per row
    for irow, row in enumerate(rows):
        t = np.asarray(row.src)
        mask = np.asarray(row.edge_mask)
        rows_loc = t.shape[0] // 4  # edge rows per shard? node space:
        n_loc = np.asarray(row.z).shape[0] // 4
        table = np.random.default_rng(irow).standard_normal(
            (np.asarray(row.z).shape[0], 3)).astype(np.float32)
        from alignn_tpu.parallel.dense_gp import HaloIndex

        halo = HaloIndex(send_idx=idx2.node_halo.send_idx[irow],
                         steps=idx2.node_halo.steps)
        got = _halo_gather_host(table, halo,
                                idx2.src_halo[irow], 0, n_loc)
        live = mask.reshape(4, -1)[0] > 0.5
        want = table[t].reshape(4, -1, 3)[0]
        np.testing.assert_allclose(got[live], want[live], rtol=0,
                                   atol=0)


def test_dense_gp_batch_stress_false_parity():
    """cfg.batch_stress=False uses the reference's /(2V) convention —
    the GP assembly must apply the same divisor as the single-chip
    path (review finding: it was hardcoded to the default)."""
    batch = _dense_batch()
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8,
        gradwise_weight=1.0, stresswise_weight=0.1, batch_stress=False)
    model = ALIGNNAtomWise(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    ref = atomwise_forward(model, variables, batch, train=False)
    mesh = make_mesh(8, axis_names=("graph",))
    fwd = make_dense_gp_forward(cfg, mesh, variables)
    _out, _forces, stress = jax.device_get(fwd(batch))
    np.testing.assert_allclose(stress, np.asarray(ref["stresses"]),
                               rtol=2e-4, atol=2e-6)
