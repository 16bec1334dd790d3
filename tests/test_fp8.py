"""fp8 (e4m3) storage of the L(g) activation tables (ops/fp8.py,
VERDICT r3 #2).  Pins the quantizer's error envelope, the
straight-through gradient, and that the full E/F/S dense train step
(grad-of-grad) runs and stays finite with ALIGNN_TPU_FP8_LTABLES=1,
with outputs within quantization tolerance of the bf16-storage path.
"""

import numpy as np

import jax
import jax.numpy as jnp

from alignn_tpu.ops.fp8 import fp8_round_trip, quantize_e4m3


def test_quantize_roundtrip_error_envelope():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((64, 256)) *
         np.exp(rng.uniform(-3, 3, (64, 1)))).astype(np.float32)
    q, scale = quantize_e4m3(jnp.asarray(x))
    assert q.dtype == jnp.float8_e4m3fn
    back = np.asarray(q.astype(jnp.float32) * scale)
    err = np.abs(back - x)
    # e4m3: 3 mantissa bits -> rel err <= 2^-4 for normals; rows scale
    # to amax/448, so the absolute floor is rowmax * 2^-12-ish
    rowmax = np.abs(x).max(axis=-1, keepdims=True)
    bound = np.maximum(np.abs(x) * 2.0 ** -3, rowmax * 2.0 ** -9)
    assert (err <= bound).all()


def test_roundtrip_handles_zero_rows():
    x = jnp.zeros((4, 8), jnp.float32)
    out = fp8_round_trip(x)
    assert np.asarray(out).max() == 0.0 and np.isfinite(
        np.asarray(out)).all()


def test_straight_through_gradient():
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (8, 16)).astype(np.float32))

    def f(v):
        return jnp.sum(fp8_round_trip(v) ** 2)

    g = jax.grad(f)(x)
    # STE: grad of sum(rt(x)^2) = 2*rt(x) exactly (identity through rt)
    np.testing.assert_allclose(np.asarray(g),
                               2 * np.asarray(fp8_round_trip(x)),
                               rtol=1e-6)
    # second order (the force-training regime): hessian-vector finite
    hvp = jax.grad(lambda v: jnp.vdot(jax.grad(f)(v), v))(x)
    assert np.isfinite(np.asarray(hvp)).all()


def test_dense_train_step_with_fp8_ltables(monkeypatch, tmp_path):
    """Full E/F/S dense train step under the flag: runs, loss finite,
    outputs within quantization tolerance of the bf16-storage path."""
    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.graph.dense import (dense_batch_graphs,
                                        dense_spec_for_batch)
    from alignn_tpu.nn.models import (
        ALIGNNAtomWise,
        ALIGNNAtomWiseConfig,
        atomwise_forward,
    )
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state, \
        make_train_step

    rng = np.random.default_rng(0)
    base = np.array([
        [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
        [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5]])
    elems = ["Na", "Cl", "K", "Br", "Mg", "O", "Ca", "S"]
    graphs = []
    for i in range(2):
        atoms = Atoms(lattice_mat=np.eye(3) * 4.2,
                      frac_coords=base + 0.02 * rng.standard_normal(
                          (8, 3)),
                      elements=elems)
        g = build_graph(atoms, cutoff=8.0, max_neighbors=12)
        g.target = np.array([rng.standard_normal()])
        g.forces = rng.standard_normal((8, 3)) * 0.1
        g.stress = np.eye(3) * 0.01
        graphs.append(g)
    batch = dense_batch_graphs(graphs,
                               dense_spec_for_batch(graphs,
                                                    node_quantum=128))
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=2, gcn_layers=1,
        hidden_features=64, embedding_features=32,
        gradwise_weight=10.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)

    monkeypatch.delenv("ALIGNN_TPU_FP8_LTABLES", raising=False)
    ref = atomwise_forward(model, variables, batch, train=False)

    monkeypatch.setenv("ALIGNN_TPU_FP8_LTABLES", "1")
    fp8 = atomwise_forward(model, variables, batch, train=False)
    # quantization-tolerance parity on the physical outputs
    np.testing.assert_allclose(np.asarray(fp8["out"]),
                               np.asarray(ref["out"]), rtol=0.05,
                               atol=5e-3)
    f_ref = np.asarray(ref["grad"])
    f_fp8 = np.asarray(fp8["grad"])
    scale = np.abs(f_ref).max() + 1e-9
    assert np.abs(f_fp8 - f_ref).max() / scale < 0.15

    # the grad-of-grad train step compiles and stays finite
    state = create_train_state(model, batch,
                               build_optimizer("adamw", 1e-3, 0.0))
    step = make_train_step(model, criterion="l1", donate=False)
    state, losses = step(state, batch)
    assert np.isfinite(float(jax.device_get(losses["loss"])))


def test_sparse_forward_with_fp8_ltables(monkeypatch):
    """Sparse-layout z-stream storage under the flag: outputs within
    quantization tolerance of the bf16-storage sparse path."""
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.nn.models import (
        ALIGNNAtomWise,
        ALIGNNAtomWiseConfig,
        atomwise_forward,
    )

    rng = np.random.default_rng(2)
    base = np.array([
        [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    graphs = []
    for i in range(2):
        atoms = Atoms(lattice_mat=np.eye(3) * 4.1,
                      frac_coords=base + 0.02 * rng.standard_normal(
                          (4, 3)),
                      elements=["Na", "Cl", "K", "Br"])
        g = build_graph(atoms, cutoff=6.0, max_neighbors=12)
        g.target = np.array([rng.standard_normal()])
        g.forces = rng.standard_normal((4, 3)) * 0.1
        graphs.append(g)
    batch = batch_graphs(graphs, BucketSpec.tight_for_batch(graphs))
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=2, gcn_layers=1,
        hidden_features=32, embedding_features=16, gradwise_weight=1.0)
    model = ALIGNNAtomWise(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)
    monkeypatch.delenv("ALIGNN_TPU_FP8_LTABLES", raising=False)
    ref = atomwise_forward(model, variables, batch, train=False)
    monkeypatch.setenv("ALIGNN_TPU_FP8_LTABLES", "1")
    fp8 = atomwise_forward(model, variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(fp8["out"]),
                               np.asarray(ref["out"]), rtol=0.05,
                               atol=5e-3)
    scale = np.abs(np.asarray(ref["grad"])).max() + 1e-9
    assert np.abs(np.asarray(fp8["grad"])
                  - np.asarray(ref["grad"])).max() / scale < 0.15
