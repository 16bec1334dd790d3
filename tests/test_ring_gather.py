"""Gather-then-reduce reverse ring (ALIGNN_TPU_GP_RING=gather,
VERDICT r3 #4).

The default sparse-GP ring transposes to an accumulate-and-forward
chain (hop k's payload contains the local scatter-add of hop k+1's
arrival — serialized with compute; pinned by tests/test_ring_overlap).
The gather variant keeps the forward chain but its custom VJP returns
each step's cotangent with ONE independent shift permute.  Pins:

1. numerical parity with the chain mode (forward AND the E/F/S
   gradient through the force grad-of-grad);
2. the reverse has NO transpose->transpose permute chain;
3. reverse permute count (D-1 independent shifts per ring) and bytes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def gp_setup():
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.parallel.gp_batch import make_ring_index
    from alignn_tpu.parallel.graph_parallel import check_divisible
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state
    from tools.gp_sweep import build_batch

    d = 8
    batch = build_batch(16)
    check_divisible(batch, d)
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=2, gcn_layers=1,
        hidden_features=64, embedding_features=32,
        gradwise_weight=1.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    state = create_train_state(model, batch,
                               build_optimizer("adamw", 1e-3, 0.0))
    ring = make_ring_index(batch, d)
    return {"d": d, "batch": batch, "cfg": cfg,
            "variables": state.variables(), "ring": ring}


def _gp_outputs(setup, monkeypatch, mode):
    from alignn_tpu.parallel.graph_parallel import GRAPH_AXIS, \
        make_gp_forward
    from alignn_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("ALIGNN_TPU_GP_RING", mode)
    mesh = make_mesh(setup["d"], axis_names=(GRAPH_AXIS,))
    fwd = make_gp_forward(setup["cfg"], mesh, setup["variables"])
    return jax.device_get(fwd(setup["batch"], setup["ring"]))


def test_gather_mode_matches_chain(gp_setup, monkeypatch):
    out_c, forces_c, stress_c = _gp_outputs(gp_setup, monkeypatch,
                                            "chain")
    out_g, forces_g, stress_g = _gp_outputs(gp_setup, monkeypatch,
                                            "gather")
    np.testing.assert_allclose(out_g, out_c, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(forces_g, forces_c, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stress_g, stress_c, rtol=1e-5, atol=1e-6)


def test_ring_broadcast_grad_of_grad(monkeypatch):
    """Second-order parity of the custom VJP (force training hits it)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from alignn_tpu.parallel.gp_model import ring_broadcast
    from alignn_tpu.parallel.mesh import make_mesh

    d = 4
    mesh = make_mesh(d, axis_names=("graph",))
    x = np.linspace(0.1, 1.0, d * 6).reshape(d * 3, 2).astype(np.float32)
    w = np.arange(1, d + 1, dtype=np.float32)[:, None, None]

    def make(fn_buf):
        def per_dev(xl):
            def inner(v):
                stack = fn_buf(v)
                return jnp.sum(w * jnp.sin(stack) ** 2)

            def outer(v):
                g = jax.grad(inner)(v)
                return jnp.sum(g ** 3)

            return jax.grad(outer)(xl)

        return jax.jit(shard_map(per_dev, mesh=mesh,
                                 in_specs=(P("graph"),),
                                 out_specs=P("graph"),
                                 check_rep=False))

    from alignn_tpu.parallel.gp_model import _ring_chain

    custom = make(lambda v: ring_broadcast(v, d, "graph"))(x)
    plain = make(lambda v: jnp.stack(_ring_chain(v, d, "graph")))(x)
    np.testing.assert_allclose(np.asarray(custom), np.asarray(plain),
                               rtol=1e-5, atol=1e-6)


def test_gather_reverse_is_chain_free(monkeypatch):
    """Single ring stage: the chain mode's reverse hops depend on each
    other (accumulate-and-forward); the gather mode's do not.  The full
    model has legitimate cross-LAYER transpose dependencies in both
    modes, so the discriminator is pinned on one isolated stage."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from alignn_tpu.parallel.gp_model import (
        _ring_chain,
        _ring_perm,
        ring_broadcast,
    )
    from alignn_tpu.parallel.hlo_audit import _phase_of, \
        parse_instructions
    from alignn_tpu.parallel.mesh import make_mesh

    d, s_loc, w = 8, 16, 4
    mesh = make_mesh(d, axis_names=("graph",))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((d * s_loc, w)).astype(np.float32)
    idx = rng.integers(0, s_loc, size=(d, d, 24)).astype(np.int32)

    def compile_text(gather):
        def per_dev(xl, idx_l):
            def loss(v):
                bufs = ring_broadcast(v, d, "graph") if gather else None
                total = 0.0
                b = v
                for k in range(d):
                    step = bufs[k] if gather else b
                    total = total + jnp.sum(jnp.tanh(step[idx_l[0, k]]))
                    if not gather and k + 1 < d:
                        b = jax.lax.ppermute(b, "graph", _ring_perm(d))
                return total

            return jax.grad(loss)(xl)

        return jax.jit(shard_map(
            per_dev, mesh=mesh, in_specs=(P("graph"), P("graph")),
            out_specs=P("graph"), check_rep=False)
        ).lower(x, idx).compile().as_text()

    def tt_chained(text):
        instrs = parse_instructions(text)
        tperms = {n for n, i in instrs.items()
                  if i.opcode.startswith("collective-permute")
                  and _phase_of(i.op_name) == "transpose"}
        assert tperms, "no transpose permutes parsed"
        import sys

        sys.setrecursionlimit(200000)
        memo = {}

        def reaches(name):
            if name in memo:
                return memo[name]
            memo[name] = False
            ins = instrs.get(name)
            if ins is None:
                return False
            for dep in ins.deps:
                if dep in tperms or reaches(dep):
                    memo[name] = True
                    break
            return memo[name]

        return [t for t in tperms
                if any(dd in tperms or reaches(dd)
                       for dd in instrs[t].deps)]

    assert tt_chained(compile_text(gather=False))  # the knee, present
    assert tt_chained(compile_text(gather=True)) == []
