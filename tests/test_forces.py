"""The gold numerical test: force-reduction semantics.

Port of the reference's pinned semantics (tests/test_force_reduction.py):
for a two-EGGC model whose energy depends only on positions,
  (a) forces from d(E)/d(positions) via autodiff,
  (b) forces from d(E)/d(bond vectors) scattered as
      sum_{e: dst=i} pf_e - sum_{e: src=i} pf_e,
  (c) centered finite differences
must all agree elementwise (float64, atol 1e-5 / rtol 1e-3).

This pins down exactly the force-reduction convention the FF model uses
(alignn_tpu.nn.models.atomwise_forward).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from alignn_tpu.chem import Atoms
from alignn_tpu.nn.layers import Dense, EdgeGatedGraphConv
from alignn_tpu.ops.segment import segment_sum

POSCAR = "/root/reference/alignn/examples/sample_data/POSCAR-JVASP-98225.vasp"
CUTOFF = 5.0
WIDTH = 16


def _nonperiodic_radius_edges(positions: np.ndarray, cutoff: float):
    """Open-boundary radius graph (the reference test uses dgl.radius_graph)."""
    d = np.linalg.norm(positions[None] - positions[:, None], axis=-1)
    src, dst = np.nonzero((d <= cutoff) & (d > 1e-8))
    return src.astype(np.int32), dst.astype(np.int32)


class SimpleModel(nn.Module):
    """Two EGGC layers on an open-boundary graph; energy = sum over nodes."""

    width: int = WIDTH

    @nn.compact
    def __call__(self, positions, src, dst):
        bondvec = positions[dst] - positions[src]
        bondlength = jnp.linalg.norm(bondvec, axis=1)
        y = Dense(self.width, name="edge_embedding")(bondlength[:, None])
        x = jnp.ones((positions.shape[0], self.width), positions.dtype)
        x, y = EdgeGatedGraphConv(self.width, norm="layernorm",
                                  name="hidden1")(x, y, src, dst)
        x, y = EdgeGatedGraphConv(self.width, norm="layernorm",
                                  name="hidden2")(x, y, src, dst)
        energy = Dense(1, name="fc")(x)
        return jnp.sum(energy), bondvec


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def setup(x64):
    at = Atoms.from_poscar(POSCAR)
    positions = jnp.asarray(at.cart_coords, dtype=jnp.float64)
    src, dst = _nonperiodic_radius_edges(np.asarray(positions), CUTOFF)
    model = SimpleModel()
    variables = model.init(jax.random.PRNGKey(0), positions,
                           jnp.asarray(src), jnp.asarray(dst))
    variables = jax.tree.map(lambda v: v.astype(jnp.float64), variables)
    return model, variables, positions, jnp.asarray(src), jnp.asarray(dst)


def _energy_of_positions(model, variables, src, dst):
    def f(pos):
        e, _ = model.apply(variables, pos, src, dst)
        return e
    return f


def test_position_vs_displacement_autograd_forces(setup):
    model, variables, positions, src, dst = setup

    # (a) position autograd
    f_x = -jax.grad(_energy_of_positions(model, variables, src, dst))(
        positions)

    # (b) displacement autograd + scatter over edges and reverse edges
    def energy_of_bondvec(bondvec):
        bondlength = jnp.linalg.norm(bondvec, axis=1)
        y = Dense(WIDTH, name="edge_embedding").apply(
            {"params": variables["params"]["edge_embedding"]},
            bondlength[:, None])
        x = jnp.ones((positions.shape[0], WIDTH), positions.dtype)
        x, y = EdgeGatedGraphConv(WIDTH, norm="layernorm").apply(
            {"params": variables["params"]["hidden1"]}, x, y, src, dst)
        x, y = EdgeGatedGraphConv(WIDTH, norm="layernorm").apply(
            {"params": variables["params"]["hidden2"]}, x, y, src, dst)
        e = Dense(1).apply({"params": variables["params"]["fc"]}, x)
        return jnp.sum(e)

    bondvec = positions[dst] - positions[src]
    pair_forces = -jax.grad(energy_of_bondvec)(bondvec)
    n = positions.shape[0]
    f_vec = (segment_sum(pair_forces, dst, n)
             - segment_sum(pair_forces, src, n))

    np.testing.assert_allclose(np.asarray(f_x), np.asarray(f_vec),
                               rtol=1e-8, atol=1e-10)


def test_forces_match_finite_difference(setup):
    model, variables, positions, src, dst = setup
    energy_fn = jax.jit(_energy_of_positions(model, variables, src, dst))
    f_x = -jax.grad(_energy_of_positions(model, variables, src, dst))(
        positions)

    delta = 1e-6
    rng = np.random.RandomState(0)
    # spot-check a random subset of (atom, component) pairs; full double
    # loop is O(3N) energy evaluations
    pairs = [(int(i), int(j)) for i, j in
             zip(rng.randint(0, positions.shape[0], 12), rng.randint(0, 3, 12))]
    pairs += [(0, 0), (1, 2)]
    for i, j in pairs:
        xa = np.asarray(positions).copy()
        xb = np.asarray(positions).copy()
        xa[i, j] -= delta
        xb[i, j] += delta
        fd = -(energy_fn(jnp.asarray(xa)) - energy_fn(jnp.asarray(xb))) / (
            -2 * delta)
        np.testing.assert_allclose(float(fd), float(f_x[i, j]),
                                   rtol=1e-3, atol=1e-5)
