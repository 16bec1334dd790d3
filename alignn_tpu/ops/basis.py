"""Radial basis expansion and smooth cutoff envelopes (pure functions)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rbf_params(vmin: float, vmax: float, bins: int,
               lengthscale: float | None = None):
    """(centers, gamma) for the Gaussian RBF expansion.

    Mirrors reference `RBFExpansion` (`alignn/models/utils.py:11-44`)
    including its quirk: with the default SchNet-style lengthscale,
    gamma = 1/lengthscale (NOT 1/lengthscale**2).
    """
    centers = np.linspace(vmin, vmax, bins)
    if lengthscale is None:
        lengthscale = float(np.diff(centers).mean())
        gamma = 1.0 / lengthscale
    else:
        gamma = 1.0 / (lengthscale**2)
    # keep f64 here; jnp.asarray at the consumer casts per the active
    # precision mode (f32 by default, f64 under jax_enable_x64 — the
    # reference-oracle parity tests run the latter)
    return centers, float(gamma)


def rbf_expand(x: jnp.ndarray, centers: jnp.ndarray,
               gamma: float) -> jnp.ndarray:
    """exp(-gamma * (x - centers)^2); [E] -> [E, bins]."""
    return jnp.exp(-gamma * (x[..., None] - centers) ** 2)


def cutoff_function_based_edges(r: jnp.ndarray, inner_cutoff: float = 4.0,
                                exponent: int = 3) -> jnp.ndarray:
    """Smooth polynomial cutoff envelope.

    Mirrors reference `alignn/models/alignn_atomwise.py:97-124`: inside the
    cutoff a C^2 polynomial envelope, hard zero outside.
    """
    ratio = r / inner_cutoff
    c1 = -(exponent + 1) * (exponent + 2) / 2
    c2 = exponent * (exponent + 2)
    c3 = -exponent * (exponent + 1) / 2
    envelope = (1 + c1 * ratio**exponent + c2 * ratio ** (exponent + 1)
                + c3 * ratio ** (exponent + 2))
    return jnp.where(r <= inner_cutoff, envelope, jnp.zeros_like(r))


def bond_cosines(r: jnp.ndarray, lg_src: jnp.ndarray,
                 lg_dst: jnp.ndarray) -> jnp.ndarray:
    """Angle cosines for L-edges from bond displacement vectors.

    In-graph (differentiable) version of reference `compute_bond_cosines`
    (`alignn/graphs.py:847-864`); recomputed inside the jitted energy
    function so jax.grad captures 3-body terms — the JAX equivalent of the
    reference's `lg_on_fly` recompute (`alignn_atomwise.py:424-431`).
    """
    r1 = -r[lg_src]
    r2 = r[lg_dst]
    num = jnp.sum(r1 * r2, axis=1)
    den = jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r2, axis=1)
    return jnp.clip(num / den, -1.0, 1.0)


def bond_cosines_dense(r: jnp.ndarray, D: int) -> jnp.ndarray:
    """Angle cosines in the dense-neighborhood layout (graph/dense.py).

    The L-edge (a, b) at pair (j, t, s) has a = j*D+s and b = rev[j*D+t]
    with r_b == -r[j*D+t] exactly (symmetric edge set), so the reference
    cosine (-r_a . r_b / |r_a||r_b|, graphs.py:847-864) becomes the
    fully NODE-LOCAL + r_s . r_t / (|r_s||r_t|) — zero gathers, replacing
    the two [L, 3] gathers of :func:`bond_cosines`.  Returns the flat
    [N*D*D] vector in (j, t, s) order (s fastest).  Trash slots have
    r = (1,0,0), so the denominator never vanishes.
    """
    n = r.shape[0] // D
    rb = r.reshape(n, D, 3)
    dots = jnp.einsum("jtd,jsd->jts", rb, rb)
    norms = jnp.linalg.norm(rb, axis=-1)
    den = norms[:, :, None] * norms[:, None, :]
    return jnp.clip(dots / den, -1.0, 1.0).reshape(-1)
