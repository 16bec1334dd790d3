"""fc3 pipeline vs an ANALYTIC pair potential + phono3py export (V r2 #7).

The toy: FCC with nearest-neighbor anharmonic springs
V(r) = ka (r-r0)^2 + kb (r-r0)^3.  Everything differentiable about it
is known in closed form (or to machine precision via jax on the 3-dim
pair function), so it is an exact oracle for:

- the FD second-order force constants (ff/phonons.force_constants),
- the FD third-order force constants (ff/phonons3.third_order_fc),
- the translational acoustic sum rule over the third index,
- the phono3py-layout export (ff/phonons3.export_fc3),
- the Slack-model inputs: the mode Grüneisen of this potential has the
  analytic longitudinal estimate gamma = -(r0/6) V'''/V'' = -r0 kb/(2 ka)
  (uniform-scaling argument, exact up to transverse/tension mixing),
  against which the FD mode_gruneisen is pinned to a factor-2 window,
  and kappa(T) must follow the Slack 1/T law exactly.
"""

import numpy as np
import pytest

A0 = 3.6
R0 = A0 / np.sqrt(2.0)
KA = 2.0
KB = -1.5
CUT = 3.0  # NN only (2nd shell at a0 = 3.6)


def _fcc_cell():
    from alignn_tpu.chem.atoms import Atoms

    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    return Atoms(lattice_mat=np.eye(3) * A0, frac_coords=frac,
                 elements=["Cu"] * 4)


def _lex_pos(s):
    for x in s:
        if x > 0:
            return True
        if x < 0:
            return False
    return False


class ToyPairCalculator:
    """Analytic NN anharmonic-spring calculator (numpy closed form)."""

    def _pairlist(self, atoms):
        """(i, j, cartesian lattice shift) pairs within CUT, each bond
        counted once (j > i, or i == j with a lexically-positive image
        shift).  Cached on the lattice: FD displacements never change
        the minimum-image pairing, only mode_gruneisen's volume scaling
        does (different lattice -> different key)."""
        lat = np.asarray(atoms.lattice_mat)
        frac = np.asarray(atoms.frac_coords)
        key = (lat.tobytes(), frac.shape[0])
        cached = getattr(self, "_plcache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        n = len(frac)
        # [n, n, 27, 3] displacement table, vectorized
        d = (frac[None, :, None, :] + _SHIFTS[None, None, :, :]
             - frac[:, None, None, :]) @ lat
        r = np.linalg.norm(d, axis=-1)
        out = []
        ii, jj, ss = np.nonzero(r <= CUT)
        for i, j, s in zip(ii, jj, ss):
            if j < i:
                continue
            if j == i and (not _SHIFTS[s].any()
                           or not _lex_pos(_SHIFTS[s])):
                continue
            out.append((int(i), int(j), _SHIFTS[s] @ lat))
        self._plcache = (key, out)
        return out

    def _forces_energy(self, atoms):
        cart = np.asarray(atoms.cart_coords)
        pl = self._pairlist(atoms)
        i = np.array([p[0] for p in pl])
        j = np.array([p[1] for p in pl])
        s = np.array([p[2] for p in pl])
        d = cart[j] + s - cart[i]
        r = np.linalg.norm(d, axis=1)
        x = r - R0
        e = float(np.sum(KA * x * x + KB * x ** 3))
        g = ((2 * KA * x + 3 * KB * x * x) / r)[:, None] * d
        f = np.zeros_like(cart)
        np.add.at(f, i, g)
        np.add.at(f, j, -g)
        return f, e

    def get_forces(self, atoms):
        return self._forces_energy(atoms)[0]

    def calculate(self, atoms):
        f, e = self._forces_energy(atoms)
        return {"forces": f, "energy": e}

    def get_potential_energy(self, atoms):
        return self._forces_energy(atoms)[1]


_SHIFTS = np.array([[a, b, c] for a in (-1, 0, 1) for b in (-1, 0, 1)
                    for c in (-1, 0, 1)])


_T3_CACHE = []


def _exact_pair_t3(d):
    """Exact d^3 phi(|d|)/dd^3 via jax on the 3-vector pair function."""
    import jax
    import jax.numpy as jnp

    if not _T3_CACHE:
        def phi(x):
            r = jnp.linalg.norm(x)
            t = r - R0
            return KA * t * t + KB * t ** 3

        _T3_CACHE.append(jax.jit(
            jax.jacfwd(jax.jacfwd(jax.grad(phi)))))
    return np.asarray(_T3_CACHE[0](np.asarray(d, np.float64)))


@pytest.fixture(scope="module")
def toy():
    from alignn_tpu.ff.phonons3 import third_order_fc

    atoms = _fcc_cell()
    calc = ToyPairCalculator()
    fcdata = third_order_fc(calc, atoms, supercell=(2, 2, 2),
                            distance=0.02, pair_cutoff=CUT + 0.1)
    return {"atoms": atoms, "calc": calc, "fcdata": fcdata}


def test_forces_vanish_at_equilibrium(toy):
    f = toy["calc"].get_forces(toy["atoms"].make_supercell((2, 2, 2)))
    assert np.abs(f).max() < 1e-10


def test_fd_fc2_matches_exact_hessian(toy):
    """force_constants FD vs the analytic pair Hessian."""
    import jax
    import jax.numpy as jnp

    from alignn_tpu.ff.phonons import force_constants

    atoms, calc = toy["atoms"], toy["calc"]
    fc = force_constants(calc, atoms, supercell=(2, 2, 2), delta=0.005)
    sc = atoms.make_supercell((2, 2, 2))
    pairs = calc._pairlist(sc)

    def phi(x):
        r = jnp.linalg.norm(x)
        t = r - R0
        return KA * t * t + KB * t ** 3

    h = jax.jacfwd(jax.grad(phi))
    n = sc.num_atoms
    exact = np.zeros((n, 3, n, 3))
    cart = sc.cart_coords
    for i, j, s in pairs:
        t2 = np.asarray(h(cart[j] + s - cart[i]))
        exact[i, :, i, :] += t2
        exact[j, :, j, :] += t2
        exact[i, :, j, :] -= t2
        exact[j, :, i, :] -= t2
    got = np.asarray(fc["fc"])  # [n_prim, 3, n, 3]
    np.testing.assert_allclose(got, exact[:4], atol=5e-4)


def test_fd_fc3_matches_exact_third_derivative(toy):
    fcdata = toy["fcdata"]
    atoms, calc = toy["atoms"], toy["calc"]
    sc = atoms.make_supercell((2, 2, 2))
    pairs = calc._pairlist(sc)
    n = sc.num_atoms
    exact = np.zeros((4, 3, n, 3, n, 3))
    cart = sc.cart_coords
    for i, j, s in pairs:
        t3 = _exact_pair_t3(cart[j] + s - cart[i])
        # d = x_j - x_i + S: each u_j derivative carries +1, u_i -1
        for (p, sp) in ((i, -1.0), (j, 1.0)):
            if p >= 4:
                continue
            for (q, sq) in ((i, -1.0), (j, 1.0)):
                for (k, sk) in ((i, -1.0), (j, 1.0)):
                    exact[p, :, q, :, k, :] += sp * sq * sk * t3
    got = np.asarray(fcdata["fc3"])
    scale = np.abs(exact).max()
    assert scale > 0.1  # the toy really is anharmonic
    np.testing.assert_allclose(got, exact, atol=2e-3 * scale)


def test_fc3_translational_asr(toy):
    """Sum over the third atom index vanishes (drift-removed forces)."""
    fc3 = np.asarray(toy["fcdata"]["fc3"])
    asr = fc3.sum(axis=4)
    assert np.abs(asr).max() < 1e-6 * max(np.abs(fc3).max(), 1.0)


def test_export_fc3_phono3py_layout(toy, tmp_path):
    import h5py

    from alignn_tpu.ff.phonons3 import export_fc3

    fcdata = toy["fcdata"]
    sc = toy["atoms"].make_supercell((2, 2, 2))
    path = export_fc3(fcdata, str(tmp_path / "fc3.hdf5"), sc_atoms=sc)
    with h5py.File(path) as f:
        fc3 = f["fc3"][()]
        p2s = f["p2s_map"][()]
    n = sc.num_atoms
    assert fc3.shape == (4, n, n, 3, 3, 3)
    assert list(p2s) == [0, 1, 2, 3]
    # transpose mapping: hdf5 [i,j,k,a,b,c] == internal [i,a,j,b,k,c]
    ours = np.asarray(fcdata["fc3"])
    np.testing.assert_allclose(fc3[1, 2, 3], ours[1, :, 2, :, 3, :],
                               atol=0)
    # npz fallback carries the same arrays
    p2 = export_fc3(fcdata, str(tmp_path / "fc3.npz"), sc_atoms=sc)
    z = np.load(p2)
    np.testing.assert_allclose(z["fc3"], fc3)
    assert z["supercell_numbers"].shape == (n,)


def test_gruneisen_matches_analytic_window(toy):
    from alignn_tpu.ff.phonons3 import mode_gruneisen

    gamma_analytic = -R0 * KB / (2 * KA)  # = -(r0/6) V'''/V''
    out = mode_gruneisen(toy["calc"], toy["atoms"], supercell=(2, 2, 2))
    got = out["mean_abs_gruneisen"]
    assert gamma_analytic / 2 < got < gamma_analytic * 2, (
        f"FD gruneisen {got} vs analytic {gamma_analytic}")


def test_slack_kappa_physical(toy):
    from alignn_tpu.ff.phonons3 import thermal_conductivity

    out = thermal_conductivity(toy["calc"], toy["atoms"],
                               supercell=(2, 2, 2),
                               temperatures=(200, 400, 800))
    k = np.asarray(out["kappa_w_mk"])
    assert (k > 0).all() and np.isfinite(k).all()
    # exact Slack 1/T law
    np.testing.assert_allclose(k[0] / k[1], 2.0, rtol=1e-6)
    np.testing.assert_allclose(k[1] / k[2], 2.0, rtol=1e-6)
    assert out["theta_d_K"] > 50  # a real, stable spectrum


def test_export_force_constants_phonopy_text(toy, tmp_path):
    """fc2 text export: phonopy FORCE_CONSTANTS layout, lossless."""
    from alignn_tpu.ff.phonons import (
        export_force_constants,
        force_constants,
    )

    fc = force_constants(toy["calc"], toy["atoms"], supercell=(2, 2, 2),
                         delta=0.005)
    path = export_force_constants(fc, str(tmp_path / "FORCE_CONSTANTS"))
    lines = open(path).read().split()
    n_prim, n_super = int(lines[0]), int(lines[1])
    assert (n_prim, n_super) == (4, 32)
    # parse back: per (i, j) an index pair + 9 floats
    vals = np.array(lines[2:], dtype=object)
    per = 2 + 9
    assert len(vals) == n_prim * n_super * per
    blocks = vals.reshape(n_prim * n_super, per)
    # indices are 1-based row-major
    assert (int(blocks[0][0]), int(blocks[0][1])) == (1, 1)
    assert (int(blocks[-1][0]), int(blocks[-1][1])) == (4, 32)
    got = blocks[:, 2:].astype(np.float64).reshape(n_prim, n_super, 3, 3)
    want = np.transpose(np.asarray(fc["fc"]), (0, 2, 1, 3))
    np.testing.assert_allclose(got, want, atol=1e-12)
