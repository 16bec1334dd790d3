"""Model-backed calculator: energy / forces / stress for one structure.

Equivalent of reference `AlignnAtomwiseCalculator`
(`alignn/ff/calculators.py:170-372`) without the ASE dependency: a small
framework-owned Calculator protocol (`get_potential_energy`,
`get_forces`, `get_stress`) consumed by :mod:`alignn_tpu.ff.relax`,
:mod:`alignn_tpu.ff.md` and :mod:`alignn_tpu.ff.tasks`.

TPU-first difference from the reference: the jitted
energy+forces+stress function is compiled ONCE against a padded bucket
sized from the first structure (with slack), and subsequent calls —
every MD/relaxation step — reuse the compile as long as the graph fits
the bucket (grown geometrically on overflow).  The reference rebuilds a
DGL graph and re-enters torch eagerly per step
(ff/calculators.py:284-291).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

from alignn_tpu.chem.atoms import Atoms
from alignn_tpu.graph.batch import BucketSpec, GraphBatch, batch_graphs
from alignn_tpu.graph.build import build_graph
from alignn_tpu.nn.models import EV_A3_TO_GPA


def full_3x3_to_voigt_6_stress(s: np.ndarray) -> np.ndarray:
    """ASE-ordering Voigt: [xx, yy, zz, yz, xz, xy]."""
    s = np.asarray(s)
    return np.array([s[0, 0], s[1, 1], s[2, 2],
                     (s[1, 2] + s[2, 1]) / 2,
                     (s[0, 2] + s[2, 0]) / 2,
                     (s[0, 1] + s[1, 0]) / 2])


def _round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


class Calculator:
    """Energy/forces/stress from a trained atomwise model.

    Parameters mirror the reference calculator's knobs
    (ff/calculators.py:170-208): `intensive` multiplies energy by natoms,
    `force_multiplier`/`force_mult_natoms` scale forces, `stress_wt`
    scales the Voigt stress (divided by 160.2177 into eV/A^3 units).
    """

    def __init__(self, path: Optional[str] = None, model=None,
                 variables=None, config: Optional[Dict[str, Any]] = None,
                 intensive: bool = True, force_multiplier: float = 1.0,
                 force_mult_natoms: bool = False, stress_wt: float = 1.0,
                 bucket_slack: float = 1.3, skin: float = 0.3,
                 dense: Optional[bool] = None,
                 force_mult_batchsize: bool = False,
                 tie_tol: float = 1e-6):
        if model is None:
            from alignn_tpu.zoo import load_model_dir

            if path is None:
                # reference parity: AlignnAtomwiseCalculator() with no
                # path uses the default FF model (ff/calculators.py:209)
                path = default_path()
                if path is None:
                    raise ValueError(
                        "pass a model directory `path` or a model (the "
                        "default FF model needs network to download)")
            model, variables, config = load_model_dir(path)
        self.model = model
        self.variables = variables
        self.config = config or {}
        self.intensive = intensive
        self.force_multiplier = force_multiplier
        self.force_mult_natoms = force_mult_natoms
        # DOCUMENTED DEVIATION: the reference ASE calculator multiplies
        # forces by the TRAINING batch size by default
        # (ff/calculators.py:191,364-365 force_mult_batchsize=True) — a
        # training-scale artifact, not physics.  This calculator
        # defaults to physical forces; set force_mult_batchsize=True to
        # reproduce reference trajectories with converted checkpoints.
        self.force_mult_batchsize = force_mult_batchsize
        self.stress_wt = stress_wt
        self.bucket_slack = bucket_slack
        self._spec: Optional[BucketSpec] = None
        self._fn = None
        self._cache_key = None
        self._results: Optional[Dict[str, np.ndarray]] = None
        # skin-radius neighbor-list reuse: the graph is built with
        # cutoff+skin; as long as no atom moved more than skin/2 since
        # the last build, the edge index set is still valid and only the
        # displacement vectors r are recomputed (classic Verlet-list
        # optimization; the reference rebuilds the DGL graph every MD
        # step, ff/calculators.py:284-291)
        self.skin = float(skin)
        self._nl_graph = None          # cached GraphData (index arrays)
        self._nl_cart0 = None          # positions at build time
        self._nl_lat0 = None

        # dense-neighborhood execution layout (graph/dense.py): per-call
        # batching becomes block-structured and the model runs the
        # gather/scatter-free fast paths.  Defaults from the training
        # config; falls back to the sparse layout per-call if the graph
        # is asymmetric (dense requires the (i->j)/(j->i) involution).
        if dense is None:
            dense = bool(self.config.get("dense_neighborhoods", False))
        self.dense = bool(dense)
        self._dense_warned = False

        # reference parity (ff/calculators.py:219-224): checkpoints
        # trained with stresswise_weight=0 would return all-zero stress
        # (silently freezing cell relaxations / NPT); the reference
        # patches the weight to 0.1 before building — stress comes from
        # the same force gradient, so no parameters are affected
        import dataclasses as _dc

        cfg_m = getattr(self.model, "cfg", None)
        if cfg_m is not None and \
                getattr(cfg_m, "stresswise_weight", 1.0) == 0 and \
                getattr(cfg_m, "calculate_gradient", True):
            self.model = type(self.model)(
                cfg=_dc.replace(cfg_m, stresswise_weight=0.1),
                **{f.name: getattr(self.model, f.name)
                   for f in _dc.fields(type(self.model))
                   if f.name != "cfg" and not f.name.startswith("_")})

        # per-species reference-energy add-back (data/baseline.py): a
        # model trained on residual targets
        # (config.per_species_energy_baseline) predicts E/atom MINUS
        # sum_s x_s mu_s; restore physical energies by adding
        # sum_atoms mu(el) to the (extensive) energy
        sb = self.config.get("species_baseline") or {}
        self.species_baseline = sb.get("elements") if isinstance(
            sb, dict) else None

        self.neighbor_strategy = self.config.get(
            "neighbor_strategy", "radius_graph")
        # scale-invariant k-NN shell ties (graph/build.py tie_tol
        # docstring): exact-compare tie flicker puts ~0.01 eV/atom
        # steps into EOS volume scans and FD phonons — derivative
        # observables need a stable edge set.  0.0 restores exact
        # reference-parity graph construction.
        self.tie_tol = float(tie_tol)
        # a model trained with a pruned line graph (config.lg_cutoff)
        # must see the SAME pruned L(g) at inference
        lgc = self.config.get("lg_cutoff")
        self.lg_cutoff = float(lgc) if lgc is not None else None
        self.cutoff = float(self.config.get("cutoff", 8.0))
        self.max_neighbors = int(self.config.get("max_neighbors", 12))
        self.use_canonize = bool(self.config.get("use_canonize", True))
        self.atom_features = self.config.get("atom_features", "cgcnn")

    # -- compile management -------------------------------------------------

    def _make_fn(self):
        import jax

        from alignn_tpu.nn.ealignn import eALIGNNAtomWise, ealignn_forward
        from alignn_tpu.nn.models import ALIGNNAtomWise, atomwise_forward

        model, variables = self.model, self.variables
        if isinstance(model, eALIGNNAtomWise):
            @jax.jit
            def fn(batch: GraphBatch):
                res = ealignn_forward(model, variables, batch, train=False)
                return res["out"], res["grad"], res["stresses"]
            return fn
        cfg_name = getattr(getattr(model, "cfg", None), "name", "")
        if not isinstance(model, ALIGNNAtomWise) and \
                "atomwise" not in str(cfg_name):
            # the ALIGNN property model also has .cfg but takes no bond
            # vectors — reject it here instead of a cryptic trace error
            raise TypeError("Calculator requires an atomwise model, "
                            f"got {type(model).__name__} ({cfg_name})")

        @jax.jit
        def fn(batch: GraphBatch):
            res = atomwise_forward(model, variables, batch, train=False)
            return res["out"], res["grad"], res["stresses"]

        return fn

    def _make_prop_fn(self):
        """Jitted (batch) -> (atomwise_pred, additional) for iCalculator."""
        import jax

        from alignn_tpu.nn.models import atomwise_forward

        model, variables = self.model, self.variables

        @jax.jit
        def fn(batch: GraphBatch):
            res = atomwise_forward(model, variables, batch, train=False)
            return res["atomwise_pred"], res["additional"]

        return fn

    def _spec_for(self, g) -> BucketSpec:
        s = self.bucket_slack
        return BucketSpec(
            n_nodes=_round_up(int(g.num_nodes * s) + 1, 128),
            n_edges=_round_up(int(g.num_edges * s) + 1, 128),
            n_lg_edges=_round_up(int(g.num_lg_edges * s) + 1, 512),
            n_graphs=2,
        )

    def _prune_lg(self, r_kept, lg_src, lg_dst):
        """Skin-reuse twin of build_graph's lg_cutoff pruning: keep only
        pairs whose two bonds are both <= lg_cutoff."""
        if self.lg_cutoff is None:
            return lg_src, lg_dst
        import numpy as _np

        short = _np.linalg.norm(r_kept, axis=1) <= self.lg_cutoff
        keep = short[lg_src] & short[lg_dst]
        return lg_src[keep], lg_dst[keep]

    # -- calculation --------------------------------------------------------

    def _graph_for(self, atoms: Atoms):
        """Graph via skin-radius (Verlet-list) reuse.

        Radius strategies only: the neighbor candidate set is built once
        with cutoff+skin; while no atom has moved skin/2 since that
        build, the candidate indices are reused — recompute r, keep the
        edges whose current length is within the true cutoff, rebuild
        the (cheap, vectorized) line-graph indices.  Exactly the edge
        set a fresh search would produce.  k-nearest rebuilds every call
        (its edge set depends on distance ORDER, not a fixed radius).
        """
        # wrap into [0, 1) FIRST, mirroring build_graph's internal
        # wrapping: the cached candidate set's image vectors were
        # computed against wrapped coordinates, so recomputing r from
        # UNWRAPPED caller positions shifts every bond of a
        # boundary-crossing atom by a lattice vector and silently drops
        # it from the cutoff filter (found by the lg_cutoff skin-parity
        # test; any MD/relax trajectory crossing the cell boundary hit
        # it).  Wrapping makes cached and current positions commensurate
        # — an atom that crosses the boundary shows a lattice-sized
        # wrapped displacement and simply forces a conservative rebuild.
        from alignn_tpu.graph.build import wrap_frac

        frac = np.asarray(atoms.frac_coords)
        if frac.size and (frac.min() < 0.0 or frac.max() >= 1.0):
            atoms = Atoms(lattice_mat=atoms.lattice_mat,
                          frac_coords=wrap_frac(frac),
                          elements=atoms.elements)
        use_skin = self.skin > 0 and \
            self.neighbor_strategy.startswith("radius")
        cart = atoms.cart_coords
        if (use_skin and self._nl_graph is not None
                and self._nl_cart0 is not None
                and self._nl_cart0.shape == cart.shape
                and np.array_equal(self._nl_graph.z,
                                   atoms.atomic_numbers)
                and np.allclose(self._nl_lat0, atoms.lattice_mat,
                                atol=1e-12)):
            disp = np.linalg.norm(cart - self._nl_cart0, axis=1)
            if disp.max() < self.skin / 2:
                from alignn_tpu.graph.build import line_graph_edges

                gc = self._nl_graph  # candidate set (cutoff + skin)
                img_cart = gc.images @ atoms.lattice_mat
                r = cart[gc.dst] + img_cart - cart[gc.src]
                keep = np.linalg.norm(r, axis=1) <= self.cutoff
                src, dst = gc.src[keep], gc.dst[keep]
                covered = np.zeros(atoms.num_atoms, dtype=bool)
                covered[src] = True
                covered[dst] = True
                if covered.all() and keep.any():
                    lg_src, lg_dst = line_graph_edges(
                        src, dst, atoms.num_atoms)
                    lg_src, lg_dst = self._prune_lg(
                        r[keep], lg_src, lg_dst)
                    from alignn_tpu.graph.build import GraphData

                    return GraphData(
                        z=gc.z, frac_coords=atoms.frac_coords.astype(
                            np.float64),
                        lattice=atoms.lattice_mat.astype(np.float64),
                        volume=atoms.volume, src=src, dst=dst,
                        r=r[keep], images=gc.images[keep],
                        lg_src=lg_src, lg_dst=lg_dst)
                # isolated atom after filtering: a fresh build would
                # auto-extend the cutoff — fall through to full rebuild
        if not use_skin:
            return build_graph(
                atoms, neighbor_strategy=self.neighbor_strategy,
                cutoff=self.cutoff, max_neighbors=self.max_neighbors,
                use_canonize=self.use_canonize,
                tie_tol=self.tie_tol, lg_cutoff=self.lg_cutoff)
        gc = build_graph(
            atoms, neighbor_strategy=self.neighbor_strategy,
            cutoff=self.cutoff + self.skin,
            max_neighbors=self.max_neighbors,
            use_canonize=self.use_canonize, compute_line_graph=False,
            tie_tol=self.tie_tol, lg_cutoff=self.lg_cutoff)
        self._nl_graph = gc
        self._nl_cart0 = cart.copy()
        self._nl_lat0 = atoms.lattice_mat.copy()
        # first evaluation: filter the candidate set to the true cutoff
        from alignn_tpu.graph.build import GraphData, line_graph_edges

        keep = np.linalg.norm(gc.r, axis=1) <= self.cutoff
        src, dst = gc.src[keep], gc.dst[keep]
        covered = np.zeros(atoms.num_atoms, dtype=bool)
        covered[src] = True
        covered[dst] = True
        if not covered.all() or not keep.any():
            # fresh build would auto-extend its cutoff; don't cache
            self._nl_graph = None
            return build_graph(
                atoms, neighbor_strategy=self.neighbor_strategy,
                cutoff=self.cutoff, max_neighbors=self.max_neighbors,
                use_canonize=self.use_canonize,
                tie_tol=self.tie_tol, lg_cutoff=self.lg_cutoff)
        lg_src, lg_dst = line_graph_edges(src, dst, atoms.num_atoms)
        lg_src, lg_dst = self._prune_lg(gc.r[keep], lg_src, lg_dst)
        return GraphData(
            z=gc.z, frac_coords=gc.frac_coords, lattice=gc.lattice,
            volume=gc.volume, src=src, dst=dst, r=gc.r[keep],
            images=gc.images[keep], lg_src=lg_src, lg_dst=lg_dst)

    def _batch_and_fn(self, g, make_fn):
        """Shared bucket/compile management: grow the spec on overflow
        (recompile), batch into it, return (batch, jitted fn)."""
        if self.dense:
            from alignn_tpu.graph.dense import (
                AsymmetricEdgesError, max_in_degree)

            # dense is a k-NN-build optimization (near-uniform degree):
            # high-degree radius graphs pad N*D^2 L-rows to ~1%
            # occupancy and measured 5x SLOWER (BENCH_NOTES md_jit
            # layout A/B) — route them to sparse
            D = max_in_degree([g])
            occ = g.num_edges / max(g.num_nodes * max(D, 1), 1)
            if D > 20 or occ < 0.4:
                if not self._dense_warned:
                    print(f"[calculator] dense layout skipped: in-degree"
                          f" {D} / occupancy {occ:.2f} would waste the "
                          f"D^2 padding (k-NN builds are the dense "
                          f"target); using sparse")
                    self._dense_warned = True
                return self._sparse_batch_and_fn(g, make_fn,
                                                 fallback=True)

            try:
                return self._dense_batch_and_fn(g, make_fn, indeg=D)
            except AsymmetricEdgesError as exc:
                # expected per-STRUCTURE condition (e.g. a radius-graph
                # bond within a float ulp of the cutoff breaks the
                # reverse involution): fall back to sparse for THIS
                # call only; later symmetric structures stay dense.
                # Other ValueErrors (dst-sort, spec consistency) are
                # invariant violations and propagate.
                if not self._dense_warned:
                    print(f"[calculator] dense layout unavailable for "
                          f"this structure ({exc}); using sparse")
                    self._dense_warned = True
                return self._sparse_batch_and_fn(g, make_fn,
                                                 fallback=True)
        return self._sparse_batch_and_fn(g, make_fn, fallback=False)

    def _sparse_batch_and_fn(self, g, make_fn, fallback: bool):
        """Sparse-layout cache: the primary (_spec/_fn) slots when the
        calculator is configured sparse, a separate fallback pair when
        dense mode detours for an asymmetric structure."""
        spec_attr = "_fb_spec" if fallback else "_spec"
        fn_attr = "_fb_fn" if fallback else "_fn"
        spec = getattr(self, spec_attr, None)
        if (spec is None
                or getattr(spec, "dense_D", 0)
                or g.num_nodes >= spec.n_nodes
                or g.num_edges >= spec.n_edges
                or g.num_lg_edges >= spec.n_lg_edges):
            spec = self._spec_for(g)
            setattr(self, spec_attr, spec)
            setattr(self, fn_attr, None)
        if getattr(self, fn_attr, None) is None:
            setattr(self, fn_attr, make_fn())
        batch = batch_graphs([g], spec,
                             atom_features=self.atom_features,
                             gather_windows=False)
        return batch, getattr(self, fn_attr)

    def _dense_batch_and_fn(self, g, make_fn, indeg=None):
        from alignn_tpu.graph.dense import (
            dense_batch_graphs, dense_spec_with_slack, max_in_degree)

        if indeg is None:
            indeg = max_in_degree([g])
        if (self._spec is None or not getattr(self._spec, "dense_D", 0)
                or g.num_nodes >= self._spec.n_nodes
                or indeg > self._spec.dense_D):
            self._spec = dense_spec_with_slack(
                g, bucket_slack=self.bucket_slack)
            self._fn = None
        # raises AsymmetricEdgesError on an asymmetric edge set (the
        # caller falls back to sparse for this call)
        batch = dense_batch_graphs([g], self._spec,
                                   atom_features=self.atom_features)
        if self._fn is None:
            self._fn = make_fn()
        return batch, self._fn

    def calculate(self, atoms: Atoms) -> Dict[str, np.ndarray]:
        g = self._graph_for(atoms)
        batch, fn = self._batch_and_fn(g, self._make_fn)
        import jax

        out, grad, stress = jax.device_get(fn(batch))
        n = atoms.num_atoms
        energy = float(np.asarray(out)[0, 0])
        if self.intensive:
            energy *= n
        if self.species_baseline:
            energy += float(sum(self.species_baseline.get(el, 0.0)
                                for el in atoms.elements))
        forces = np.asarray(grad)[:n] * self.force_multiplier
        if self.force_mult_natoms:
            forces = forces * n
        if self.force_mult_batchsize:
            # reference ff/calculators.py:364-365 (see __init__ note)
            forces = forces * int(self.config.get("batch_size", 1))
        stress_3x3 = np.asarray(stress)[0]
        stress_voigt = full_3x3_to_voigt_6_stress(
            stress_3x3) * self.stress_wt / EV_A3_TO_GPA
        self._results = {
            "energy": energy,
            "forces": forces,
            "stress": stress_voigt,
            "stress_3x3": stress_3x3 * self.stress_wt / EV_A3_TO_GPA,
        }
        return self._results

    def get_potential_energy(self, atoms: Atoms) -> float:
        return self.calculate(atoms)["energy"]

    def get_forces(self, atoms: Atoms) -> np.ndarray:
        return self.calculate(atoms)["forces"]

    def get_stress(self, atoms: Atoms) -> np.ndarray:
        """Voigt-6 stress in eV/A^3 (ASE convention)."""
        return self.calculate(atoms)["stress"]


def default_path() -> Optional[str]:
    """Default FF model directory (reference ff/calculators.py:100-110).

    Downloads `v12.2.2024_dft_3d_307k` from the figshare FF registry when
    network is available; returns None otherwise.
    """
    import zipfile

    reg_path = os.path.join(os.path.dirname(__file__), "zoo_ff_models.json")
    with open(reg_path) as f:
        reg = json.load(f)["alignn_atomwise"]
    name = "v12.2.2024_dft_3d_307k"
    url = reg[name]
    cache = os.path.join(os.path.expanduser("~"), ".cache", "alignn_tpu",
                         "ff", name)
    if os.path.isdir(cache) and os.listdir(cache):
        return cache
    try:
        import urllib.request

        os.makedirs(cache, exist_ok=True)
        zpath = os.path.join(cache, "model.zip")
        urllib.request.urlretrieve(url, zpath)
        with zipfile.ZipFile(zpath) as z:
            z.extractall(cache)
        os.remove(zpath)
        return cache
    except Exception as exc:  # pragma: no cover - zero-egress env
        print(f"[ff] default model download failed: {exc}")
        return None


DEFAULT_IPROPS = [
    "cbm", "vbm", "gap", "efermi", "optb88vdw_bandgap", "mbj_bandgap",
    "spillage", "slme", "bulk_modulus_kv", "shear_modulus_gv",
    "n-Seebeck", "n-powerfact", "avg_elec_mass", "avg_hole_mass",
    "epsx", "mepsx", "max_efg", "dfpt_piezo_max_dielectric",
    "dfpt_piezo_max_dij", "exfoliation_energy", "Tc_supercon",
    "magmom_oszicar",
]


class iCalculator(Calculator):
    """Dual-model calculator: FF energetics + property/atomwise extras.

    Equivalent of reference `iAlignnAtomwiseCalculator`
    (ff/calculators.py:375-542): one atomwise FF model supplies
    energy/forces/stress; a second multi-head property model supplies
    per-atom charges/magmoms (atomwise head) and the 22 named properties
    (additional head).  Negative gap-like properties clamp to 0.
    """

    def __init__(self, ff_path: Optional[str] = None,
                 prop_path: Optional[str] = None,
                 stress_wt: float = 0.05,
                 props=None, **kw):
        super().__init__(path=ff_path, stress_wt=stress_wt, **kw)
        self.props = props or list(DEFAULT_IPROPS)
        self._prop_calc = None
        if prop_path is not None:
            self._prop_calc = Calculator(path=prop_path)

    def calculate(self, atoms: Atoms) -> Dict[str, Any]:
        results = dict(super().calculate(atoms))
        if self._prop_calc is not None:
            pc = self._prop_calc
            g = build_graph(
                atoms, neighbor_strategy=pc.neighbor_strategy,
                cutoff=pc.cutoff, max_neighbors=pc.max_neighbors,
                use_canonize=pc.use_canonize)
            batch, fn = pc._batch_and_fn(g, pc._make_prop_fn)
            import jax

            atomwise, additional = jax.device_get(fn(batch))
            n = atoms.num_atoms
            atomwise = np.asarray(atomwise)[:n]
            if atomwise.shape[1] >= 2:
                results["charges"] = atomwise[:, 0].tolist()
                results["magmoms"] = atomwise[:, 1].tolist()
            additional = np.asarray(additional)[0]
            for name, val in zip(self.props, additional):
                v = float(val)
                if "gap" in name and v < 0:
                    v = 0.0
                results[name] = v
        self._results = results
        return results

