"""Persistent inference server — keep the model warm, serve predictions.

Beyond the reference (which only has one-shot CLIs): a lightweight
HTTP/JSON server for production-style serving of a trained or zoo
model.  The model loads once, the jitted forward stays compiled across
requests (padded-bucket batching from `zoo.predict_structures`), and an
optional FF endpoint serves energy/forces/stress through the
compile-once Calculator.

    python -m alignn_tpu.cli.serve --model_dir out --port 8000

Endpoints (JSON):
  GET  /health            -> {"status": "ok", "model": ...}
  POST /predict           {"atoms": {...}} or {"atoms_list": [{...}]}
                          -> {"predictions": [[...], ...]}
  POST /ff                {"atoms": {...}}
                          -> {"energy": e, "forces": [[...]], "stress": [...]}

`atoms` dicts use the jarvis schema (lattice_mat / coords / elements /
cartesian) — the same payload the reference's datasets carry.
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class ModelService:
    """Owns the loaded model + warm jitted paths; thread-safe."""

    def __init__(self, model_dir: str, cutoff: float = 8.0,
                 max_neighbors: int = 12, ff: bool = False):
        from alignn_tpu.zoo import load_model_dir

        self.model, self.variables, self.cfg = load_model_dir(model_dir)
        self.model_dir = model_dir
        self.cutoff = cutoff
        self.max_neighbors = max_neighbors
        self.atom_features = self.cfg.get("atom_features", "cgcnn")
        self._lock = threading.Lock()  # jax dispatch from one thread
        self._calc = None
        self._fwd = None            # persistent jitted forward
        self._spec = None           # monotone bucket floor
        if ff:
            from alignn_tpu.ff.calculator import Calculator

            self._calc = Calculator(path=model_dir)

    def _get_fwd(self):
        """ONE jitted forward for the server's lifetime.

        zoo.predict_structures builds a fresh jit closure per call,
        which re-traces on every request — fine for one-shot CLIs,
        wrong for serving."""
        if self._fwd is None:
            import jax

            from alignn_tpu.nn.ealignn import (
                eALIGNNAtomWise,
                ealignn_forward,
            )
            from alignn_tpu.nn.models import (
                ALIGNNAtomWise,
                atomwise_forward,
            )

            if isinstance(self.model, eALIGNNAtomWise):
                self._fwd = jax.jit(lambda v, b: ealignn_forward(
                    self.model, v, b, train=False)["out"])
            elif isinstance(self.model, ALIGNNAtomWise):
                self._fwd = jax.jit(lambda v, b: atomwise_forward(
                    self.model, v, b, train=False)["out"])
            else:
                self._fwd = jax.jit(lambda v, b: self.model.apply(
                    v, b, train=False))
        return self._fwd

    def _merge_spec(self, spec):
        """Grow the bucket floor monotonically: repeated similar
        requests reuse the same padded shapes (bounded recompiles)."""
        from alignn_tpu.graph.batch import BucketSpec

        if self._spec is not None:
            spec = BucketSpec(
                n_nodes=max(spec.n_nodes, self._spec.n_nodes),
                n_edges=max(spec.n_edges, self._spec.n_edges),
                n_lg_edges=max(spec.n_lg_edges, self._spec.n_lg_edges),
                n_graphs=max(spec.n_graphs, self._spec.n_graphs),
                dense_D=spec.dense_D)
        self._spec = spec
        return spec

    def predict(self, atoms_dicts):
        import jax
        import numpy as np

        from alignn_tpu.chem.atoms import Atoms
        from alignn_tpu.data.loader import worst_case_spec
        from alignn_tpu.graph.batch import batch_graphs
        from alignn_tpu.graph.build import build_graph

        structs = [Atoms.from_dict(d) for d in atoms_dicts]
        graphs = [build_graph(a, cutoff=self.cutoff,
                              max_neighbors=self.max_neighbors)
                  for a in structs]
        with self._lock:
            spec = self._merge_spec(
                worst_case_spec(graphs, len(graphs)))
            batch = batch_graphs(graphs, spec,
                                 atom_features=self.atom_features)
            out = np.asarray(jax.device_get(
                self._get_fwd()(self.variables, batch)))
        return out[:len(graphs)].tolist()

    def ff(self, atoms_dict):
        if self._calc is None:
            raise ValueError("server started without --ff")
        from alignn_tpu.chem.atoms import Atoms

        with self._lock:
            res = self._calc.calculate(Atoms.from_dict(atoms_dict))
        return {"energy": float(res["energy"]),
                "forces": res["forces"].tolist(),
                "stress": res["stress"].tolist()}


def make_handler(service: ModelService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok",
                                 "model": service.model_dir,
                                 "ff": service._calc is not None})
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/predict":
                    atoms = req.get("atoms_list") or [req["atoms"]]
                    self._send(200, {"predictions":
                                     service.predict(atoms)})
                elif self.path == "/ff":
                    self._send(200, service.ff(req["atoms"]))
                else:
                    self._send(404,
                               {"error": f"unknown path {self.path}"})
            except Exception as e:  # noqa: BLE001 — serve errors as JSON
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(model_dir: str, host: str = "127.0.0.1", port: int = 8000,
          cutoff: float = 8.0, max_neighbors: int = 12,
          ff: bool = False, warmup: bool = True):
    """Build the service + HTTP server; returns (server, service)."""
    service = ModelService(model_dir, cutoff=cutoff,
                           max_neighbors=max_neighbors, ff=ff)
    if warmup:
        # compile the bucketed forward before the first request lands
        import numpy as np

        probe = {"lattice_mat": (np.eye(3) * 4.0).tolist(),
                 "coords": [[0, 0, 0], [0.5, 0.5, 0.5]],
                 "elements": ["Na", "Cl"]}
        service.predict([probe])
    server = ThreadingHTTPServer((host, port), make_handler(service))
    return server, service


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model_dir", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--cutoff", type=float, default=8.0)
    p.add_argument("--max_neighbors", type=int, default=12)
    p.add_argument("--ff", action="store_true",
                   help="also expose the /ff energy/forces/stress "
                        "endpoint (atomwise models)")
    args = p.parse_args(argv)
    # After argparse: --help/bad-args exit before any JAX work, and the
    # cache decision itself never initializes a backend (ADVICE r3).
    from alignn_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    server, _service = serve(args.model_dir, args.host, args.port,
                             args.cutoff, args.max_neighbors, args.ff)
    print(json.dumps({"serving": f"http://{args.host}:{args.port}",
                      "model": args.model_dir}), flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
