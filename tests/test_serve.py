"""Inference server (cli/serve.py) over a forged zoo model — hermetic.

Spins the ThreadingHTTPServer on an ephemeral localhost port with the
file://-forged checkpoint from test_zoo_fetch, then exercises /health,
single + batch /predict, the /ff guard, and error handling through real
HTTP requests.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from test_zoo_fetch import _forge_model_zip


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import alignn_tpu.zoo as zoo
    from alignn_tpu.cli.serve import serve

    tmp_path = tmp_path_factory.mktemp("srv")
    zpath, _ = _forge_model_zip(tmp_path)
    orig = zoo.get_all_models
    zoo.get_all_models = lambda: {
        "forged_model": {"url": f"file://{zpath}", "output_features": 1}}
    try:
        model_dir = zoo.download_checkpoint(
            "forged_model", cache_dir=str(tmp_path / "cache"))
    finally:
        zoo.get_all_models = orig

    srv, service = serve(model_dir, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield {"url": f"http://127.0.0.1:{srv.server_address[1]}"}
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _atoms(a=4.0):
    return {"lattice_mat": (np.eye(3) * a).tolist(),
            "coords": [[0, 0, 0], [0.5, 0.5, 0.5]],
            "elements": ["Na", "Cl"]}


def test_health(server):
    with urllib.request.urlopen(server["url"] + "/health",
                                timeout=30) as r:
        out = json.loads(r.read())
    assert out["status"] == "ok" and out["ff"] is False


def test_predict_single_and_batch(server):
    code, out = _post(server["url"] + "/predict", {"atoms": _atoms()})
    assert code == 200
    assert np.isfinite(out["predictions"][0][0])

    code, out = _post(server["url"] + "/predict",
                      {"atoms_list": [_atoms(4.0), _atoms(4.2),
                                      _atoms(4.4)]})
    assert code == 200 and len(out["predictions"]) == 3


def test_ff_guard_and_errors(server):
    code, out = _post(server["url"] + "/ff", {"atoms": _atoms()})
    assert code == 400 and "without --ff" in out["error"]

    code, out = _post(server["url"] + "/predict", {"bogus": 1})
    assert code == 400 and "error" in out

    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(server["url"] + "/nope", timeout=30)


def test_ff_endpoint_success(tmp_path):
    """/ff on a saved atomwise model dir: energy/forces/stress JSON."""
    import jax

    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.cli.serve import serve
    from alignn_tpu.graph.batch import BucketSpec, batch_graphs
    from alignn_tpu.graph.build import build_graph
    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.train.checkpoint import save_params

    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=1, gcn_layers=1,
        hidden_features=16, embedding_features=8,
        gradwise_weight=1.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    probe = Atoms(lattice_mat=np.eye(3) * 4.0,
                  frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
                  elements=["Na", "Cl"])
    g = build_graph(probe, cutoff=6.0, max_neighbors=12)
    batch = batch_graphs([g], BucketSpec.tight_for_batch([g]))
    variables = model.init(jax.random.PRNGKey(0), batch, batch.r,
                           train=False)

    model_dir = tmp_path / "ffmodel"
    model_dir.mkdir()
    (model_dir / "config.json").write_text(json.dumps({
        "atom_features": "cgcnn",
        "model": {"name": "alignn_atomwise", "alignn_layers": 1,
                  "gcn_layers": 1, "hidden_features": 16,
                  "embedding_features": 8, "gradwise_weight": 1.0,
                  "stresswise_weight": 0.1}}))
    save_params(str(model_dir / "best_model.mpk"), variables["params"])

    srv, _svc = serve(str(model_dir), port=0, ff=True, warmup=False)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        code, out = _post(url + "/ff", {"atoms": _atoms()})
        assert code == 200
        assert np.isfinite(out["energy"])
        assert np.asarray(out["forces"]).shape == (2, 3)
        assert len(out["stress"]) == 6
    finally:
        srv.shutdown()
