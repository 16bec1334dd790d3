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
