"""Feature-table provenance stamping (VERDICT r3 #5).

Converted/saved checkpoints record the sha256 of the exact feature
table the embedding layer consumed (reference lookup:
`alignn/graphs.py:1003-1020`); loaders warn when the active table
differs — so a later vendored byte-exact jarvis table invalidates
stale conversions loudly.
"""

import json

import numpy as np

from alignn_tpu.chem.features import (
    FEATURESET_SIZE,
    attribute_lookup_table,
    feature_table_provenance,
)
from alignn_tpu.train.checkpoint import (
    check_feature_table,
    checkpoint_meta,
    load_meta,
    load_params,
    save_params,
)


def test_provenance_hashes_active_table():
    prov = feature_table_provenance("cgcnn")
    assert prov["atom_features"] == "cgcnn"
    assert prov["source"] == "builtin"
    import hashlib

    table = attribute_lookup_table("cgcnn")
    assert prov["sha256"] == hashlib.sha256(
        np.ascontiguousarray(table).tobytes()).hexdigest()


def test_provenance_tracks_vendored_override(tmp_path, monkeypatch):
    """A vendored override table must change the hash AND the source."""
    before = feature_table_provenance("basic")
    size = FEATURESET_SIZE["basic"]
    override = {"Si": list(np.arange(size, dtype=float))}
    (tmp_path / "basic.json").write_text(json.dumps(override))
    monkeypatch.setenv("ALIGNN_TPU_TABLES_DIR", str(tmp_path))
    after = feature_table_provenance("basic")
    assert after["source"] == "override:basic.json"
    assert after["sha256"] != before["sha256"]


def test_save_load_meta_roundtrip(tmp_path):
    params = {"dense": {"kernel": np.ones((2, 3), np.float32)}}
    meta = checkpoint_meta("cgcnn", converted_from="best_model.pt")
    path = str(tmp_path / "m.mpk")
    save_params(path, params, meta=meta)
    got = load_meta(path)
    assert got["converted_from"] == "best_model.pt"
    assert got["feature_table"]["sha256"] == \
        feature_table_provenance("cgcnn")["sha256"]
    p, _bs = load_params(path)  # params unaffected by the meta key
    assert np.allclose(p["dense"]["kernel"], 1.0)


def test_check_feature_table_match_and_mismatch(tmp_path, capsys):
    meta = checkpoint_meta("cgcnn")
    assert check_feature_table(meta, "cgcnn", "here") is True
    assert "WARNING" not in capsys.readouterr().out

    stale = {"feature_table": dict(meta["feature_table"],
                                   sha256="0" * 64)}
    assert check_feature_table(stale, "cgcnn", "stale.mpk") is False
    out = capsys.readouterr().out
    assert "WARNING" in out and "stale.mpk" in out

    # unstamped (pre-provenance) checkpoints: silent False
    assert check_feature_table({}, "cgcnn") is False
    assert check_feature_table(None, "cgcnn") is False
    assert "WARNING" not in capsys.readouterr().out


def test_restart_meta_via_train_state(tmp_path):
    """save_train_state(extra={'meta': ...}) surfaces through load_meta."""
    import jax.numpy as jnp
    import optax

    from alignn_tpu.train.checkpoint import save_train_state

    class _S:
        params = {"w": np.zeros(2, np.float32)}
        batch_stats = {}
        opt_state = optax.sgd(1e-3).init(
            {"w": jnp.zeros(2, jnp.float32)})
        step = jnp.asarray(3, jnp.int32)

    path = str(tmp_path / "restart.mpk")
    save_train_state(path, _S(), epoch=2,
                     extra={"meta": checkpoint_meta("cgcnn")})
    meta = load_meta(path)
    assert meta["feature_table"]["atom_features"] == "cgcnn"
