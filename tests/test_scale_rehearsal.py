"""CPU smoke of the end-to-end scale rehearsal tool (VERDICT r2 #4).

Tiny-scale run of tools/scale_rehearsal.py's full path — synthetic
E/F/S records -> record-store cache -> prefetch loader -> jitted train
steps -> per-bucket-shape overhead accounting — so the device-run tool
cannot rot between rounds.
"""

import json
import sys


def test_rehearsal_smoke(tmp_path, capsys, monkeypatch):
    from tools import scale_rehearsal

    monkeypatch.setattr(sys, "argv", [
        "scale_rehearsal.py", "--n", "300", "--epochs", "2",
        "--batch_size", "32", "--hidden", "32", "--layers", "1",
        "--workers", "0", "--steps_cap", "4"])
    scale_rehearsal.main()
    lines = [json.loads(line) for line in
             capsys.readouterr().out.splitlines() if line.startswith("{")]
    phases = {r["phase"]: r for r in lines}
    assert phases["records"]["n"] == 300
    assert phases["build+cache"]["graphs"] > 200
    assert phases["step_only"]["edges_per_s"] > 0
    for ep in ("epoch0", "epoch1"):
        assert phases[ep]["steps"] == 4
        assert phases[ep]["epoch_edges_per_s"] > 0
        assert phases[ep]["n_bucket_shapes"] >= 1
    # warm epoch: loader keeps the device fed within a loose CPU bound
    assert phases["epoch1"]["loader_overhead"] < 1.0


def test_synth_ff_records_schema():
    from tools.scale_rehearsal import synth_ff_records

    rec = next(synth_ff_records(1))
    assert {"jid", "atoms", "target", "forces", "stresses"} <= set(rec)
    assert len(rec["forces"]) == len(rec["atoms"]["elements"])
    assert len(rec["stresses"]) == 3
