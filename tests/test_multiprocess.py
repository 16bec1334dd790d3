"""Multi-process (multi-host-shaped) DP rendezvous test (VERDICT r4 #4).

Spawns TWO OS processes with 4 virtual CPU devices each, rendezvouses
them through `parallel.mesh.initialize_distributed` (the replacement for
the reference's NCCL `init_process_group`,
`alignn/train_alignn.py:27-44`), runs the production shard_map DP train
step over the 8-device GLOBAL mesh with `BucketedLoader(host_id,
num_hosts)` input sharding, and asserts the resulting parameters match
a single-process 8-device run of the same program.

This is the one distributed leg that is testable in a single-machine
environment and previously rested on zero execution.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(n_local_devices: int):
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.update({
        "PYTHONPATH": repo + os.pathsep + env.get("PYTHONPATH", ""),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS":
            f"--xla_force_host_platform_device_count={n_local_devices}",
        # CPU-only children must never touch the TPU tunnel (CLAUDE.md)
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_ENABLE_X64": "0",
    })
    env.pop("ALIGNN_TPU_FORCE_PALLAS", None)
    return env


def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    outdir = str(tmp_path)

    # 2-process leg: both ranks must be alive concurrently to
    # rendezvous; bound with a hard timeout so a hung coordinator can
    # never wedge the suite
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(rank), str(port), outdir],
            env=_env(4), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out[-3000:]}"

    # single-process 8-device baseline, same program + data
    res = subprocess.run(
        [sys.executable, _WORKER, "single", "-", outdir],
        env=_env(8), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=420)
    assert res.returncode == 0, res.stdout.decode(errors="replace")[-3000:]

    with open(os.path.join(outdir, "multi.json")) as f:
        multi = json.load(f)
    with open(os.path.join(outdir, "single.json")) as f:
        single = json.load(f)

    assert multi["n_steps"] == single["n_steps"] == 2
    # losses are pmean over all 8 micro-batches -> identical up to
    # reduction order
    for lm, ls in zip(multi["losses"], single["losses"]):
        assert lm["loss"] == pytest.approx(ls["loss"], abs=1e-5)
    pm = np.asarray(multi["param_concat"])
    ps = np.asarray(single["param_concat"])
    assert pm.shape == ps.shape
    np.testing.assert_allclose(pm, ps, atol=2e-5, rtol=1e-4)
