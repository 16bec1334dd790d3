"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The axon TPU plugin registers itself as the default platform at import
time; tests run on host CPU (8 virtual devices) so multi-device
collectives are genuinely exercised without TPU hardware — a capability
the reference's test suite lacks (its DDP path silently degrades to
single-process in CI, reference tests/test_prop.py:19).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

import glob  # noqa: E402

SAMPLE_DATA = "/root/reference/alignn/examples/sample_data"
SAMPLE_DATA_FF = "/root/reference/alignn/examples/sample_data_ff"


@pytest.fixture(scope="session")
def sample_poscars():
    files = sorted(glob.glob(os.path.join(SAMPLE_DATA, "POSCAR-*.vasp")))
    assert files, "sample data missing"
    return files
