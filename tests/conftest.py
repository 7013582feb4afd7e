"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This gives the multi-device sharding tests (the SyncBN equivalence oracle,
the data-parallel train step) real device counts without TPU hardware, per
SURVEY.md §4.
"""

import os

# Subprocess-based tests (test_multihost, test_train_parity) re-exec the
# interpreter with cwd=tests/; make the package importable there regardless
# of how the parent pytest found it (rootdir cwd vs installed vs PYTHONPATH).
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH")
    else _REPO_ROOT
)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu";
# override it back so the suite runs on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute parity oracles (torch-CPU training / float64 "
        "train-step drivers). The FULL suite is the release gate; "
        '`-m "not slow"` is the fast development loop (~15 min on 1 core '
        "vs ~50).",
    )


@pytest.fixture
def rng():
    return np.random.RandomState(0)
