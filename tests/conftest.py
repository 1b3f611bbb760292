"""Test configuration: force CPU with a virtual 8-device mesh.

Must run before jax is imported anywhere, so sharding tests can fake a pod
(SURVEY.md section 4: CPU multi-process pattern with
xla_force_host_platform_device_count).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # never run unit tests on the TPU chip
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported by an interpreter site hook with the TPU
# platform pre-selected; backends initialise lazily, so overriding the config
# here (before any device use) still forces CPU.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
