"""Test configuration: force CPU backend with 8 virtual devices.

This is the TPU-native substitute for multi-node testing without a cluster
(SURVEY.md §4): sharding/collective code paths run on a virtual 8-device
mesh via XLA's host-platform device partitioning.

Must run before jax is imported anywhere.
"""

import os

# The sandbox pre-imports jax via /root/.axon_site (PYTHONPATH), so setting
# JAX_PLATFORMS here is too late for the env var path — use jax.config, which
# wins as long as no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from u2mkd_tpu.utils.jaxinit import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
