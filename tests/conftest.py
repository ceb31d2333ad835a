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

# Cap CPU codegen at a portable ISA BEFORE backend init so the repo-committed
# compile cache (tests/_jax_cache) is valid on any sandbox host: artifacts
# built here never use features a different machine lacks, and the cache key
# (HLO + compile options incl. XLA flags) matches across hosts. This is what
# makes a COLD fresh-sandbox `pytest -m "not slow"` run start warm
# (VERDICT r4 next #7).
from u2mkd_tpu.utils.jaxinit import cpu_portable_codegen  # noqa: E402

cpu_portable_codegen("AVX2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from u2mkd_tpu.utils.jaxinit import setup_compilation_cache  # noqa: E402

# Repo-committed persistent compile cache (ISA-capped above => portable).
# New entries written during local runs simply extend it; U2MKD_JAX_CACHE
# still overrides.
setup_compilation_cache(
    os.environ.get(
        "U2MKD_JAX_CACHE",
        os.path.join(os.path.dirname(__file__), "_jax_cache"),
    )
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
