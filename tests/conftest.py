"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The reference's tests are CPU-only unit tests (reference: tests/, see
SURVEY.md §4). Ours additionally exercise real multi-device sharding, which
the reference never had, by simulating an 8-device TPU pod slice on CPU via
``--xla_force_host_platform_device_count`` (the standard JAX recipe for
testing pjit/shard_map code paths without hardware).

Note: this environment's TPU plugin (axon) force-selects itself through
``jax.config.update('jax_platforms', ...)`` at interpreter startup, which
silently overrides the ``JAX_PLATFORMS`` env var — so we must override the
*config* back to cpu, not just the env var.
"""
import os

# XLA_FLAGS must be set before the CPU backend initializes (first device
# query), which is later than this import, so setting it here is safe.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
