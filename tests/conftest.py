"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding code paths
(mesh/pjit/shard_map) execute without TPU hardware (SURVEY §4).  The env
vars must be set before JAX initializes its backend, hence here at
conftest import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The machine profile exports JAX_PLATFORMS=axon (the TPU tunnel) and the
# plugin can win over the env var — force the config explicitly.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
