"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices so multi-chip sharding paths
compile and execute without TPU hardware. The axon TPU plugin overrides
JAX_PLATFORMS from the environment, so the platform is forced via
jax.config *before* any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(114514)
