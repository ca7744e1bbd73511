"""Test harness: force an 8-virtual-device CPU platform.

Sharding/parallelism tests run against a fake 8-device CPU mesh
(`--xla_force_host_platform_device_count=8`), the standard JAX pattern for
validating multi-chip pjit programs without TPU hardware. The environment's
axon plugin pins `JAX_PLATFORMS=axon`, so CPU must be forced in-process
before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
