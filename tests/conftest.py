"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pins ``JAX_PLATFORMS=axon`` (TPU tunnel) at a level that
overrides the env var, so we must force the platform through jax.config
before any backend initialization.  XLA flags still need to be set before
jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
