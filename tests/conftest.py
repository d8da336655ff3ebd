"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (reference never could test
its NCCL path; see SURVEY.md section 4)."""

import os

# force: the session environment pins JAX_PLATFORMS=axon (the real TPU) and
# the axon plugin ignores the env-var override, so use jax.config directly
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
