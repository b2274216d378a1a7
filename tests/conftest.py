"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere (standard JAX
fake-multi-device trick, SURVEY.md §4c).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import jax

# The hosting environment's TPU plugin may force jax_platforms programmatically
# (overriding the env var), so pin it at config level too.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 fake CPU devices, got {devs}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(42)
