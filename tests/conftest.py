"""Test configuration: run the unit suite on a virtual 8-device CPU mesh.

The axon sitecustomize registers the TPU backend unconditionally, so the
env var alone is not enough — we must also flip the config after import.
TPU execution is exercised by ``bench.py`` and the driver's compile checks.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
