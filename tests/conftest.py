"""Test environment: CPU backend with 8 virtual devices, x64 enabled.

The axon sitecustomize pre-registers the TPU backend and pins
JAX_PLATFORMS=axon before any user code runs, so env vars alone are not
enough — we must override through jax.config before the first backend use.
Benchmarks run on real TPU via bench.py, not through pytest.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
