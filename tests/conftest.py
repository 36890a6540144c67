"""Test environment: force the CPU backend with 8 virtual devices.

Multi-chip sharding is validated the standard JAX way — a host-platform
device mesh (`--xla_force_host_platform_device_count=8`) stands in for an
8-chip ICI mesh. This must run before jax initializes, hence conftest.
"""

import os

# Force CPU even when the session environment pins a TPU platform.
# Note: the axon sitecustomize force-writes jax.config jax_platforms at
# interpreter start, so the env var alone is NOT enough — we must override
# the config after importing jax (backends initialize lazily, so this is
# still before any backend is created).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def goldens():
    from style_transfer_based_holographic_imaging_tpu.data.goldens import load_golden_suite

    return load_golden_suite()
