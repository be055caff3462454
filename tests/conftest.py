"""Test configuration: CPU backend, f64 parity mode, 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``), mirroring how the driver
validates the multi-chip path without real hardware.
"""

import os

# Must be set before jax is imported anywhere.  Force CPU even when the
# ambient environment points at a TPU platform: the test suite is the f64
# parity harness; TPU runs happen through bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["FENRIS_TPU_X64"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU plugin force-appends itself to jax_platforms at
# import time; override after import to pin the test suite to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
