"""Test configuration: hermetic CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a virtual device mesh
(``xla_force_host_platform_device_count=8``), per the driver's
``dryrun_multichip`` contract; no TPU is required to run the suite.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Full-precision matmuls for numerical parity tests (JAX's default CPU
# matmul path trades precision for speed).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2023)
