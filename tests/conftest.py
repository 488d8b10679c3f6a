"""Test configuration: hermetic CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a virtual device mesh, per the
driver's ``dryrun_multichip`` contract; no TPU is required for the suite.

Note: this environment's axon sitecustomize registers the TPU backend and
forces ``jax_platforms`` programmatically at interpreter start, so plain
``JAX_PLATFORMS=cpu`` env vars are NOT sufficient — we override through
``jax.config`` after import.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Full-precision matmuls for numerical parity tests.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2023)
