"""Test configuration: force JAX onto a virtual 8-device CPU platform.

This replaces the reference's (nonexistent) test infrastructure — see
SURVEY.md §4. The 8 virtual devices let mesh/data-parallel tests run
without TPU hardware. Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The whole suite is CPU-only: drop the axon sitecustomize trigger so the
# many subprocess-spawning tests can't hang at child-interpreter import
# when the TPU tunnel is down (sitecustomize register() dials the pool
# with no timeout; observed as a spurious 600 s graft-entry timeout).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The deployment image force-imports jax (sitecustomize on PYTHONPATH) with
# JAX_PLATFORMS=axon before conftest runs, so the env var alone is too late —
# override via the live config as well.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(8675309)
