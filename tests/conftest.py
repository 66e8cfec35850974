"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes — this file is imported by pytest before
any test module imports jax. Multi-chip sharding paths are exercised on this virtual
mesh (SURVEY §4: multi-host testing without a cluster).
"""

import os

# Force CPU: the ambient environment points JAX at the tunneled TPU (the axon
# sitecustomize registers the plugin and sets jax_platforms="axon,cpu" at interpreter
# start, which overrides the JAX_PLATFORMS env var). The TPU is reserved for
# benchmarks — unit tests must run fast and local, on a virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
