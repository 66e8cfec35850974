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

# Persistent XLA compile cache: the e2e tier's cost is dominated by CPU
# compiles of the full pipeline step (~30-60 s per distinct config). Cached
# executables are keyed by HLO, so code changes invalidate automatically;
# repeat suite runs skip straight to execution (VERDICT r4 #8: full suite
# under 6 min).
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
