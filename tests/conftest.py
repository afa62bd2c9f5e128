"""Test harness: force an 8-device virtual CPU mesh before JAX is imported.

This is the TPU analogue of "multi-node without a cluster"
(SURVEY.md §4 point 4): all sharding/collective tests run on
xla_force_host_platform_device_count=8.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax

# Force CPU at the CONFIG level: this machine's axon (tunneled TPU) plugin
# sets jax_platforms="axon,cpu" in jax.config during import, which
# overrides the JAX_PLATFORMS env var. Unit tests must run on the local
# 8-device virtual CPU mesh, not through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: XLA:CPU compiles of the scan kernels dominate
# test time; cache them across runs/processes. (The env-var route does not
# reliably enable the cache on CPU; explicit config does.)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
