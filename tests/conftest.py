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
# Force CPU: the shell presets JAX_PLATFORMS=axon (tunneled TPU), which a
# setdefault would NOT override — and unit tests must run on the local
# 8-device virtual CPU mesh, not through the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: XLA:CPU compiles of int8 scan kernels are slow;
# cache them across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
