"""Stats/profiling utilities + engine stats endpoint."""
import numpy as np

from vectorsearch_tpu.utils import device_memory_stats, timed


def test_device_memory_stats_shape():
    out = device_memory_stats()
    assert isinstance(out, list) and out
    assert "device" in out[0]


def test_timed_runs():
    with timed("unit-test block"):
        np.zeros(10).sum()
