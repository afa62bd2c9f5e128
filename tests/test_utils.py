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


def test_warm_device_transfer_idempotent_and_joinable():
    """CPU backend: the warm-up thread no-ops quickly; wait joins it and a
    second call doesn't spawn another thread (module-level singleton)."""
    from vectorsearch_tpu.utils import profiling

    profiling.warm_device_transfer()
    first = profiling._WARM_THREAD
    assert first is not None
    profiling.warm_device_transfer()
    assert profiling._WARM_THREAD is first
    profiling.wait_device_warm(timeout=30)
    assert not first.is_alive()
