"""Tracing / profiling utilities.

The reference's observability is txid-prefixed wall-time logs and mpb
progress bars (SURVEY.md §5). Here: the same per-request timing logs
(logger.next_txid + engine logs), plus device-level tracing via
jax.profiler — traces open in XProf/TensorBoard.
"""
from __future__ import annotations

import contextlib
import time

from ..logger import sugar


def enable_compile_cache() -> None:
    """Persistent XLA compile cache rooted at the repo's .cache/jax (path
    derived from this file, not hardcoded). Remote-TPU compiles cost
    30-120s each through this environment's tunnel; caching them across
    processes makes repeat runs start in seconds. Call before the first
    device use."""
    import os

    import jax

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(repo_root, ".cache", "jax")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


_WARM_THREAD = None


def warm_device_transfer() -> None:
    """Absorb the per-process device->host warm-up stall in the background.

    Measured on this environment's remote-TPU tunnel: the FIRST
    synchronous device->host transfer of a process stalls 130-760+ s —
    growing over the life of a tunnel session (a device_get of 8 floats
    took 424 s in a clean process; a later process absorbed 762 s) —
    after which transfers run at ~40 MB/s. Uploads, compiles and executions are
    asynchronous journal writes and never hit it — but they QUEUE behind
    an in-flight first D2H, so the stall cannot be hidden behind device
    work, only behind HOST-ONLY work. (This stall is what r1/r2 build
    instrumentation misattributed to HBM defragmentation.)

    Call this as early as possible in an entry point, BEFORE any other
    device use, then do host-side phases (corpus generation, SQL
    streaming, wire packing): the daemon thread issues a 1-float
    device_get immediately, and by the time the first real device op is
    queued the stall is partially or fully consumed. Idempotent; no-op
    on CPU backends (tests), where there is no tunnel.
    """
    global _WARM_THREAD
    if _WARM_THREAD is not None:
        return

    import threading

    def _warm():
        try:
            import jax
            import jax.numpy as jnp

            if jax.default_backend() == "cpu":
                return
            t0 = time.perf_counter()
            jax.device_get(jnp.zeros((1,), jnp.float32))
            dt = time.perf_counter() - t0
            if dt > 5:
                sugar().info("device transfer warm-up absorbed %.1fs", dt)
        except Exception:  # never let warm-up break an entry point
            pass

    _WARM_THREAD = threading.Thread(
        target=_warm, name="vstpu-d2h-warmup", daemon=True
    )
    _WARM_THREAD.start()


def wait_device_warm(timeout: float | None = 3600.0) -> None:
    """Block until warm_device_transfer's first-D2H probe completes.

    Benchmarks call this between host-side setup and their first timed
    device phase so the per-process tunnel stall (an environment
    artifact) is not attributed to the measured phase. No-op if
    warm_device_transfer was never called."""
    if _WARM_THREAD is not None:
        _WARM_THREAD.join(timeout)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (TPU timeline, HLO, memory) to log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        sugar().info("device trace written to %s", log_dir)


@contextlib.contextmanager
def timed(label: str):
    """Wall-time a block at info level (reference logs per-request ms,
    server/search.go:111)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sugar().info("%s took %.1fms", label, (time.perf_counter() - t0) * 1e3)


def device_memory_stats() -> list[dict]:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = []
    for dev in jax.devices():
        stats = {}
        try:
            stats = dict(dev.memory_stats() or {})
        except Exception:
            pass
        out.append({"device": str(dev), **stats})
    return out
