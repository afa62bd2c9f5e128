from .errors import fresh_exc  # noqa: F401
from .profiling import (
    device_memory_stats,
    device_trace,
    enable_compile_cache,
    timed,
    wait_device_warm,
    warm_device_transfer,
)

__all__ = [
    "device_memory_stats",
    "device_trace",
    "enable_compile_cache",
    "timed",
    "wait_device_warm",
    "warm_device_transfer",
]
