from .profiling import (
    device_memory_stats,
    device_trace,
    enable_compile_cache,
    timed,
)

__all__ = [
    "device_memory_stats",
    "device_trace",
    "enable_compile_cache",
    "timed",
]
