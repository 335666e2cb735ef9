"""Wall-clock + device-memory probes (API parity with reference etpgt/utils/profiler.py:10-59).

The reference exposes a ``timer`` context manager and CUDA memory counters.
Here memory comes from JAX device ``memory_stats()`` (TPU HBM / CPU-backend heap)
and profiling integrates with ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


@contextlib.contextmanager
def timer(name: str = "block", logger=None, results: dict | None = None) -> Iterator[dict]:
    """Time a block; optionally log and/or record into ``results[name]`` (seconds)."""
    record: dict = {"name": name, "seconds": None}
    start = time.perf_counter()
    try:
        yield record
    finally:
        record["seconds"] = time.perf_counter() - start
        if results is not None:
            results[name] = record["seconds"]
        if logger is not None:
            logger.info(f"{name}: {record['seconds']:.4f}s")


def measure_memory(device=None) -> dict:
    """Return device memory stats in MB (keys: allocated_mb, peak_mb, limit_mb)."""
    import jax

    dev = device or jax.devices()[0]
    stats = dev.memory_stats() or {}
    scale = 1.0 / (1024 * 1024)
    return {
        "allocated_mb": stats.get("bytes_in_use", 0) * scale,
        "peak_mb": stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) * scale,
        "limit_mb": stats.get("bytes_limit", 0) * scale,
    }


@contextlib.contextmanager
def trace(log_dir: str | None = None) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed block (no-op if log_dir None)."""
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
