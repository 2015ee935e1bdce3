"""Profiling helpers (SURVEY §5.1 TPU equivalent).

The reference's observability was wall-clock it/s in the console; on TPU the
native tool is ``jax.profiler`` trace capture (viewable in TensorBoard /
Perfetto) plus blocking timers for ad-hoc measurements.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Iterator

import jax


@contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace of the enclosed block into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def timed(label: str, results: dict | None = None) -> Iterator[None]:
    """Wall-clock a block, blocking on outstanding device work at both ends."""
    (jax.device_put(0.0) + 0).block_until_ready()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        (jax.device_put(0.0) + 0).block_until_ready()
        elapsed = time.perf_counter() - t0
        if results is not None:
            results[label] = elapsed
        else:
            print(f"[timed] {label}: {elapsed * 1000:.3f} ms")


def benchmark(fn, *args, warmup: int = 3, iters: int = 50) -> float:
    """Average seconds/call of a jitted function (compiles on first call)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
