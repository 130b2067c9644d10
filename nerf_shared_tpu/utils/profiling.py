"""Timing and profiling utilities (new — the reference has none, SURVEY.md §5).

- ``timed``: block_until_ready-bracketed wall-clock timing for jitted fns
- ``rays_per_sec``: the north-star train/render throughput counter
- ``trace``: context manager around jax.profiler for Perfetto traces
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 10, **kwargs):
    """Run ``fn`` and return (mean_seconds, last_result). Blocks on device
    completion so compile time and dispatch overlap don't pollute the number."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
        jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
        jax.block_until_ready(result)
    dt = (time.perf_counter() - t0) / iters
    return dt, result


def rays_per_sec(n_rays: int, seconds: float) -> float:
    return n_rays / seconds if seconds > 0 else float("inf")


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in Perfetto/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
