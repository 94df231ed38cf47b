"""Tracing / profiling helpers.

The reference's only tracing is debug-mode cudaDeviceSynchronize + CPU arg
snapshots on failure (SURVEY.md section 5.1). The TPU-native equivalents:
jax.profiler traces viewable in TensorBoard/XProf, and a block_until_ready
timing harness for per-stage numbers.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/r3dgs_trace"):
    """Capture a jax.profiler trace around a block:

        with profiling.trace("/tmp/tr"):
            trainer.step(camera)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2,
            **kwargs) -> Dict[str, float]:
    """Wall-time a jitted function with proper device synchronisation."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "iters": iters}


def annotate(name: str):
    """Named profiler region (shows up in the XLA trace viewer)."""
    return jax.profiler.TraceAnnotation(name)
