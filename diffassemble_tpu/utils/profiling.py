"""Profiling / tracing hooks — first-class here (the reference has none;
SURVEY.md §5 'Tracing/profiling: none … the rebuild should add jax.profiler
trace hooks as a first-class feature').

- `trace(dir)` context manager → TensorBoard/XProf trace of everything inside;
- `annotate(name)` → named region (TraceAnnotation) visible in the trace;
- `timed(fn)` → wall-clock + device-sync timing helper used by bench.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/diffassemble-trace"):
    """Capture an XProf/TensorBoard trace of the enclosed computation."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def timed(fn: Callable, *args, iters: int = 3, warmup: int = 1, **kwargs):
    """(best_seconds, last_result) with block_until_ready sync per call."""
    result = None
    for _ in range(warmup):
        result = jax.block_until_ready(fn(*args, **kwargs))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        result = jax.block_until_ready(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - t0)
    return best, result
