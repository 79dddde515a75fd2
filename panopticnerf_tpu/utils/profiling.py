"""Tracing/profiling hooks (SURVEY.md §5.1).

The reference's only profiling is a wall-clock it/s loop (run.py --type
network) and recorder batch-time averages. Here: jax.profiler traces
(Perfetto/XProf-compatible) around arbitrary regions plus a helper that
times jitted callables with proper device sync.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in XProf/Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters: int = 10, warmup: int = 1, **kw):
    """Wall-time a jitted callable with device sync; returns sec/call."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def enable_debug_nans(on: bool = True):
    """Debug-mode NaN checks (SURVEY.md §5.2 rebuild note)."""
    jax.config.update("jax_debug_nans", on)
