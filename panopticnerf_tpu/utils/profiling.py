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


def _sync(out) -> None:
    """True device sync: read one value back to the host.

    `jax.block_until_ready` returns early through the axon relay (see
    CLAUDE.md); a host readback of any leaf is the only reliable barrier,
    and is what bench.py uses. Costs one RTT (~35 ms through the relay).
    """
    import numpy as np

    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]
    else:
        jax.block_until_ready(out)


def timed(fn, *args, iters: int = 10, warmup: int = 1, **kw):
    """Wall-time a jitted callable; returns sec/call.

    Syncs via value readback (not block_until_ready) so timings are valid
    through the axon relay — matching bench.py's protocol.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kw)
    _sync(out)
    return (time.time() - t0) / iters


def enable_debug_nans(on: bool = True):
    """Debug-mode NaN checks (SURVEY.md §5.2 rebuild note)."""
    jax.config.update("jax_debug_nans", on)
