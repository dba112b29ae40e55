"""Profiling harness: jax.profiler traces + reliable wall timing.

The in-engine analog of the reference's perf tooling (SURVEY.md section 5).
``timed`` uses scalar-fetch synchronization because ``block_until_ready``
over tunneled/async PJRT backends can return before real completion.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def device_sync(x) -> float:
    """Force real completion of ``x`` (device-reduce + 4-byte fetch)."""
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    if not leaves:
        return 0.0
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


def timed(fn, *args, warmup: int = 1, reps: int = 3, **kw):
    """Run fn reps times; returns (best_seconds, last_result)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
        device_sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args, **kw)
        device_sync(out)
        best = min(best, time.time() - t0)
    return best, out


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tkq_trace"):
    """jax.profiler trace context (view with xprof/tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
