"""Profiling helpers (SURVEY §5 'tracing/profiling' parity).

The reference has wall-clock tic/toc only; here:
  * `trace(logdir)` — context manager around jax.profiler for XLA-level
    traces viewable in TensorBoard/Perfetto;
  * `device_timer` — sustained-rate timing that actually synchronises on
    backends where block_until_ready is unreliable (fetches a small leaf).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around the with-block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def _sync(out):
    """Force completion by fetching ONE element (sliced on device — fetching
    a whole large leaf through a remote tunnel costs seconds)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    if hasattr(leaf, "ndim") and leaf.ndim:
        leaf = leaf[(0,) * leaf.ndim]
    np.asarray(leaf)


def device_timer(fn, *args, iters: int = 10, pipeline: bool = True):
    """Sustained seconds/iteration of `fn(*args)` with true completion.

    pipeline=True overlaps dispatch i+1 with the fetch of i (throughput);
    False serialises (latency).
    """
    _sync(fn(*args))  # compile + warm
    if pipeline:
        t0 = time.time()
        pending = fn(*args)
        for _ in range(iters - 1):
            nxt = fn(*args)
            _sync(pending)
            pending = nxt
        _sync(pending)
        return (time.time() - t0) / iters
    t0 = time.time()
    for _ in range(iters):
        _sync(fn(*args))
    return (time.time() - t0) / iters
