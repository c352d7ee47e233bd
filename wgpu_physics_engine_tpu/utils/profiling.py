"""Profiling / timing helpers (SURVEY §5: the reference's only
instrumentation is an FPS label; here we provide real tooling).

* :func:`timed` — wall-clock timing with forced device→host sync (under the
  axon TPU platform ``block_until_ready`` does not reliably synchronize, so
  we read back one leaf).
* :func:`trace` — context manager around ``jax.profiler`` for TensorBoard
  traces of the step/render kernels.
* :func:`throughput` — particle-steps/sec report for any stepper.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


def sync(pytree) -> None:
    """Force completion of all pending computation feeding ``pytree``.

    Reads back ONE element, not the whole leaf: the device slice is an
    eager op that consumes the producer's buffer, so the 4-byte host
    transfer still fences everything upstream. A full ``np.asarray``
    of a large leaf would instead time the axon tunnel (~10 MB/s —
    a [512,3,60,60] leaf costs ~1 s of pure readback and once swamped a
    0.035 s kernel measurement 30x; tools/probes/probe_lanes.py, Aug 19).
    """
    leaves = jax.tree.leaves(pytree)
    if leaves:
        leaf = leaves[0]
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 1) > 1:
            leaf = leaf.ravel()[:1]
        np.asarray(leaf)


def timed(fn: Callable, *args, warmup: int = 1, repeats: int = 3, **kw):
    """Best-of-N wall time of ``fn(*args, **kw)`` with device sync.
    Returns (best_seconds, last_result)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
        sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args, **kw)
        sync(out)
        best = min(best, time.time() - t0)
    return best, out


@contextlib.contextmanager
def trace(logdir: str = "/tmp/wpe_tpu_trace"):
    """jax.profiler trace context (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def throughput(stepper: Callable, state, params, dt, n_steps: int,
               n_particles: int, **kw) -> float:
    """particle-steps/sec of a ``stepper(state, params, dt, n_steps)``."""
    best, _ = timed(stepper, state, params, dt, n_steps, **kw)
    return n_particles * n_steps / best
