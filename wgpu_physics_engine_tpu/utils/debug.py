"""Numeric failure detection & debugging aids (SURVEY §5).

The reference's numeric fault handling is epsilon guards in the WGSL
(forces.wgsl:147-163, compute_movement.wgsl:111,151) — reproduced in the
step functions — plus `expect()` panics host-side. Here we add the tooling
the reference lacks:

* :func:`assert_finite` — raise (with leaf paths) if any pytree leaf holds
  NaN/Inf; cheap enough to sprinkle around host loops.
* :func:`checked` — wrap a stepper so every invocation is finite-checked
  under ``jax.debug`` (works inside jit via ``jax.debug.callback``).
* :func:`find_nan_step` — bisect the first substep at which a state goes
  non-finite (the debugging loop the reference does by eyeballing the
  window).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def assert_finite(pytree: Any, name: str = "state") -> None:
    """Host-side: raise ValueError naming the offending leaves."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(pytree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{name}{jax.tree_util.keystr(path)}: {n_bad} non-finite")
    if bad:
        raise ValueError("non-finite values detected:\n  " + "\n  ".join(bad))


def checked(step_fn: Callable) -> Callable:
    """Wrap ``step_fn(state, *a, **kw) -> state`` with an in-graph finite
    check that reports (via jax.debug) without leaving jit."""

    def wrapper(state, *args, **kwargs):
        out = step_fn(state, *args, **kwargs)

        def report(ok):
            if not bool(ok):
                raise FloatingPointError(
                    f"{getattr(step_fn, '__name__', 'step')} produced "
                    "non-finite state")

        leaves = [l for l in jax.tree.leaves(out)
                  if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
        ok = jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]))
        jax.debug.callback(report, ok)
        return out

    return wrapper


def find_nan_step(step_fn: Callable, state: Any, max_steps: int,
                  chunk: int = 64) -> int:
    """Return the first step index at which ``step_fn`` makes the state
    non-finite, or -1 if it stays finite for ``max_steps``. Runs in chunks,
    then bisects the failing chunk step-by-step."""

    def finite(s) -> bool:
        return all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(s)
                   if getattr(l, "dtype", None) is not None
                   and np.issubdtype(np.asarray(l).dtype, np.floating))

    done = 0
    while done < max_steps:
        n = min(chunk, max_steps - done)
        nxt = state
        for _ in range(n):
            nxt = step_fn(nxt)
        if not finite(nxt):
            # replay the chunk one step at a time
            for i in range(n):
                state = step_fn(state)
                if not finite(state):
                    return done + i
        state = nxt
        done += n
    return -1
