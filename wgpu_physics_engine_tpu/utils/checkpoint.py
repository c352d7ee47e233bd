"""Checkpoint / resume (SURVEY §5: the reference has none — state lives only
in GPU buffers; the TPU build needs it for long datagen runs).

State is a pytree of arrays, so checkpointing is trivial: an .npz of leaves
plus the treedef. Orbax is available in the image for heavier use; this
dependency-free path covers the engine's needs (atomic write via rename).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Tuple

import jax
import numpy as np


def save(path: str, pytree: Any, meta: dict | None = None) -> None:
    """Save any pytree of arrays to ``path`` (.npz), atomically."""
    leaves, treedef = jax.tree.flatten(pytree)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load(path: str, like: Any) -> Tuple[Any, dict]:
    """Load a checkpoint saved by :func:`save`. ``like`` provides the pytree
    structure (e.g. a freshly-initialized state). Returns (pytree, meta)."""
    with np.load(path) as z:
        leaves_like, treedef = jax.tree.flatten(like)
        n = len(leaves_like)
        leaves = [z[f"leaf_{i}"] for i in range(n)]
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
    return jax.tree.unflatten(treedef, leaves), meta
