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


class CheckpointMismatchError(ValueError):
    """The checkpoint's structure/shape/dtype doesn't match ``like``."""


def load(path: str, like: Any, strict: bool = True) -> Tuple[Any, dict]:
    """Load a checkpoint saved by :func:`save`. ``like`` provides the pytree
    structure (e.g. a freshly-initialized state). Returns (pytree, meta).

    With ``strict=True`` (default) the stored treedef and every leaf's
    shape/dtype are validated against ``like``; a mismatch raises
    :class:`CheckpointMismatchError` naming the offending leaf instead of
    an opaque unflatten failure or silently wrong shapes."""
    with np.load(path) as z:
        flat_like, treedef = jax.tree_util.tree_flatten_with_path(like)
        n = len(flat_like)
        if strict:
            if "__treedef__" in z:
                stored = bytes(z["__treedef__"]).decode()
                if stored != str(treedef):
                    raise CheckpointMismatchError(
                        f"{path}: stored treedef\n  {stored}\n"
                        f"does not match `like`\n  {treedef}")
            n_stored = sum(1 for k in z.files if k.startswith("leaf_"))
            if n_stored != n:
                raise CheckpointMismatchError(
                    f"{path}: {n_stored} stored leaves, `like` has {n}")
        leaves = [z[f"leaf_{i}"] for i in range(n)]
        if strict:
            for i, (kp, want) in enumerate(flat_like):
                got = leaves[i]
                want_shape = tuple(np.shape(want))
                want_dtype = np.asarray(want).dtype
                if tuple(got.shape) != want_shape or got.dtype != want_dtype:
                    raise CheckpointMismatchError(
                        f"{path}: leaf {jax.tree_util.keystr(kp)} is "
                        f"{got.shape}/{got.dtype}, `like` expects "
                        f"{want_shape}/{want_dtype}")
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
    return jax.tree.unflatten(treedef, leaves), meta
