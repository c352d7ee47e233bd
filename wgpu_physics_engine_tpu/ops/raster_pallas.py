"""Pallas instanced-sphere rasterization kernel.

The XLA instanced-sphere pass (render/raster.draw_instanced_spheres) scans
instance chunks and materializes [pixels, chunk] intermediates in HBM
(~50 ms/frame at 256² × 3,600 instances). This kernel keeps the framebuffer
(tmin + winning instance id) VMEM-resident and loops instances with
per-instance SMEM scalars, so HBM sees only the ray directions in and two
[H, W] planes out — the TPU equivalent of the reference's instanced draw
(cloth.rs:1366-1379: 3,600 instances × 48,384 indices through the vertex
shader; here each instance is ~12 VPU ops over the pixel grid).

Depth resolve = nearest hit (ray parameter t), ties by lower instance id —
deterministic, unlike a GPU z-fight.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# SMEM budget for per-instance scalars (4 floats each). 16k instances ≈
# 256 KiB of SMEM; beyond that callers should fall back to the XLA path.
MAX_INSTANCES = 16384


def _kernel(scal_ref, oc_ref, dirs_ref, tmin_out, inst_out, *, n, h, w):
    znear = scal_ref[0]
    dx, dy, dz = dirs_ref[0], dirs_ref[1], dirs_ref[2]

    def body(k, carry):
        tmin, inst = carry
        ocx = oc_ref[0, k]
        ocy = oc_ref[1, k]
        ocz = oc_ref[2, k]
        cc = oc_ref[3, k]          # |oc|^2 - r^2 (precomputed; +inf = padding)
        b = dx * ocx + dy * ocy + dz * ocz
        disc = b * b - cc
        t = b - jnp.sqrt(jnp.maximum(disc, 0.0))
        better = (disc > 0.0) & (t > znear) & (t < tmin)
        tmin = jnp.where(better, t, tmin)
        inst = jnp.where(better, k, inst)
        return tmin, inst

    tmin0 = jnp.full((h, w), jnp.inf, jnp.float32)
    inst0 = jnp.full((h, w), -1, jnp.int32)
    tmin, inst = jax.lax.fori_loop(0, n, body, (tmin0, inst0))
    tmin_out[...] = tmin
    inst_out[...] = inst


@functools.partial(jax.jit, static_argnames=("interpret",))
def sphere_raster(eye: jnp.ndarray, dirs: jnp.ndarray, centers: jnp.ndarray,
                  radius, znear, interpret: Optional[bool] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest ray-sphere hit over all instances.

    ``eye`` [3], ``dirs`` [3, H, W] (normalized), ``centers`` [N, 3].
    Returns ``(tmin [H, W], inst [H, W])`` with ``inst = -1`` on miss and
    ``tmin = +inf`` on miss.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = dirs.shape[-2:]
    n = centers.shape[0]
    assert n <= MAX_INSTANCES, f"{n} instances exceed SMEM budget"

    oc = (centers - eye[None, :]).T.astype(jnp.float32)       # [3, N]
    cc = jnp.sum(oc * oc, axis=0) - jnp.float32(radius) ** 2  # [N]
    ocb = jnp.concatenate([oc, cc[None]], axis=0)             # [4, N]
    scal = jnp.asarray([znear], jnp.float32)

    kernel = functools.partial(_kernel, n=n, h=h, w=w)
    tmin, inst = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(scal, ocb, dirs)
    return tmin, inst
