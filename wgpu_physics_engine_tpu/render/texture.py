"""Textures: file loading (PIL) and procedural fallbacks.

The reference samples diffuse textures in three apps (C4 textured cube,
C6 globe, C16 cloth scene; files at ``textures/`` — cloth.rs:59-61 uses
``mesh.jpg`` for the globe and ``red.png`` for particles). Here a texture is
just a float32 ``[Th, Tw, 3]`` array in [0, 1]; sampling is bilinear with
wrap addressing (the wgpu sampler default used by the apps).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def load_texture(path: str) -> jnp.ndarray:
    """Load an image file (jpg/png/bmp via PIL) → float32 [H, W, 3]."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, np.float32) / 255.0
    return jnp.asarray(arr)


def get(name_or_path: str, size: int = 256) -> jnp.ndarray:
    """Resolve a texture by file path or by the reference's asset names
    (``textures/`` — SURVEY C18: grey/red/texture/mesh/diffuse/moon1024/
    earth2048). Files load via PIL when present; otherwise a procedural
    equivalent is generated, so scenes work without binary assets."""
    import os

    if os.path.exists(name_or_path):
        return load_texture(name_or_path)
    key = os.path.splitext(os.path.basename(name_or_path))[0].lower()
    if key in ("red",):
        return solid((1.0, 0.0, 0.0))
    if key in ("grey", "gray"):
        return solid((0.5, 0.5, 0.5))
    if key in ("mesh", "texture", "diffuse"):
        return checkerboard(size=size)
    if key in ("earth2048", "moon1024", "earth", "moon", "planet"):
        return earth_gradient(size)
    raise FileNotFoundError(
        f"texture '{name_or_path}' not found and no procedural equivalent")


def solid(color, size: int = 4) -> jnp.ndarray:
    """Solid-color texture (the cloth particles' ``red.png`` equivalent)."""
    c = jnp.asarray(color, jnp.float32)
    return jnp.broadcast_to(c, (size, size, 3))


def checkerboard(n: int = 8, size: int = 256,
                 c0=(0.85, 0.85, 0.85), c1=(0.25, 0.25, 0.3)) -> jnp.ndarray:
    """Procedural checker (stand-in for ``mesh.jpg``'s grid pattern)."""
    i = jnp.arange(size) * n // size
    mask = ((i[:, None] + i[None, :]) % 2).astype(jnp.float32)[..., None]
    return mask * jnp.asarray(c1, jnp.float32) + (1 - mask) * jnp.asarray(c0, jnp.float32)


def earth_gradient(size: int = 256) -> jnp.ndarray:
    """Procedural blue-green planet gradient (earth2048.bmp stand-in)."""
    v = jnp.linspace(0.0, 1.0, size)[:, None, None]
    u = jnp.linspace(0.0, 1.0, size)[None, :, None]
    land = 0.5 + 0.5 * jnp.sin(12.0 * u * jnp.pi) * jnp.sin(8.0 * v * jnp.pi)
    ocean = jnp.concatenate([0.1 * jnp.ones_like(land), 0.3 + 0.2 * v * jnp.ones_like(land), 0.7 * jnp.ones_like(land)], -1)
    ground = jnp.concatenate([0.2 + 0.3 * land, 0.5 + 0.2 * land, 0.2 * jnp.ones_like(land)], -1)
    sel = (land > 0.75).astype(jnp.float32)
    return sel * ground + (1 - sel) * ocean


def sample_bilinear(tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear texture sample with wrap addressing.

    ``u``/``v``: arrays of any shape; returns ``[..., 3]``. v=0 maps to
    texture row 0 (the loaders keep image orientation, matching how the
    reference uploads images without a flip).
    """
    th, tw = tex.shape[0], tex.shape[1]
    x = u * tw - 0.5
    y = v * th - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), tw)
    x1i = jnp.mod(x0i + 1, tw)
    y0i = jnp.mod(y0.astype(jnp.int32), th)
    y1i = jnp.mod(y0i + 1, th)
    t00 = tex[y0i, x0i]
    t01 = tex[y0i, x1i]
    t10 = tex[y1i, x0i]
    t11 = tex[y1i, x1i]
    top = t00 * (1 - fx) + t01 * fx
    bot = t10 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy
