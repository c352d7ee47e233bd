"""View-space Phong shading, matching the reference fragment shaders.

Contract (``5_cloth_simulation/globe_shader.wgsl:89-121`` — same math as
``3_Globe/globe_shader.wgsl``):

* ``n`` = normalized view-space normal, ``l`` = dir to light (light pos
  transformed by the view matrix), ``v`` = dir to camera (−position),
  ``r = reflect(−l, n)``.
* diffuse = tex.rgb · clamp(n·l, ambient=0.1, 1) · luminosity=2.4
* specular (toggleable) = ks · max(r·v, 0)^shininess · white
* Diffuse-only variant (C4 textured cube, cube_textured_shader.wgsl:59-76):
  tex.rgb · clamp(n·l, 0.1, 1) · luminosity.

All inputs are channels-first ``[3, ...]`` arrays (view space); masks decide
which pixels are lit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import config as cfg


def _normalize(v, axis=0, eps=1e-12):
    # primal-identical to sqrt(sum(v²)) (sqrt(0) = 0) but the sqrt never
    # sees 0 under reverse-mode (d sqrt/dx|0 = inf, and inf · 0-cotangent
    # = NaN poisons even masked pixels) — the renderer is differentiable
    # (see ops/cloth_pallas_grad.py's module docstring for the pattern)
    s = jnp.sum(v * v, axis=axis, keepdims=True)
    pos = s > 0
    n = jnp.where(pos, jnp.sqrt(jnp.where(pos, s, 1.0)), 0.0)
    return v / jnp.maximum(n, eps)


def _dot(a, b, axis=0):
    return jnp.sum(a * b, axis=axis)


def phong(pos_view: jnp.ndarray, normal_view: jnp.ndarray,
          albedo: jnp.ndarray, light_pos_view: jnp.ndarray,
          light: cfg.LightConfig, compute_specular=None) -> jnp.ndarray:
    """Shade pixels. ``pos_view``/``normal_view``: [3, H, W]; ``albedo``:
    [H, W, 3]; ``light_pos_view``: [3]. Returns [H, W, 3]."""
    n = _normalize(normal_view)
    l = _normalize(light_pos_view[:, None, None] - pos_view)
    v = _normalize(-pos_view)

    shading = jnp.clip(_dot(n, l), light.ambient, 1.0)
    diffuse = albedo * (shading * light.luminosity)[..., None]

    if compute_specular is None:
        compute_specular = light.compute_specular
    # reflect(-l, n) = -l - 2*dot(n, -l)*n = 2*dot(n,l)*n - l
    r = _normalize(2.0 * _dot(n, l)[None] * n - l)
    r_dot_v = jnp.maximum(_dot(r, v), 0.0)
    spec = (jnp.float32(light.ks) * jnp.power(r_dot_v, jnp.float32(light.shininess)))[..., None]
    spec_on = jnp.asarray(compute_specular, jnp.float32)
    return diffuse + spec_on * spec


def diffuse_only(pos_view, normal_view, albedo, light_pos_view,
                 light: cfg.LightConfig) -> jnp.ndarray:
    """C4's clamped-diffuse shading (no specular)."""
    n = _normalize(normal_view)
    l = _normalize(light_pos_view[:, None, None] - pos_view)
    shading = jnp.clip(_dot(n, l), light.ambient, 1.0)
    return albedo * (shading * light.luminosity)[..., None]
