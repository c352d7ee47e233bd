"""Orbit camera as pure functions (replaces wgpu-bootstrap's OrbitCamera,
reference C17: polar-coordinate orbit owning a {view, proj} uniform;
usage at cloth.rs:568-581, WGSL contract at 1_Cube/cube_shader.wgsl:1-5).

Conventions:
* Right-handed world, +y up.
* Polar coordinates ``(radius, theta, phi)``: theta = azimuth around +y
  (0 → eye on +z), phi = elevation from the horizontal plane.
* ``view`` = right-handed look-at; ``proj`` = perspective with wgpu/Vulkan
  depth range z ∈ [0, 1].

All functions are jittable and return float32 jnp arrays so a camera can be
batched (vmapped) for datagen — thousands of viewpoints per launch.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..core import config as cfg


class Camera(NamedTuple):
    """Resolved camera: view/proj matrices + eye position (all float32)."""

    view: jnp.ndarray   # [4, 4]
    proj: jnp.ndarray   # [4, 4]
    eye: jnp.ndarray    # [3]
    fovy_rad: jnp.ndarray
    aspect: jnp.ndarray
    znear: jnp.ndarray
    zfar: jnp.ndarray


def orbit_eye(target, radius, theta, phi):
    """Eye position on the orbit sphere."""
    target = jnp.asarray(target, jnp.float32)
    radius = jnp.float32(radius)
    theta = jnp.float32(theta)
    phi = jnp.float32(phi)
    offset = jnp.stack([
        radius * jnp.cos(phi) * jnp.sin(theta),
        radius * jnp.sin(phi),
        radius * jnp.cos(phi) * jnp.cos(theta),
    ])
    return target + offset


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> jnp.ndarray:
    """Right-handed view matrix (camera looks down −z in view space)."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = target - eye
    f = f / jnp.linalg.norm(f)
    s = jnp.cross(f, up)
    s = s / jnp.linalg.norm(s)
    u = jnp.cross(s, f)
    rot = jnp.stack([s, u, -f])          # rows: right, up, -forward
    trans = -rot @ eye
    view = jnp.zeros((4, 4), jnp.float32)
    view = view.at[:3, :3].set(rot).at[:3, 3].set(trans).at[3, 3].set(1.0)
    return view


def perspective(fovy_rad, aspect, znear, zfar) -> jnp.ndarray:
    """Perspective projection, depth mapped to [0, 1] (wgpu convention)."""
    fovy_rad = jnp.float32(fovy_rad)
    aspect = jnp.float32(aspect)
    znear = jnp.float32(znear)
    zfar = jnp.float32(zfar)
    f = 1.0 / jnp.tan(fovy_rad / 2.0)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(f / aspect)
    m = m.at[1, 1].set(f)
    m = m.at[2, 2].set(zfar / (znear - zfar))
    m = m.at[2, 3].set(zfar * znear / (znear - zfar))
    m = m.at[3, 2].set(-1.0)
    return m


def make_camera(config: cfg.CameraConfig = cfg.CameraConfig(),
                aspect: float = 1.0,
                radius=None, theta=None, phi=None, target=None) -> Camera:
    """Build a camera from config with optional per-call overrides
    (the egui zoom slider equivalent — cloth.rs:1389-1391)."""
    radius = config.radius if radius is None else radius
    theta = config.theta if theta is None else theta
    phi = config.phi if phi is None else phi
    target = config.target if target is None else target
    eye = orbit_eye(target, radius, theta, phi)
    fovy = jnp.float32(config.fovy_deg * jnp.pi / 180.0)
    return Camera(
        view=look_at(eye, target),
        proj=perspective(fovy, aspect, config.znear, config.zfar),
        eye=eye,
        fovy_rad=fovy,
        aspect=jnp.float32(aspect),
        znear=jnp.float32(config.znear),
        zfar=jnp.float32(config.zfar),
    )


def pixel_rays(camera: Camera, height: int, width: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel primary rays in WORLD space: (origins [3], dirs [3, H, W]).

    Pixel centers; row 0 = top of image (NDC y = +1 edge). Directions are
    normalized.
    """
    j = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    i = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    tan_half = jnp.tan(camera.fovy_rad / 2.0)
    vx = j[None, :] * tan_half * camera.aspect * jnp.ones((height, 1), jnp.float32)
    vy = i[:, None] * tan_half * jnp.ones((1, width), jnp.float32)
    vz = -jnp.ones((height, width), jnp.float32)
    d_view = jnp.stack([vx, vy, vz])                       # [3, H, W]
    rot = camera.view[:3, :3]                               # world→view
    d_world = jnp.einsum("ij,ihw->jhw", rot, d_view)        # rotᵀ @ d
    norm = jnp.sqrt(jnp.sum(d_world * d_world, axis=0, keepdims=True))
    return camera.eye, d_world / norm
