"""State & dynamic-parameter pytrees.

The reference smuggles particle position inside column 3 of a per-instance
mat4 stored in one AoS storage buffer (``Particle`` struct,
``5_cloth_simulation/src/cloth.rs:160-177`` / ``forces.wgsl:84-94``, read back
by ``get_pos``, ``forces.wgsl:122-128``). On TPU that becomes explicit SoA
arrays in channels-first layout ``[3, H, W]`` so the trailing two axes map
onto the VPU's (sublane, lane) tiling; model matrices are *derived* on demand
by the renderer (translation + uniform scale, exactly what
``cloth.rs:864-866`` constructs).

All params live in NamedTuples (traced jit args), so every egui-slider
equivalent (gravity, time-scale, damping, radii, stiffnesses — the panel at
``cloth.rs:1383-1451``) can change at runtime without recompilation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from . import config as cfg


class ClothParams(NamedTuple):
    """Dynamic physics parameters for the cloth sim.

    Union of the reference's ``PhysicsConstants`` (cloth.rs:196-216,
    forces.wgsl:53-67) and ``SimulationData`` (cloth.rs:181-192,
    forces.wgsl:69-79) uniform structs, minus ``dt`` (passed per substep)
    and ``grid_width`` (static shape).
    """

    k_struct: jnp.ndarray
    k_shear: jnp.ndarray
    k_bend: jnp.ndarray
    c_struct: jnp.ndarray
    c_shear: jnp.ndarray
    c_bend: jnp.ndarray
    rest_struct: jnp.ndarray
    rest_shear: jnp.ndarray
    rest_bend: jnp.ndarray
    k_contact: jnp.ndarray
    mu: jnp.ndarray
    mass: jnp.ndarray
    gravity: jnp.ndarray
    speed_damp: jnp.ndarray
    globe_radius: jnp.ndarray
    particle_radius: jnp.ndarray

    @classmethod
    def from_config(cls, c: cfg.ClothConfig) -> "ClothParams":
        f32 = lambda v: jnp.float32(v)
        return cls(
            k_struct=f32(c.k_struct),
            k_shear=f32(c.k_shear),
            k_bend=f32(c.k_bend),
            c_struct=f32(c.c_struct),
            c_shear=f32(c.c_shear),
            c_bend=f32(c.c_bend),
            rest_struct=f32(c.rest_struct),
            rest_shear=f32(c.rest_shear),
            rest_bend=f32(c.rest_bend),
            k_contact=f32(c.k_contact),
            mu=f32(c.mu),
            mass=f32(c.mass),
            gravity=f32(c.gravity),
            speed_damp=f32(c.speed_damp),
            globe_radius=f32(c.globe_radius),
            particle_radius=f32(c.particle_radius),
        )


class ClothState(NamedTuple):
    """Cloth grid state. ``pos``/``vel``: float32 ``[..., 3, H, W]``.

    ``pin_mask`` (optional ``[H, W]`` bool / ``[...,H,W]``): True = pinned.
    Pinned particles hold their position and keep zero velocity (fixed-pin
    constraints — an extension over the reference, required by
    BASELINE.json configs[1]). ``pin_pos`` holds the pinned target positions
    (usually the initial positions).
    """

    pos: jnp.ndarray
    vel: jnp.ndarray
    pin_mask: Optional[jnp.ndarray] = None
    pin_pos: Optional[jnp.ndarray] = None


def init_cloth_state(c: cfg.ClothConfig, dtype=jnp.float32) -> ClothState:
    """Initial grid: row r → x, col c → z, y = spawn height.

    Mirrors ``generate_instances`` (cloth.rs:848-893):
    ``x = (r - n/2) * spacing``, ``z = (c - n/2) * spacing``,
    ``y = CLOTH_CENTRAL_POS[1]``, zero velocity. Note the reference offsets
    by ``n/2`` (not ``(n-1)/2``) so the grid is NOT exactly centered; we
    reproduce that.
    """
    h, w = c.height, c.width
    spacing = jnp.asarray(c.spacing, dtype)
    r = jnp.arange(h, dtype=dtype)[:, None]          # rows → x
    col = jnp.arange(w, dtype=dtype)[None, :]        # cols → z
    x = (r - h / 2.0) * spacing + jnp.asarray(c.center[0], dtype)
    z = (col - w / 2.0) * spacing + jnp.asarray(c.center[2], dtype)
    pos = jnp.stack(
        [
            jnp.broadcast_to(x, (h, w)),
            jnp.full((h, w), c.center[1], dtype),
            jnp.broadcast_to(z, (h, w)),
        ],
        axis=0,
    )
    vel = jnp.zeros((3, h, w), dtype)
    return ClothState(pos=pos, vel=vel)


class ParticleParams(NamedTuple):
    """Dynamic params for the free-particle sim (``SimulationUniform``,
    instance.rs:79-87 / 4_instances_imgui/compute_movement.wgsl:10-17)."""

    bounds: jnp.ndarray
    radius: jnp.ndarray
    gravity: jnp.ndarray  # [3]
    damping: jnp.ndarray  # bound but unused, like the reference kernel

    @classmethod
    def from_config(cls, c: cfg.FreeParticleConfig) -> "ParticleParams":
        return cls(
            bounds=jnp.float32(c.bounds),
            radius=jnp.float32(c.radius),
            gravity=jnp.asarray(c.gravity, jnp.float32),
            damping=jnp.float32(c.damping),
        )


class ParticleState(NamedTuple):
    """Free-particle SoA state: ``pos``/``vel`` float32 ``[..., 3, N]``.

    ``render_pos`` exists only for ``bug_compat`` mode: the reference kernel
    writes the *pre-clamp* position into the model matrix
    (compute_movement.wgsl:62-64) while the clamped position is lost, so the
    rendered position and the (identical) physics position both keep the
    unclamped value; only the velocity flip persists. In bug-compat mode we
    therefore skip the position clamp entirely; ``render_pos`` is None in
    both modes and reserved for future divergence.
    """

    pos: jnp.ndarray
    vel: jnp.ndarray
