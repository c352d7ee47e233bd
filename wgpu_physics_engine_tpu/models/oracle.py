"""CPU reference oracle: exact NumPy fp32 port of the reference's cloth
physics semantics.

This module is the *truth* for golden-trajectory tests (BASELINE.json
configs[0]: "16×16 cloth grid ... CPU-runnable reference step"). It follows
the operation order of the two WGSL kernels precisely:

* ``forces.wgsl:143-267`` (``compute_springs``): per spring, Hooke with the
  UNIFORM rest length from PhysicsConstants (not per-spring ``prev_length``),
  plus velocity-projection damping; zero force if ``dist < 1e-6``.
* ``forces.wgsl:272-313`` (``accumulate_forces``): signed sum of spring
  forces per particle — ``+force`` where the particle is p0, ``-force``
  where p1, scanning structural → shear → bend in list order.
* ``compute_movement.wgsl:70-174`` (``main``): gravity, sphere penalty
  contact, Coulomb friction on the post-contact resultant, semi-implicit
  Euler with exponential speed damping (``vel *= speed_damp ** dt``), then a
  hard projection that snaps penetrating particles to the surface and zeroes
  velocity entirely.

Everything is float32; scalars are cast before use so NumPy never promotes
to float64.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..core import topology as topo
from ..core import config as cfg


@dataclasses.dataclass
class OracleScene:
    """Host-side mirror of the cloth scene for the oracle stepper."""

    height: int
    width: int
    springs: topo.SpringLists
    # PhysicsConstants (forces.wgsl:53-67)
    k: tuple[float, float, float]          # struct, shear, bend
    c: tuple[float, float, float]
    rest: tuple[float, float, float]
    k_contact: float
    mu: float
    # SimulationData (forces.wgsl:69-79)
    particle_radius: float
    globe_radius: float
    mass: float
    gravity: float
    speed_damp: float


def make_scene(config: cfg.ClothConfig) -> tuple[OracleScene, np.ndarray, np.ndarray]:
    """Build the oracle scene + initial (pos, vel) as ``[N,3]`` float32.

    Initial layout mirrors ``generate_instances`` (cloth.rs:848-893).
    """
    h, w = config.height, config.width
    spacing = np.float32(config.spacing)
    pos = np.zeros((h * w, 3), np.float32)
    for r in range(h):
        for col in range(w):
            i = r * w + col
            pos[i, 0] = (np.float32(r) - np.float32(h) / np.float32(2.0)) * spacing + np.float32(config.center[0])
            pos[i, 1] = np.float32(config.center[1])
            pos[i, 2] = (np.float32(col) - np.float32(w) / np.float32(2.0)) * spacing + np.float32(config.center[2])
    vel = np.zeros((h * w, 3), np.float32)
    springs = topo.build_spring_lists(pos, h, w)
    scene = OracleScene(
        height=h,
        width=w,
        springs=springs,
        k=(config.k_struct, config.k_shear, config.k_bend),
        c=(config.c_struct, config.c_shear, config.c_bend),
        rest=(config.rest_struct, config.rest_shear, config.rest_bend),
        k_contact=config.k_contact,
        mu=config.mu,
        particle_radius=config.particle_radius,
        globe_radius=config.globe_radius,
        mass=config.mass,
        gravity=config.gravity,
        speed_damp=config.speed_damp,
    )
    return scene, pos, vel


def _spring_forces(
    pos: np.ndarray,
    vel: np.ndarray,
    p0: np.ndarray,
    p1: np.ndarray,
    k: np.float32,
    c: np.float32,
    rest: np.float32,
) -> np.ndarray:
    """Per-spring total force on p0 (forces.wgsl:158-186), vectorized fp32."""
    if p0.shape[0] == 0:
        return np.zeros((0, 3), np.float32)
    delta = pos[p1] - pos[p0]                       # vec to p1
    dist = np.sqrt((delta * delta).sum(axis=1, dtype=np.float32))
    safe = dist >= np.float32(1e-6)
    inv = np.where(safe, np.float32(1.0) / np.where(safe, dist, np.float32(1.0)), np.float32(0.0))
    dirv = delta * inv[:, None]
    stretch = dist - rest
    hooke = (k * stretch)[:, None] * dirv           # k * stretch * dir
    rel_vel = vel[p1] - vel[p0]
    v_along = (rel_vel * dirv).sum(axis=1, dtype=np.float32)
    damp = (c * v_along)[:, None] * dirv            # c * v_along * dir
    total = hooke + damp
    return np.where(safe[:, None], total, np.float32(0.0)).astype(np.float32)


def accumulate_spring_forces(scene: OracleScene, pos: np.ndarray, vel: np.ndarray) -> np.ndarray:
    """Edge-list signed accumulation (forces.wgsl:272-313): +F at p0, −F at
    p1, structural then shear then bend. Semantic cross-check path; the
    canonical (trajectory-defining) order is
    :func:`accumulate_spring_forces_grid`."""
    s = scene.springs
    force = np.zeros_like(pos)
    for (p0, p1, k, c, rest) in (
        (s.struct_p0, s.struct_p1, scene.k[0], scene.c[0], scene.rest[0]),
        (s.shear_p0, s.shear_p1, scene.k[1], scene.c[1], scene.rest[1]),
        (s.bend_p0, s.bend_p1, scene.k[2], scene.c[2], scene.rest[2]),
    ):
        f = _spring_forces(pos, vel, p0, p1, np.float32(k), np.float32(c), np.float32(rest))
        np.add.at(force, p0, f)
        np.subtract.at(force, p1, f)
    return force


# Stencil offsets per spring family, identical to models/cloth.py.
_STRUCT_OFFSETS = ((0, 1), (1, 0))
_SHEAR_OFFSETS = ((1, 1), (1, -1))
_BEND_OFFSETS = ((0, 2), (2, 0))


def _edge_slices(h: int, w: int, dr: int, dc: int):
    if dc >= 0:
        c0, c1 = slice(0, w - dc), slice(dc, w)
    else:
        c0, c1 = slice(-dc, w), slice(0, w + dc)
    return (slice(0, h - dr), c0), (slice(dr, h), c1)


def accumulate_spring_forces_grid(scene: OracleScene, pos: np.ndarray, vel: np.ndarray) -> np.ndarray:
    """Canonical stencil-order accumulation: the fp32 summation order this
    framework defines for cloth trajectories, mirrored op-for-op by the TPU
    path (:func:`wgpu_physics_engine_tpu.models.cloth.spring_forces`).

    Per spring the force value is exactly forces.wgsl:158-186; only the
    per-particle *summation order* of the (up to 12) incident-edge terms is
    fixed to stencil order instead of the reference's edge-list scan order —
    mathematically identical, and within the fp32 reordering noise of the
    reference itself. ``pos``/``vel``: ``[N,3]`` row-major over the grid.
    """
    h, w = scene.height, scene.width
    posg = pos.reshape(h, w, 3)
    velg = vel.reshape(h, w, 3)
    force = np.zeros_like(posg)
    families = (
        (_STRUCT_OFFSETS, scene.k[0], scene.c[0], scene.rest[0]),
        (_SHEAR_OFFSETS, scene.k[1], scene.c[1], scene.rest[1]),
        (_BEND_OFFSETS, scene.k[2], scene.c[2], scene.rest[2]),
    )
    for offsets, k, c, rest in families:
        k, c, rest = np.float32(k), np.float32(c), np.float32(rest)
        for dr, dc in offsets:
            (r0, c0), (r1, c1) = _edge_slices(h, w, dr, dc)
            p0, p1 = posg[r0, c0], posg[r1, c1]
            v0, v1 = velg[r0, c0], velg[r1, c1]
            delta = p1 - p0
            dist = np.sqrt((delta * delta).sum(axis=-1, dtype=np.float32))
            safe = dist >= np.float32(1e-6)
            inv = np.where(safe, np.float32(1.0) / np.where(safe, dist, np.float32(1.0)), np.float32(0.0))
            dirv = delta * inv[..., None]
            stretch = dist - rest
            hooke = (k * stretch)[..., None] * dirv
            v_along = ((v1 - v0) * dirv).sum(axis=-1, dtype=np.float32)
            damp = (c * v_along)[..., None] * dirv
            e = np.where(safe[..., None], hooke + damp, np.float32(0.0))
            force[r0, c0] += e
            force[r1, c1] -= e
    return force.reshape(-1, 3)


def integrate(
    scene: OracleScene,
    pos: np.ndarray,
    vel: np.ndarray,
    spring_force: np.ndarray,
    dt: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Movement kernel (compute_movement.wgsl:70-174), vectorized fp32."""
    dt = np.float32(dt)
    mass = np.float32(scene.mass)
    total = spring_force.copy()

    # Gravity (compute_movement.wgsl:86)
    total[:, 1] += mass * np.float32(scene.gravity)

    # Sphere contact + friction (compute_movement.wgsl:107-133)
    dist = np.sqrt((pos * pos).sum(axis=1, dtype=np.float32))
    min_dist = np.float32(scene.globe_radius) + np.float32(scene.particle_radius)
    in_contact = (dist < min_dist) & (dist > np.float32(1e-6))
    safe_dist = np.where(dist > np.float32(1e-6), dist, np.float32(1.0))
    n = pos / safe_dist[:, None]
    penetration = min_dist - dist
    f_contact = (np.float32(scene.k_contact) * penetration)[:, None] * n
    total = np.where(in_contact[:, None], total + f_contact, total)

    ro = total
    ro_n_mag = (ro * n).sum(axis=1, dtype=np.float32)
    ro_t = ro - ro_n_mag[:, None] * n
    ro_t_mag = np.sqrt((ro_t * ro_t).sum(axis=1, dtype=np.float32))
    fric_active = in_contact & (ro_t_mag > np.float32(1e-6))
    safe_t = np.where(ro_t_mag > np.float32(1e-6), ro_t_mag, np.float32(1.0))
    tangent = ro_t / safe_t[:, None]
    f_fric = (-np.minimum(ro_t_mag, np.float32(scene.mu) * np.abs(ro_n_mag)))[:, None] * tangent
    total = np.where(fric_active[:, None], total + f_fric, total)

    # Semi-implicit Euler + exponential damping (compute_movement.wgsl:137-140)
    accel = total / mass
    vel = vel + accel * dt
    vel = vel * np.float32(np.power(np.float32(scene.speed_damp), dt))
    pos = pos + vel * dt

    # Hard projection (compute_movement.wgsl:143-158)
    final_dist = np.sqrt((pos * pos).sum(axis=1, dtype=np.float32))
    pen = final_dist < min_dist
    pen_safe = pen & (final_dist > np.float32(1e-6))
    pen_center = pen & ~pen_safe
    nf = pos / np.where(final_dist > np.float32(1e-6), final_dist, np.float32(1.0))[:, None]
    pos = np.where(pen_safe[:, None], nf * min_dist, pos)
    pos = np.where(pen_center[:, None], np.array([0.0, 1.0, 0.0], np.float32) * min_dist, pos)
    vel = np.where(pen[:, None], np.float32(0.0), vel)
    return pos.astype(np.float32), vel.astype(np.float32)


def substep(scene: OracleScene, pos: np.ndarray, vel: np.ndarray, dt: float,
            accumulation: str = "grid"):
    """One full physics substep: springs → accumulate → integrate
    (dispatch_compute pass order, cloth.rs:1283-1327).

    ``accumulation``: 'grid' (canonical stencil order) or 'edges'
    (reference edge-list scan order; same values, different fp32 order).
    """
    if accumulation == "grid":
        force = accumulate_spring_forces_grid(scene, pos, vel)
    else:
        force = accumulate_spring_forces(scene, pos, vel)
    return integrate(scene, pos, vel, force, dt)


def simulate(scene: OracleScene, pos: np.ndarray, vel: np.ndarray, dt: float, n_steps: int):
    """Run ``n_steps`` substeps; returns final (pos, vel)."""
    for _ in range(n_steps):
        pos, vel = substep(scene, pos, vel, dt)
    return pos, vel
