"""Free-particle box simulation (sim 4, ``4_instances_imgui``).

TPU-native port of ``4_instances_imgui/compute_movement.wgsl:36-105``:
N spheres under gravity inside a wireframe box, per-axis wall bounce.
State is SoA ``[3, N]`` (the reference packs position in a per-instance
mat4; see ``instance.rs:71-76``).

Two semantic modes (SURVEY §7 "bug-compatibility decisions"):

* documented-correct (default): on bounce the position is clamped to the
  wall AND the velocity is flipped;
* ``bug_compat=True``: reproduces the reference kernel exactly — the
  position clamp is computed into a local *after* the matrix write
  (compute_movement.wgsl:62-64 vs :71-100) and is lost, so only the
  velocity flip persists.

The reference's ``damping`` uniform is bound but never applied
(SimulationUniform, instance.rs:84; never read in the WGSL) — we mirror
that: ``ParticleParams.damping`` is carried but unused.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import config as cfg
from ..core.state import ParticleParams, ParticleState


def init_state(config: cfg.FreeParticleConfig, key: jax.Array) -> ParticleState:
    """Initial state (``generate_instances``, instance.rs:443-492): all
    particles at ``(0, radius, 0)`` with velocity ~ U(-speed, speed)^3."""
    n = config.num_particles
    pos = jnp.zeros((3, n), jnp.float32).at[1].set(config.radius)
    vel = jax.random.uniform(
        key, (3, n), jnp.float32,
        minval=-config.initial_speed, maxval=config.initial_speed,
    )
    return ParticleState(pos=pos, vel=vel)


def substep(state: ParticleState, params: ParticleParams, dt: jnp.ndarray,
            bug_compat: bool = False) -> ParticleState:
    """One integration step (compute_movement.wgsl:36-105).

    ``v += g*dt``; ``pos += v*dt``; then per-axis: if beyond the wall and
    moving outward, flip velocity (and clamp position unless bug_compat).
    """
    vel = state.vel + params.gravity[:, None] * dt
    pos = state.pos + vel * dt

    limit = params.bounds - params.radius
    hit_low = (pos < -limit) & (vel < 0.0)
    hit_high = (pos > limit) & (vel > 0.0)
    vel = jnp.where(hit_low | hit_high, -vel, vel)
    if not bug_compat:
        pos = jnp.where(hit_low, -limit, pos)
        pos = jnp.where(hit_high, limit, pos)
    return ParticleState(pos=pos, vel=vel)


@functools.partial(jax.jit, static_argnames=("n_steps", "bug_compat"))
def multi_step(state: ParticleState, params: ParticleParams, dt: jnp.ndarray,
               n_steps: int, bug_compat: bool = False) -> ParticleState:
    def body(s, _):
        return substep(s, params, dt, bug_compat), None

    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out


def oracle_substep(pos, vel, gravity, bounds, radius, dt, bug_compat=False):
    """NumPy fp32 reference for unit tests; same semantics as :func:`substep`.

    ``pos``/``vel``: ``[3, N]`` float32.
    """
    import numpy as np

    dt = np.float32(dt)
    vel = vel + np.asarray(gravity, np.float32)[:, None] * dt
    pos = pos + vel * dt
    limit = np.float32(bounds) - np.float32(radius)
    hit_low = (pos < -limit) & (vel < 0.0)
    hit_high = (pos > limit) & (vel > 0.0)
    new_vel = np.where(hit_low | hit_high, -vel, vel)
    if not bug_compat:
        pos = np.where(hit_low, -limit, pos)
        pos = np.where(hit_high, limit, pos)
    return pos.astype(np.float32), new_vel.astype(np.float32)
