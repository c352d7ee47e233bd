"""Granular sim: up to millions of free particles with gravity, ground-plane
bounce, box walls, and uniform-grid pairwise contact (BASELINE configs[2]:
"1M free particles: gravity + ground-plane bounce + uniform-grid neighbor
broad-phase").

Extends the reference's free-particle integrator (C8/C9: gravity + wall
reflect, 10 particles, no interactions) with real particle-particle contact
via :mod:`wgpu_physics_engine_tpu.models.broadphase`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from . import broadphase
from ..core.state import ParticleState


@dataclasses.dataclass(frozen=True)
class GranularConfig:
    """Static granular-scene config. Box spans [-bounds, bounds]^3 with a
    solid floor at y = -bounds (ground plane)."""

    num_particles: int = 1_000_000
    bounds: float = 10.0
    radius: float = 0.04
    k_contact: float = 2000.0
    gravity: float = -9.81
    restitution: float = 0.5         # ground/wall bounce energy retention
    grid_capacity: int = 8
    window: int = 24                 # candidates per z-triple window

    def grid_spec(self) -> broadphase.GridSpec:
        # cap grid dims at 128^3: cell_start construction is a searchsorted
        # over num_cells queries (~140 ms/Mcell on v5e), the main fixed cost
        cell = max(2.0 * self.radius, 2.0 * self.bounds / 128)
        dims = int(2.0 * self.bounds / cell) + 1
        return broadphase.GridSpec(
            origin=(-self.bounds, -self.bounds, -self.bounds),
            cell_size=cell,
            dims=(dims, dims, dims),
            capacity=self.grid_capacity,
        )


def init_state(config: GranularConfig, key: jax.Array) -> ParticleState:
    """Particles jittered on a lattice in the upper half of the box."""
    n = config.num_particles
    side = int(jnp.ceil(n ** (1.0 / 3.0)))
    i = jnp.arange(side ** 3, dtype=jnp.int32)[:n]
    x = (i % side).astype(jnp.float32)
    y = ((i // side) % side).astype(jnp.float32)
    z = (i // (side * side)).astype(jnp.float32)
    span = 1.6 * config.bounds
    scale = span / side
    base = jnp.stack([
        x * scale - 0.8 * config.bounds,
        y * scale * 0.5 + 0.0,                   # upper half
        z * scale - 0.8 * config.bounds,
    ])
    jitter = 0.2 * scale * jax.random.uniform(key, (3, n), jnp.float32,
                                              minval=-1.0, maxval=1.0)
    return ParticleState(pos=(base + jitter).astype(jnp.float32),
                         vel=jnp.zeros((3, n), jnp.float32))


def substep(state: ParticleState, config: GranularConfig,
            dt: jnp.ndarray) -> ParticleState:
    """One step: grid rebuild → pair contact forces → gravity → integrate →
    ground/wall response with restitution."""
    spec = config.grid_spec()
    # scatter-free sorted-window broad-phase (TPU scatters serialize; see
    # broadphase.SortedGrid)
    grid = broadphase.build_sorted_grid(state.pos, state.vel, spec)
    force = broadphase.pair_forces_sorted(grid, spec, config.radius,
                                          config.k_contact,
                                          window=config.window)
    force = force.at[1].add(jnp.float32(config.gravity))   # unit mass

    vel = state.vel + force * dt
    pos = state.pos + vel * dt

    # ground plane + walls: clamp & reflect with restitution
    limit = jnp.float32(config.bounds - config.radius)
    e = jnp.float32(config.restitution)
    hit_low = (pos < -limit) & (vel < 0.0)
    hit_high = (pos > limit) & (vel > 0.0)
    vel = jnp.where(hit_low | hit_high, -e * vel, vel)
    pos = jnp.clip(pos, -limit, limit)
    return ParticleState(pos=pos, vel=vel)


@functools.partial(jax.jit, static_argnames=("config", "n_steps"))
def multi_step(state: ParticleState, config: GranularConfig, dt: jnp.ndarray,
               n_steps: int) -> ParticleState:
    def body(s, _):
        return substep(s, config, dt), None

    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out
