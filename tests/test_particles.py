"""Free-particle box sim tests (sim 4 semantics,
4_instances_imgui/compute_movement.wgsl:36-105), incl. the documented
position-clamp quirk (SURVEY C9)."""

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.core.state import ParticleParams
from wgpu_physics_engine_tpu.models import particles


def test_free_fall_matches_analytic():
    c = cfg.FreeParticleConfig(num_particles=4)
    params = ParticleParams.from_config(c)
    state = particles.init_state(c, jax.random.key(0))
    state = state._replace(vel=jnp.zeros_like(state.vel))
    dt = jnp.float32(1.0 / 60.0)
    out = jax.jit(particles.substep)(state, params, dt)
    np.testing.assert_allclose(np.asarray(out.vel[1]), -9.81 / 60.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.pos[1]), c.radius - 9.81 / 60.0**2, rtol=1e-5
    )


def test_wall_bounce_correct_mode():
    """Documented-correct semantics: clamp + velocity flip."""
    c = cfg.FreeParticleConfig(num_particles=1)
    params = ParticleParams.from_config(c)._replace(gravity=jnp.zeros(3, jnp.float32))
    pos = jnp.array([[9.5], [0.0], [0.0]], jnp.float32)
    vel = jnp.array([[60.0], [0.0], [0.0]], jnp.float32)
    state = particles.ParticleState(pos=pos, vel=vel)
    out = particles.substep(state, params, jnp.float32(0.05))
    # pos would be 12.5 > bounds - r = 9 → clamped, velocity flipped
    assert float(out.pos[0, 0]) == 9.0
    assert float(out.vel[0, 0]) == -60.0


def test_wall_bounce_bug_compat_mode():
    """Reference-faithful quirk: the clamp is lost, only the flip persists
    (compute_movement.wgsl:62-64 write precedes the clamp at :71-100)."""
    c = cfg.FreeParticleConfig(num_particles=1, bug_compat=True)
    params = ParticleParams.from_config(c)._replace(gravity=jnp.zeros(3, jnp.float32))
    pos = jnp.array([[9.5], [0.0], [0.0]], jnp.float32)
    vel = jnp.array([[60.0], [0.0], [0.0]], jnp.float32)
    state = particles.ParticleState(pos=pos, vel=vel)
    out = particles.substep(state, params, jnp.float32(0.05), bug_compat=True)
    np.testing.assert_allclose(float(out.pos[0, 0]), 12.5, rtol=1e-6)
    assert float(out.vel[0, 0]) == -60.0


def test_multi_step_matches_numpy_oracle():
    c = cfg.FreeParticleConfig(num_particles=16)
    params = ParticleParams.from_config(c)
    state = particles.init_state(c, jax.random.key(42))
    dt = 1.0 / 60.0
    pos = np.asarray(state.pos).copy()
    vel = np.asarray(state.vel).copy()
    for _ in range(600):
        pos, vel = particles.oracle_substep(
            pos, vel, c.gravity, c.bounds, c.radius, dt
        )
    out = particles.multi_step(state, params, jnp.float32(dt), 600)
    np.testing.assert_allclose(np.asarray(out.pos), pos, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.vel), vel, atol=1e-4, rtol=1e-4)


def test_particles_stay_in_box():
    c = cfg.FreeParticleConfig(num_particles=64)
    params = ParticleParams.from_config(c)
    state = particles.init_state(c, jax.random.key(7))
    out = particles.multi_step(state, params, jnp.float32(1.0 / 120.0), 2000)
    limit = c.bounds - c.radius
    assert np.all(np.abs(np.asarray(out.pos)) <= limit + 1e-4)
    assert np.all(np.isfinite(np.asarray(out.vel)))
