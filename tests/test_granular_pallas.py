"""Slab-DMA granular kernel (ops/granular_pallas.py) vs the XLA frozen
path and brute force. Runs in Pallas interpret mode on the CPU test mesh
(same pattern as test_cloth_pallas.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core.state import ParticleState
from wgpu_physics_engine_tpu.models import granular


def _brute_step(pos, vel, cfg, dt):
    """O(N^2) reference with models/granular._frozen_substep semantics:
    penalty contact -> gravity -> Euler -> wall clamp & reflect."""
    n = pos.shape[1]
    d = pos[:, :, None] - pos[:, None, :]
    dist = np.sqrt((d * d).sum(axis=0))
    min_dist = 2.0 * cfg.radius
    touching = (dist < min_dist) & (dist > 1e-6)
    np.fill_diagonal(touching, False)
    inv = 1.0 / np.where(dist > 1e-6, dist, 1.0)
    w = np.where(touching, cfg.k_contact * (min_dist - dist) * inv, 0.0)
    force = (w[None] * d).sum(axis=2)
    force[1] += cfg.gravity
    vel = vel + force * dt
    pos = pos + vel * dt
    limit = cfg.bounds - cfg.radius
    hit = ((pos < -limit) & (vel < 0)) | ((pos > limit) & (vel > 0))
    vel = np.where(hit, -cfg.restitution * vel, vel)
    pos = np.clip(pos, -limit, limit)
    return pos, vel


def test_pallas_matches_xla_frozen():
    """Same frozen-window schedule, slab kernel vs gather path — identical
    candidate sets, so results agree to accumulation-order noise. N=500 is
    not a multiple of pallas_block (padding exercised) and 10 steps is not
    a multiple of rebuild_every=4 (remainder block exercised)."""
    cfg = granular.GranularConfig(
        num_particles=500, bounds=2.0, radius=0.08, restitution=0.4,
        rebuild_every=4, window=64, max_neighbors=96,
        pallas_block=128, pallas_slab=512)
    state = granular.init_state(cfg, jax.random.PRNGKey(0))
    dt = jnp.float32(1 / 240)
    out_x, drop_x = granular.multi_step(state, cfg, dt, 10,
                                        return_stats=True, backend="xla")
    out_p, drop_p = granular.multi_step(state, cfg, dt, 10,
                                        return_stats=True, backend="pallas")
    assert int(drop_x) == 0 and int(drop_p) == 0
    np.testing.assert_allclose(np.asarray(out_p.pos), np.asarray(out_x.pos),
                               atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(out_p.vel), np.asarray(out_x.vel),
                               atol=1e-4, rtol=0)


def test_pallas_matches_brute_force_dense():
    """Dense 6^3 pile under gravity vs the O(N^2) reference — validates
    both window completeness (Verlet invariant) and the physics op order."""
    cfg = granular.GranularConfig(
        num_particles=216, bounds=1.5, radius=0.1, restitution=0.3,
        k_contact=500.0, rebuild_every=4, pallas_block=128, pallas_slab=512)
    side = 6
    g = jnp.stack(jnp.meshgrid(*[jnp.arange(side, dtype=jnp.float32)] * 3,
                               indexing="ij")).reshape(3, -1)
    pos = (g - (side - 1) / 2) * (2.2 * cfg.radius)
    state = ParticleState(pos=pos, vel=jnp.zeros_like(pos))
    dt = jnp.float32(1 / 480)
    out, dropped = granular.multi_step(state, cfg, dt, 24,
                                       return_stats=True, backend="pallas")
    assert int(dropped) == 0
    bp, bv = np.asarray(pos, np.float32), np.zeros((3, 216), np.float32)
    for _ in range(24):
        bp, bv = _brute_step(bp, bv, cfg, float(dt))
    np.testing.assert_allclose(np.asarray(out.pos), bp, atol=2e-4, rtol=0)


def test_slab_overflow_telemetry_fires():
    """An undersized slab reports dropped > 0 instead of silently losing
    contacts (same contract as the window/max_neighbors telemetry).
    All 400 particles in one grid cell -> every window spans ~400 slots,
    far beyond what slabs A+B (128 each) can cover."""
    cfg = granular.GranularConfig(
        num_particles=400, bounds=4.0, radius=0.08, rebuild_every=4,
        pallas_block=128, pallas_slab=128)  # slab == block: no margin
    pos = jnp.asarray(
        np.random.default_rng(1).uniform(-0.1, 0.1, (3, 400)), jnp.float32)
    state = ParticleState(pos=pos, vel=jnp.zeros_like(pos))
    _, dropped = granular.multi_step(state, cfg, jnp.float32(1 / 240), 4,
                                     return_stats=True, backend="pallas")
    assert int(dropped) > 0


def test_pallas_settles_in_box():
    """Long-horizon stability: everything stays in the box and falls."""
    cfg = granular.GranularConfig(num_particles=512, radius=0.1, bounds=4.0,
                                  restitution=0.3, pallas_block=128,
                                  pallas_slab=512)
    state = granular.init_state(cfg, jax.random.key(0))
    out = granular.multi_step(state, cfg, jnp.float32(1 / 240), 300,
                              backend="pallas")
    p = np.asarray(out.pos)
    assert np.isfinite(p).all()
    limit = cfg.bounds - cfg.radius
    assert (np.abs(p) <= limit + 1e-4).all()
    assert p[1].mean() < 0.0
