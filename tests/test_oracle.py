"""Unit tests of the CPU oracle physics against analytic values
(SURVEY §4.2): spring force law, gravity free-fall, sphere contact,
Coulomb friction clamp, hard projection."""

import numpy as np

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.models import oracle


def tiny_scene(**overrides):
    c = cfg.ClothConfig(height=2, width=2, **overrides)
    return oracle.make_scene(c)


def test_two_particle_spring_force():
    """Hooke + damping on a single spring edge (forces.wgsl:158-186)."""
    k, c_damp, rest = np.float32(450.0), np.float32(5.0), np.float32(0.5)
    pos = np.array([[0, 0, 0], [0, 0, rest * 1.5]], np.float32)
    vel = np.zeros_like(pos)
    vel[1, 2] = 2.0  # p1 moving away along the spring
    p0 = np.array([0], np.int32)
    p1 = np.array([1], np.int32)
    f = oracle._spring_forces(pos, vel, p0, p1, k, c_damp, rest)
    # stretched by 0.5*rest → hooke pulls p0 toward p1 (+z); damping adds
    expect = k * (rest * 0.5) + c_damp * 2.0
    np.testing.assert_allclose(f[0], [0.0, 0.0, expect], rtol=1e-5)


def test_newtons_third_law_accumulation():
    """Each edge contributes +F to p0 and −F to p1, so the grid's total
    spring force is identically ~0 (forces.wgsl:272-313)."""
    c = cfg.ClothConfig(height=5, width=5)
    scene, pos, vel = oracle.make_scene(c)
    rng = np.random.default_rng(0)
    pos = pos + rng.normal(0, 0.3, pos.shape).astype(np.float32)
    vel = rng.normal(0, 1.0, vel.shape).astype(np.float32)
    f = oracle.accumulate_spring_forces(scene, pos, vel)
    np.testing.assert_allclose(f.sum(axis=0), 0.0, atol=1e-3)


def test_zero_length_spring_guard():
    scene, pos, vel = tiny_scene()
    pos = np.zeros_like(pos) + np.float32(100.0)  # all coincident, far from globe
    vel = np.zeros_like(pos)
    f = oracle.accumulate_spring_forces(scene, pos, vel)
    assert np.all(np.isfinite(f))
    np.testing.assert_array_equal(f, 0.0)


def test_grid_accumulation_matches_edge_list():
    """The canonical stencil-order accumulation computes the same sums as
    the reference's edge-list scan, up to fp32 reordering noise."""
    c = cfg.ClothConfig(height=7, width=9)
    scene, pos, vel = oracle.make_scene(c)
    rng = np.random.default_rng(3)
    pos = pos + rng.normal(0, 0.2, pos.shape).astype(np.float32)
    vel = rng.normal(0, 1.0, vel.shape).astype(np.float32)
    fa = oracle.accumulate_spring_forces(scene, pos, vel)
    fb = oracle.accumulate_spring_forces_grid(scene, pos, vel)
    np.testing.assert_allclose(fa, fb, atol=1e-3, rtol=1e-5)


def test_free_fall():
    """No springs stretched, far from globe: pure gravity Euler step."""
    scene, pos, vel = tiny_scene()
    dt = np.float32(1.0 / 480.0)
    f = np.zeros_like(pos)
    p1, v1 = oracle.integrate(scene, pos.copy(), vel.copy(), f, dt)
    g = np.float32(scene.gravity)
    np.testing.assert_allclose(v1[:, 1], g * dt, rtol=1e-6)
    np.testing.assert_allclose(p1[:, 1], pos[:, 1] + g * dt * dt, rtol=1e-6)
    np.testing.assert_array_equal(p1[:, 0], pos[:, 0])


def test_contact_force_direction():
    """Particle inside the sphere gets a radial penalty force
    (compute_movement.wgsl:107-117)."""
    scene, pos, vel = tiny_scene()
    min_dist = np.float32(scene.globe_radius + scene.particle_radius)
    # place particle 0 slightly penetrating, directly above origin
    pos = np.array([[0, min_dist - 0.05, 0]] * 4, np.float32)
    vel = np.zeros_like(pos)
    f = np.zeros_like(pos)
    # dt large enough that the particle exits the sphere this step, so the
    # hard projection (which would zero velocity) does not trigger
    dt = np.float32(0.05)
    p1, v1 = oracle.integrate(scene, pos, vel, f, dt)
    # net upward force: k_contact * 0.05 + gravity*mass
    expect = (scene.k_contact * 0.05 + scene.mass * scene.gravity) * dt
    np.testing.assert_allclose(v1[:, 1], expect * np.float32(scene.speed_damp) ** dt,
                               rtol=1e-3)


def test_friction_cancels_small_tangential():
    """With mu large enough, friction exactly cancels the tangential
    component of the resultant (compute_movement.wgsl:119-131)."""
    scene, _, _ = tiny_scene(mu=10.0)
    min_dist = np.float32(scene.globe_radius + scene.particle_radius)
    pos = np.array([[0, min_dist - 0.01, 0]] * 4, np.float32)
    vel = np.zeros_like(pos)
    f = np.zeros_like(pos)
    f[:, 0] = 0.5  # small tangential (x) force; normal is +y here
    dt = np.float32(0.05)
    p1, v1 = oracle.integrate(scene, pos, vel, f, dt)
    np.testing.assert_allclose(v1[:, 0], 0.0, atol=1e-6)
    assert np.all(v1[:, 1] > 0)  # particle escaped; projection didn't fire


def test_friction_coulomb_clamp():
    """Large tangential force: friction magnitude = mu * |normal|."""
    scene, _, _ = tiny_scene(mu=0.1)
    min_dist = np.float32(scene.globe_radius + scene.particle_radius)
    pen = np.float32(0.01)
    pos = np.array([[0, min_dist - pen, 0]] * 4, np.float32)
    vel = np.zeros_like(pos)
    f = np.zeros_like(pos)
    f[:, 0] = 100.0
    dt = np.float32(0.05)
    p1, v1 = oracle.integrate(scene, pos, vel, f, dt)
    ro_n = scene.k_contact * pen + scene.mass * scene.gravity  # y component
    expect_fx = 100.0 - scene.mu * abs(ro_n)
    np.testing.assert_allclose(v1[:, 0], expect_fx * dt * np.float32(scene.speed_damp) ** dt,
                               rtol=1e-3)


def test_hard_projection_zeroes_velocity():
    """A particle that ends the step inside the sphere is snapped to the
    surface with velocity fully zeroed (compute_movement.wgsl:143-158)."""
    scene, _, _ = tiny_scene()
    min_dist = np.float32(scene.globe_radius + scene.particle_radius)
    pos = np.array([[0, 0.5 * min_dist, 0]] * 4, np.float32)
    vel = np.zeros_like(pos)
    vel[:, 1] = -50.0
    f = np.zeros_like(pos)
    dt = np.float32(1.0 / 480.0)
    p1, v1 = oracle.integrate(scene, pos, vel, f, dt)
    np.testing.assert_allclose(np.linalg.norm(p1, axis=1), min_dist, rtol=1e-5)
    np.testing.assert_array_equal(v1, 0.0)


def test_resting_cloth_no_nan_long_run():
    """Stability property (SURVEY §4.4): 2,000 substeps, finite state."""
    c = cfg.ClothConfig(height=8, width=8)
    scene, pos, vel = oracle.make_scene(c)
    pos, vel = oracle.simulate(scene, pos, vel, 1.0 / 480.0, 2000)
    assert np.all(np.isfinite(pos)) and np.all(np.isfinite(vel))
    # cloth has fallen: mean height strictly below spawn
    assert pos[:, 1].mean() < 40.0
