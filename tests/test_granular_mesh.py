"""Sharded granular stepping (parallel/granular_mesh.py) on the 8-device
virtual CPU mesh, vs the single-device pallas and XLA frozen paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wgpu_physics_engine_tpu.models import granular
from wgpu_physics_engine_tpu.parallel import granular_mesh, mesh as pmesh


@pytest.fixture(scope="module")
def devices8():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d[:8]


def _cfg(n, **kw):
    return granular.GranularConfig(
        num_particles=n, bounds=2.0, radius=0.08, restitution=0.4,
        rebuild_every=4, pallas_block=128, pallas_slab=384, **kw)


def test_sharded_matches_single_one_rebuild(devices8):
    """One frozen block (n_steps == rebuild_every) with N chosen so the
    sharded pad (block·8·D) equals the single-device pad: every kernel
    launch then sees identical operands block-for-block and the result
    is BITWISE equal to the single-device pallas path."""
    cfg = _cfg(2048)
    state = granular.init_state(cfg, jax.random.key(0))
    m = pmesh.make_mesh((2,), ("grains",), devices8[:2])
    dt = jnp.float32(1 / 240)
    out_s = granular_mesh.multi_step_sharded(state, cfg, dt, 4, m)
    out_1 = granular.multi_step(state, cfg, dt, 4, backend="pallas",
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(out_s.pos),
                                  np.asarray(out_1.pos))
    np.testing.assert_array_equal(np.asarray(out_s.vel),
                                  np.asarray(out_1.vel))


def test_sharded_matches_xla_multi_rebuild(devices8):
    """Multiple rebuilds + a remainder block on 4 devices vs the XLA
    frozen path (identical candidate sets; accumulation-order noise —
    the tolerance of test_pallas_matches_xla_frozen)."""
    cfg = _cfg(2048)
    state = granular.init_state(cfg, jax.random.key(1))
    m = pmesh.make_mesh((4,), ("grains",), devices8[:4])
    dt = jnp.float32(1 / 240)
    out_s, dmax = granular_mesh.multi_step_sharded(
        state, cfg, dt, 6, m, return_stats=True)
    out_x = granular.multi_step(state, cfg, dt, 6, backend="xla")
    assert int(dmax) == 0
    np.testing.assert_allclose(np.asarray(out_s.pos), np.asarray(out_x.pos),
                               atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(out_s.vel), np.asarray(out_x.vel),
                               atol=1e-3, rtol=0)


def test_diff_sharded_gradients_match_serial(devices8):
    """Worlds-DP differentiable path: the gradient of a summed loss over
    8 sharded worlds equals the sum of per-world single-device gradients
    — state cotangents shard-local, traced-scalar cotangents psum'd by
    shard_map's transpose (the DP all-reduce)."""
    from wgpu_physics_engine_tpu.core.state import ParticleState

    cfg = _cfg(256, grid_capacity=16)
    # 4 worlds over 4 devices: the serial reference unrolls one
    # differentiable rollout PER WORLD in a single jit, so world count
    # is pure compile cost — 4 exercises the same DP transpose psum as 8
    # at half the suite wall-clock (was the #1 CPU-side duration)
    n_worlds = 4
    m = pmesh.make_mesh((n_worlds,), ("worlds",), devices8[:n_worlds])
    dt = jnp.float32(1 / 240)
    settle = jax.jit(lambda s: granular.multi_step(s, cfg, dt, 30))
    worlds = []
    for i in range(n_worlds):
        s = settle(granular.init_state(cfg, jax.random.key(i)))
        worlds.append(ParticleState(pos=s.pos, vel=s.vel * 8.0))  # hot
    batched = ParticleState(pos=jnp.stack([s.pos for s in worlds]),
                            vel=jnp.stack([s.vel for s in worlds]))
    wp = jax.random.normal(jax.random.PRNGKey(3), batched.pos.shape)
    wv = jax.random.normal(jax.random.PRNGKey(4), batched.vel.shape)
    kc = jnp.float32(cfg.k_contact)
    grav = jnp.float32(cfg.gravity)
    e = jnp.float32(cfg.restitution)
    n_steps = 5   # one full rebuild segment + a remainder

    def loss_sharded(dt, kc, grav, e):
        out = granular_mesh.multi_step_diff_sharded(
            batched, cfg, dt, n_steps, m, k_contact=kc, gravity=grav,
            restitution=e)
        return jnp.sum(out.pos * wp) + jnp.sum(out.vel * wv)

    def loss_serial(dt, kc, grav, e):
        tot = 0.0
        for i, s in enumerate(worlds):
            out = granular.multi_step_diff(s, cfg, dt, n_steps,
                                           k_contact=kc, gravity=grav,
                                           restitution=e)
            tot += (jnp.sum(out.pos * wp[i]) + jnp.sum(out.vel * wv[i]))
        return tot

    v1, g1 = jax.jit(jax.value_and_grad(
        loss_sharded, argnums=(0, 1, 2, 3)))(dt, kc, grav, e)
    v2, g2 = jax.jit(jax.value_and_grad(
        loss_serial, argnums=(0, 1, 2, 3)))(dt, kc, grav, e)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for name, a, b in zip(("dt", "kc", "grav", "e"), g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(abs(b), 1e-30)
        assert abs(a - b) / scale < 1e-5, name
        assert abs(a) > 0.0, name


def test_sharded_rejects_bad_shapes(devices8):
    m = pmesh.make_mesh((4,), ("grains",), devices8[:4])
    cfg = _cfg(1026)                       # not divisible by 4
    state = granular.init_state(cfg, jax.random.key(2))
    with pytest.raises(ValueError, match="divisible"):
        granular_mesh.multi_step_sharded(state, cfg, jnp.float32(1e-3), 4, m)
    cfg2 = granular.GranularConfig(
        num_particles=2048, bounds=2.0, radius=0.08, rebuild_every=4,
        civ=False)
    state2 = granular.init_state(cfg2, jax.random.key(2))
    with pytest.raises(ValueError, match="CIV"):
        granular_mesh.multi_step_sharded(state2, cfg2, jnp.float32(1e-3),
                                         4, m)
