"""Fused Pallas kernel vs the XLA stencil path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state
from wgpu_physics_engine_tpu.models import cloth, oracle
from wgpu_physics_engine_tpu.ops import cloth_pallas


def from_grid(g):
    return np.transpose(np.asarray(g), (1, 2, 0)).reshape(-1, 3)


@pytest.mark.parametrize("hw", [(16, 16), (8, 24)])
def test_pallas_matches_xla_path(hw):
    h, w = hw
    c = cfg.ClothConfig(height=h, width=w)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    key = jax.random.key(1)
    state = state._replace(
        vel=0.5 * jax.random.normal(key, state.vel.shape, jnp.float32))
    dt = jnp.float32(1 / 480)

    ref = cloth.multi_step(state, params, dt, 40)
    got = cloth_pallas.multi_step(state, params, dt, 40, interpret=True)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(ref.vel),
                               atol=1e-4, rtol=1e-4)


def test_pallas_matches_oracle_through_impact():
    """Same golden-trajectory bar as the XLA path, on a short-fall scene
    (spawn close to the globe so impact happens within ~180 steps)."""
    c = cfg.ClothConfig(height=16, width=16, center=(0.0, 12.0, 0.0),
                        cloth_size=8.0)
    scene, pos0, vel0 = oracle.make_scene(c)
    dt = 1.0 / 480.0
    n = 330
    ref_pos, ref_vel = oracle.simulate(scene, pos0.copy(), vel0.copy(), dt, n)

    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    got = cloth_pallas.multi_step(state, params, jnp.float32(dt), n, interpret=True)
    np.testing.assert_allclose(from_grid(got.pos), ref_pos, atol=1e-4, rtol=1e-4)


def test_pallas_pins():
    c = cfg.ClothConfig(height=16, width=16)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    pin = np.zeros((16, 16), bool)
    pin[0, :] = True
    state = state._replace(pin_mask=jnp.asarray(pin), pin_pos=state.pos)

    ref = cloth.multi_step(state, params, jnp.float32(1 / 480), 60)
    got = cloth_pallas.multi_step(state, params, jnp.float32(1 / 480), 60,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(got.pos)[:, 0, :], np.asarray(state.pos)[:, 0, :])


def test_fast_math_stays_within_fidelity_bar():
    """fast_math (rsqrt) deviates from the exact kernel by ulps, far inside
    the 1e-4 bar even through impact."""
    c = cfg.ClothConfig(height=16, width=16, center=(0.0, 12.0, 0.0),
                        cloth_size=8.0)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    dt = jnp.float32(1 / 480)
    a = cloth_pallas.multi_step(state, params, dt, 330, interpret=True)
    b = cloth_pallas.multi_step(state, params, dt, 330, interpret=True,
                                fast_math=True)
    np.testing.assert_allclose(np.asarray(b.pos), np.asarray(a.pos),
                               atol=1e-4, rtol=1e-4)


def test_batched_worlds_kernel_bitwise_matches_per_world():
    """The grid=(B,) batched-worlds kernel (one program per world,
    per-world SMEM params row) must be BITWISE equal to stepping each
    world through the single-world kernel — identical _substep_planes
    expressions, only the launch packaging differs."""
    c = cfg.ClothConfig(height=12, width=20)
    base = init_cloth_state(c)
    p1 = ClothParams.from_config(c)
    b = 3
    key = jax.random.key(2)
    pos = jnp.broadcast_to(base.pos, (b,) + base.pos.shape)
    pos = pos + 0.1 * jax.random.normal(key, pos.shape, jnp.float32)
    vel = 0.3 * jax.random.normal(jax.random.key(3), pos.shape, jnp.float32)
    params = jax.tree.map(lambda leaf: jnp.stack(
        [leaf * (1.0 + 0.1 * i) for i in range(b)]), p1)
    dt = jnp.float32(1 / 480)

    batch = cloth.ClothState(pos=pos, vel=vel)
    got = cloth_pallas._multi_step_batched(batch, params, dt, 25,
                                           interpret=True, fast_math=False)
    for i in range(b):
        one = cloth_pallas.multi_step(
            cloth.ClothState(pos=pos[i], vel=vel[i]),
            jax.tree.map(lambda leaf: leaf[i], params), dt, 25,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(got.pos[i]),
                                      np.asarray(one.pos))
        np.testing.assert_array_equal(np.asarray(got.vel[i]),
                                      np.asarray(one.vel))


def test_lanes_kernel_bitwise_matches_per_world():
    """The lane-folded batched kernel (g worlds side by side in the lane
    axis, per-world params as column-constant [1, g*w] planes) matches
    the single-world kernel — cross-world roll wraparound is masked
    exactly like single-world column wraparound, and every param use is
    an elementwise broadcast. Covers g < B with remainder padding
    (B=5, g=2) and per-world params.

    Tolerance note: on REAL TPU the two packagings are bitwise equal
    (pinned on-device by tools/probes/probe_lanes.py: max|dpos| == 0 over
    24 substeps). Under interpret mode XLA CPU makes different FMA
    contraction choices for ``k*stretch + c*v_along`` when k/c are
    broadcast planes vs scalars, leaving ulp-scale residue on
    near-cancellation values — hence allclose at 1e-6 here, not
    assert_array_equal."""
    c = cfg.ClothConfig(height=12, width=20)
    base = init_cloth_state(c)
    p1 = ClothParams.from_config(c)
    b = 5
    key = jax.random.key(4)
    pos = jnp.broadcast_to(base.pos, (b,) + base.pos.shape)
    pos = pos + 0.1 * jax.random.normal(key, pos.shape, jnp.float32)
    vel = 0.3 * jax.random.normal(jax.random.key(5), pos.shape, jnp.float32)
    params = jax.tree.map(lambda leaf: jnp.stack(
        [leaf * (1.0 + 0.07 * i) for i in range(b)]), p1)
    dt = jnp.float32(1 / 480)

    batch = cloth.ClothState(pos=pos, vel=vel)
    got = cloth_pallas._multi_step_lanes(batch, params, dt, 25,
                                         interpret=True, fast_math=False,
                                         group=2)
    for i in range(b):
        one = cloth_pallas.multi_step(
            cloth.ClothState(pos=pos[i], vel=vel[i]),
            jax.tree.map(lambda leaf: leaf[i], params), dt, 25,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got.pos[i]),
                                   np.asarray(one.pos), atol=1e-6, rtol=0)
        np.testing.assert_allclose(np.asarray(got.vel[i]),
                                   np.asarray(one.vel), atol=1e-6, rtol=0)


def test_lanes_kernel_pins_bitwise():
    """Lane-folded kernel with batched pins: pinned rows stay fixed and
    every world matches its single-world run bitwise."""
    c = cfg.ClothConfig(height=10, width=16)
    base = init_cloth_state(c)
    b = 3
    pin = np.zeros((10, 16), bool)
    pin[0, :] = True
    pos = jnp.broadcast_to(base.pos, (b,) + base.pos.shape)
    pos = pos + 0.05 * jax.random.normal(jax.random.key(6), pos.shape,
                                         jnp.float32)
    vel = jnp.zeros_like(pos)
    state = cloth.ClothState(
        pos=pos, vel=vel,
        pin_mask=jnp.broadcast_to(jnp.asarray(pin), (b, 10, 16)),
        pin_pos=pos)
    params = ClothParams.from_config(c)
    dt = jnp.float32(1 / 480)

    got = cloth_pallas._multi_step_lanes(state, params, dt, 30,
                                         interpret=True, fast_math=False,
                                         group=3)
    for i in range(b):
        one = cloth_pallas.multi_step(
            cloth.ClothState(pos=pos[i], vel=vel[i],
                             pin_mask=jnp.asarray(pin), pin_pos=pos[i]),
            params, dt, 30, interpret=True)
        np.testing.assert_allclose(np.asarray(got.pos[i]),
                                   np.asarray(one.pos), atol=1e-6, rtol=0)
    np.testing.assert_array_equal(
        np.asarray(got.pos)[:, :, 0, :], np.asarray(pos)[:, :, 0, :])


def test_batched_worlds_kernel_pins_and_dispatch():
    """4-dim states route through the batched path (size under the
    per-program budget — the lane-folded kernel) and batched pins hold
    their rows fixed. Per-world tolerance per the FMA-contraction note on
    test_lanes_kernel_bitwise_matches_per_world."""
    c = cfg.ClothConfig(height=10, width=16)
    base = init_cloth_state(c)
    b = 2
    pin = np.zeros((10, 16), bool)
    pin[0, :] = True
    pos = jnp.broadcast_to(base.pos, (b,) + base.pos.shape)
    pos = pos.at[1, 1].add(0.5)
    vel = jnp.zeros_like(pos)
    state = cloth.ClothState(
        pos=pos, vel=vel,
        pin_mask=jnp.broadcast_to(jnp.asarray(pin), (b, 10, 16)),
        pin_pos=pos)
    params = ClothParams.from_config(c)
    dt = jnp.float32(1 / 480)

    got = cloth_pallas.multi_step(state, params, dt, 30, interpret=True)
    for i in range(b):
        one = cloth_pallas.multi_step(
            cloth.ClothState(pos=pos[i], vel=vel[i],
                             pin_mask=jnp.asarray(pin), pin_pos=pos[i]),
            params, dt, 30, interpret=True)
        np.testing.assert_allclose(np.asarray(got.pos[i]),
                                   np.asarray(one.pos), atol=1e-6, rtol=0)
    np.testing.assert_array_equal(
        np.asarray(got.pos)[:, :, 0, :], np.asarray(pos)[:, :, 0, :])
