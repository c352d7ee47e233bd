"""Tiled (banded, halo-widened) fused kernel vs the XLA stencil path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state
from wgpu_physics_engine_tpu.models import cloth
from wgpu_physics_engine_tpu.ops import cloth_pallas, cloth_pallas_tiled


@pytest.mark.parametrize("hw,k_sub", [((64, 32), 4), ((128, 16), 8)])
def test_tiled_matches_xla(hw, k_sub):
    h, w = hw
    c = cfg.ClothConfig(height=h, width=w)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    state = state._replace(
        vel=0.5 * jax.random.normal(jax.random.key(0), state.vel.shape,
                                    jnp.float32))
    dt = jnp.float32(1 / 480)
    n = 2 * k_sub
    ref = cloth.multi_step(state, params, dt, n)
    got = cloth_pallas_tiled.multi_step(state, params, dt, n, k_sub=k_sub,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(ref.vel),
                               atol=1e-4)


def test_tiled_boundary_semantics_through_impact():
    """Short-fall scene through sphere impact: band boundaries must not
    perturb the contact physics."""
    c = cfg.ClothConfig(height=64, width=16, center=(0.0, 12.0, 0.0),
                        cloth_size=8.0)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    dt = jnp.float32(1 / 480)
    ref = cloth.multi_step(state, params, dt, 320)
    got = cloth_pallas_tiled.multi_step(state, params, dt, 320, k_sub=4,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               atol=1e-4, rtol=1e-4)


def test_dispatcher_uses_tiled_beyond_limit():
    """multi_step auto-routes oversized grids through the tiled kernel."""
    c = cfg.ClothConfig(height=512, width=16)   # 8192 pts — force via limit
    import wgpu_physics_engine_tpu.ops.cloth_pallas as CP

    old = CP._VMEM_PARTICLE_LIMIT
    CP._VMEM_PARTICLE_LIMIT = 1000
    try:
        params = ClothParams.from_config(c)
        state = init_cloth_state(c)
        out = CP.multi_step(state, params, jnp.float32(1 / 480), 8,
                            interpret=True)
        ref = cloth.multi_step(state, params, jnp.float32(1 / 480), 8)
        np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                                   atol=1e-5)
    finally:
        CP._VMEM_PARTICLE_LIMIT = old


def test_tiled_pins():
    c = cfg.ClothConfig(height=64, width=16)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    pin = np.zeros((64, 16), bool)
    pin[0, :] = pin[33, 7] = True       # pins in different bands
    state = state._replace(pin_mask=jnp.asarray(pin), pin_pos=state.pos)
    dt = jnp.float32(1 / 480)
    ref = cloth.multi_step(state, params, dt, 16)
    got = cloth_pallas_tiled.multi_step(state, params, dt, 16, k_sub=4,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(got.pos)[:, 0, :], np.asarray(state.pos)[:, 0, :])
