"""Multi-chip sharding tests on the 8-device virtual CPU mesh:
worlds-axis data parallelism and spatially-sharded halo-exchange cloth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.core.state import ClothParams, ClothState, init_cloth_state
from wgpu_physics_engine_tpu.models import cloth
from wgpu_physics_engine_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def devices8():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d[:8]


def test_worlds_sharding_matches_single(devices8):
    c = cfg.ClothConfig(height=16, width=16)
    params = ClothParams.from_config(c)
    base = init_cloth_state(c)
    m = pmesh.make_mesh((8,), ("worlds",), devices8)
    batched = ClothState(
        pos=jnp.stack([base.pos] * 8),
        vel=jnp.stack([base.vel] * 8),
    )
    batched = pmesh.shard_worlds(batched, m)
    out = pmesh.batched_multi_step(batched, params, jnp.float32(1 / 480), 50)
    ref = cloth.multi_step(base, params, jnp.float32(1 / 480), 50)
    for i in range(8):
        np.testing.assert_array_equal(np.asarray(out.pos[i]), np.asarray(ref.pos))


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_spatial_halo_matches_single(devices8, n_shards):
    """Row-sharded halo-exchange substep matches the single-device stencil
    to ulp-level (halo rows carry true neighbor data; bitwise equality is
    not guaranteed because XLA's CPU codegen picks different SIMD/remainder
    lanes for different shard shapes)."""
    c = cfg.ClothConfig(height=32, width=16)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    # seed some motion so spring forces are non-trivial
    key = jax.random.key(0)
    state = state._replace(vel=jax.random.normal(key, state.vel.shape, jnp.float32))

    m = pmesh.make_mesh((n_shards,), ("rows",), devices8[:n_shards])
    out = pmesh.spatial_multi_step(state, params, jnp.float32(1 / 480), 20, m)
    ref = state
    for _ in range(20):
        ref = cloth.substep(ref, params, jnp.float32(1 / 480))
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel), atol=1e-4)


def test_spatial_with_pins(devices8):
    c = cfg.ClothConfig(height=16, width=16)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    pin = np.zeros((16, 16), bool)
    pin[0, :] = True
    state = state._replace(pin_mask=jnp.asarray(pin), pin_pos=state.pos)

    m = pmesh.make_mesh((4,), ("rows",), devices8[:4])
    out = pmesh.spatial_multi_step(state, params, jnp.float32(1 / 480), 30, m)
    ref = state
    for _ in range(30):
        ref = cloth.substep(ref, params, jnp.float32(1 / 480))
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out.pos)[:, 0, :], np.asarray(state.pos)[:, 0, :]
    )


@pytest.mark.parametrize("k", [2, 4])
def test_halo_widening_matches_single(devices8, k):
    """K substeps per halo exchange (2K-row halos) ≡ K plain substeps."""
    c = cfg.ClothConfig(height=32, width=16)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    state = state._replace(
        vel=jax.random.normal(jax.random.key(1), state.vel.shape, jnp.float32))
    m = pmesh.make_mesh((4,), ("rows",), devices8[:4])
    out = pmesh.spatial_multi_step(state, params, jnp.float32(1 / 480), 20, m,
                                   substeps_per_exchange=k)
    ref = state
    for _ in range(20):
        ref = cloth.substep(ref, params, jnp.float32(1 / 480))
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel), atol=1e-4)


@pytest.mark.parametrize("k", [1, 4])
def test_spatial_kernel_matches_xla_path(devices8, k):
    """The fused Pallas window kernel under shard_map (interpret mode on
    CPU) ≡ the XLA shard body ≡ the single-device stencil (VERDICT round-1
    item #3: run the Pallas steppers under shard_map)."""
    c = cfg.ClothConfig(height=32, width=16)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    state = state._replace(
        vel=jax.random.normal(jax.random.key(2), state.vel.shape, jnp.float32))
    m = pmesh.make_mesh((4,), ("rows",), devices8[:4])
    dt = jnp.float32(1 / 480)
    out_k = pmesh.spatial_multi_step(state, params, dt, 20, m,
                                     substeps_per_exchange=k, use_kernel=True)
    out_x = pmesh.spatial_multi_step(state, params, dt, 20, m,
                                     substeps_per_exchange=k, use_kernel=False)
    np.testing.assert_allclose(np.asarray(out_k.pos), np.asarray(out_x.pos),
                               atol=1e-5)
    ref = state
    for _ in range(20):
        ref = cloth.substep(ref, params, dt)
    np.testing.assert_allclose(np.asarray(out_k.pos), np.asarray(ref.pos),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_k.vel), np.asarray(ref.vel),
                               atol=1e-4)


def test_spatial_kernel_with_pins_matches(devices8):
    c = cfg.ClothConfig(height=16, width=16)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    pin = np.zeros((16, 16), bool)
    pin[0, :] = True
    state = state._replace(pin_mask=jnp.asarray(pin), pin_pos=state.pos)
    m = pmesh.make_mesh((4,), ("rows",), devices8[:4])
    out = pmesh.spatial_multi_step(state, params, jnp.float32(1 / 480), 30, m,
                                   substeps_per_exchange=2, use_kernel=True)
    ref = state
    for _ in range(30):
        ref = cloth.substep(ref, params, jnp.float32(1 / 480))
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out.pos)[:, 0, :], np.asarray(state.pos)[:, 0, :])


@pytest.mark.parametrize("use_kernel,k", [(False, 1), (True, 2)])
def test_composed_worlds_rows_matches_single(devices8, use_kernel, k):
    """The composed worlds-DP × rows-SP path (exactly what the driver's
    dryrun exercises) ≡ per-world single-device stepping, with per-world
    pins, halo widening, and the fused Pallas window kernel (VERDICT-r2
    item #4: this path used to hardcode the XLA body + per-substep
    exchanges and never saw pins)."""
    c = cfg.ClothConfig(height=16, width=16)
    params = ClothParams.from_config(c)
    base = init_cloth_state(c)
    keys = jax.random.split(jax.random.key(3), 4)
    worlds = [base._replace(
        vel=0.5 * jax.random.normal(kk, base.vel.shape, jnp.float32))
        for kk in keys]
    pin = np.zeros((16, 16), bool)
    pin[0, :] = True
    pinm = jnp.asarray(pin)
    worlds = [w._replace(pin_mask=pinm, pin_pos=w.pos) for w in worlds]

    batched = ClothState(
        pos=jnp.stack([w.pos for w in worlds]),
        vel=jnp.stack([w.vel for w in worlds]),
        pin_mask=jnp.stack([pinm] * 4),
        pin_pos=jnp.stack([w.pin_pos for w in worlds]),
    )
    m = pmesh.make_mesh((2, 4), ("worlds", "rows"), devices8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(m, P("worlds", None, "rows", None))
    batched = ClothState(
        pos=jax.device_put(batched.pos, sh),
        vel=jax.device_put(batched.vel, sh),
        pin_mask=jax.device_put(batched.pin_mask,
                                NamedSharding(m, P("worlds", "rows", None))),
        pin_pos=jax.device_put(batched.pin_pos, sh),
    )
    dt = jnp.float32(1 / 480)
    out = pmesh.batched_spatial_multi_step(
        batched, params, dt, 8, m, substeps_per_exchange=k,
        use_kernel=use_kernel)
    for i, w in enumerate(worlds):
        ref = w
        for _ in range(8):
            ref = cloth.substep(ref, params, dt)
        np.testing.assert_allclose(np.asarray(out.pos[i]),
                                   np.asarray(ref.pos), atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(out.pos[i])[:, 0, :], np.asarray(w.pos)[:, 0, :])


def test_halo_widening_with_pins(devices8):
    c = cfg.ClothConfig(height=16, width=16)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    pin = np.zeros((16, 16), bool)
    pin[0, :] = True
    state = state._replace(pin_mask=jnp.asarray(pin), pin_pos=state.pos)
    m = pmesh.make_mesh((4,), ("rows",), devices8[:4])
    out = pmesh.spatial_multi_step(state, params, jnp.float32(1 / 480), 30, m,
                                   substeps_per_exchange=2)
    ref = state
    for _ in range(30):
        ref = cloth.substep(ref, params, jnp.float32(1 / 480))
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos), atol=1e-5)
