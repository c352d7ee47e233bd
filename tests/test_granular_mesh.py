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
