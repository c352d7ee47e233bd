"""Differentiable self-collision (cloth.multi_step_self_collide_diff).

Gradient oracle: a dense XLA mirror with IDENTICAL semantics — the same
thin-CIV candidacy (cid-difference intervals over the frozen sorted
structure) and the library's own ``spring_forces``/``integrate`` — so
``jax.grad`` of the mirror isolates the kernel-side machinery: the
slab-DMA JVP transpose (``Jᵀf̄``), the Euler-identity ``particle_radius``
cotangent, the ``k_contact`` linearity cotangent, and the permutation /
padding transposes. Same piecewise-differentiability contract as
tests/test_cloth_grad.py and tests/test_granular_grad.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state
from wgpu_physics_engine_tpu.models import broadphase, cloth
from wgpu_physics_engine_tpu.ops import granular_pallas as gp

DT = jnp.float32(1.0 / 480.0)
N_STEPS = 6   # rebuild_every=4 -> one full segment + a remainder segment
REBUILD = 4
BLOCK, SLAB = 128, 384


@pytest.fixture(scope="module")
def setup():
    c = cfg.ClothConfig(height=12, width=12, cloth_size=2.0,
                        center=(0.0, 40.0, 0.0), particle_radius=0.12)
    params = ClothParams.from_config(c)
    # drop onto the globe so self-contacts actually form
    state = cloth.multi_step(init_cloth_state(c), params, DT, 40)
    grid = dataclasses.replace(
        cloth.default_self_collision_grid(c, skin=2 * c.particle_radius),
        capacity=32)
    _, dropped = cloth.multi_step_self_collide(
        state, params, DT, N_STEPS, grid, rebuild_every=REBUILD,
        pallas_block=BLOCK, pallas_slab=SLAB, return_stats=True)
    assert int(dropped) == 0  # gradient contract precondition
    wp = jax.random.normal(jax.random.PRNGKey(3), state.pos.shape)
    wv = jax.random.normal(jax.random.PRNGKey(4), state.vel.shape)
    return state, params, grid, wp, wv


def _dense_multi(pos, vel, params, dt, n_steps, grid_spec):
    """Dense XLA mirror: same thin-CIV candidacy, frozen schedule, and
    the library's own spring/integrate ops."""
    h, w = pos.shape[-2:]
    n = h * w
    civ = gp.civ_bounds(grid_spec, thin=True)
    md = 2.0 * params.particle_radius
    kc = params.k_contact
    eps = jnp.float32(1e-6)  # granular_pallas._EPS
    n_pad = -(-max(n, SLAB) // BLOCK) * BLOCK

    def segment(pos, vel, length):
        frozen = jax.lax.stop_gradient(pos.reshape(3, n))
        origin = jnp.min(frozen, axis=1) - grid_spec.cell_size
        grid = broadphase.build_sorted_grid(
            frozen, jnp.zeros_like(frozen), grid_spec, origin)
        cidf, _, _ = gp.build_offsets_civ(grid, grid_spec, BLOCK, SLAB,
                                          n_pad, thin=True)
        cidf = jax.lax.stop_gradient(cidf[:n])
        order = grid.order
        inv_o = jnp.argsort(order, stable=True)
        dc = cidf[None, :] - cidf[:, None]
        valid = jnp.zeros(dc.shape, bool)
        for lo, hi in civ:
            valid |= (dc >= lo) & (dc <= hi)
        valid &= ~jnp.eye(n, dtype=bool)

        def sub(c, _):
            pg, vg = c
            p = pg.reshape(3, n)[:, order].T
            d = p[:, None, :] - p[None, :, :]
            d2 = jnp.sum(d * d, axis=-1)
            touching = valid & (d2 < md * md) & (d2 > eps * eps)
            invd = jax.lax.rsqrt(jnp.where(d2 > eps * eps, d2, 1.0))
            wgt = jnp.where(touching, kc * (md * invd - 1.0), 0.0)
            f = jnp.sum(wgt[:, :, None] * d, axis=1)
            f_self = f.T[:, inv_o].reshape(3, h, w)
            force = cloth.spring_forces(pg, vg, params) + f_self
            return cloth.integrate(pg, vg, force, params, dt), None

        (pos, vel), _ = jax.lax.scan(sub, (pos, vel), None, length=length)
        return pos, vel

    full, rem = divmod(n_steps, REBUILD)
    for _ in range(full):
        pos, vel = segment(pos, vel, REBUILD)
    if rem:
        pos, vel = segment(pos, vel, rem)
    return pos, vel


def test_primal_matches_production(setup):
    state, params, grid, _, _ = setup
    prod = cloth.multi_step_self_collide(
        state, params, DT, N_STEPS, grid, rebuild_every=REBUILD,
        pallas_block=BLOCK, pallas_slab=SLAB, use_spring_kernel=False)
    diff = cloth.multi_step_self_collide_diff(
        state, params, DT, N_STEPS, grid, rebuild_every=REBUILD,
        pallas_block=BLOCK, pallas_slab=SLAB)
    # identical kernel + identical XLA spring/integrate ops
    np.testing.assert_allclose(np.asarray(diff.pos), np.asarray(prod.pos),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(diff.vel), np.asarray(prod.vel),
                               atol=1e-6)


def test_grad_matches_dense_mirror(setup):
    """Gradients w.r.t. state, dt, and the two parameters that flow
    THROUGH the contact kernel (k_contact by linearity, particle_radius
    by the Euler homogeneity identity) against the dense mirror."""
    state, params, grid, wp, wv = setup
    kc0 = params.k_contact
    pr0 = params.particle_radius

    def loss_diff(pos, vel, dt, kc, pr):
        p = params._replace(k_contact=kc, particle_radius=pr)
        out = cloth.multi_step_self_collide_diff(
            state._replace(pos=pos, vel=vel), p, dt, N_STEPS, grid,
            rebuild_every=REBUILD, pallas_block=BLOCK, pallas_slab=SLAB)
        return jnp.sum(out.pos * wp) + jnp.sum(out.vel * wv)

    def loss_dense(pos, vel, dt, kc, pr):
        p = params._replace(k_contact=kc, particle_radius=pr)
        po, ve = _dense_multi(pos, vel, p, dt, N_STEPS, grid)
        return jnp.sum(po * wp) + jnp.sum(ve * wv)

    argnums = (0, 1, 2, 3, 4)
    g1 = jax.jit(jax.grad(loss_diff, argnums=argnums))(
        state.pos, state.vel, DT, kc0, pr0)
    g2 = jax.jit(jax.grad(loss_dense, argnums=argnums))(
        state.pos, state.vel, DT, kc0, pr0)
    for name, a, b in zip(("pos", "vel", "dt", "k_contact", "radius"),
                          g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-4, name
        assert np.abs(a).max() > 0.0, name  # gradients actually flow


def test_grads_finite_with_pins(setup):
    state, params, grid, wp, wv = setup
    mask = np.zeros(state.pos.shape[-2:], bool)
    mask[0, :3] = True
    pinned = state._replace(pin_mask=jnp.asarray(mask), pin_pos=state.pos)

    def loss(pos, vel, pin_pos):
        s = pinned._replace(pos=pos, vel=vel, pin_pos=pin_pos)
        out = cloth.multi_step_self_collide_diff(
            s, params, DT, N_STEPS, grid, rebuild_every=REBUILD,
            pallas_block=BLOCK, pallas_slab=SLAB)
        return jnp.sum(out.pos * wp) + jnp.sum(out.vel * wv)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
        pinned.pos, pinned.vel, pinned.pin_pos)
    for a in g:
        assert np.isfinite(np.asarray(a)).all()
    # pinned particles' pos gradient is exactly zero (overwritten), and
    # the pin-target gradient is nonzero (it IS the output there)
    assert np.abs(np.asarray(g[2])).max() > 0.0


def test_all_params_differentiable(setup):
    """jax.grad w.r.t. the full ClothParams pytree stays finite and the
    spring stiffness gradient flows (the system-ID use)."""
    state, params, grid, wp, wv = setup

    def loss(p):
        out = cloth.multi_step_self_collide_diff(
            state, p, DT, N_STEPS, grid, rebuild_every=REBUILD,
            pallas_block=BLOCK, pallas_slab=SLAB)
        return jnp.sum(out.pos * wp) + jnp.sum(out.vel * wv)

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert float(jnp.abs(g.k_struct)) > 0.0
    assert float(jnp.abs(g.k_contact)) > 0.0
    assert float(jnp.abs(g.particle_radius)) > 0.0
