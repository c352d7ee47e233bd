"""Differentiable granular path (models.granular.multi_step_diff).

Gradient oracle: a dense XLA mirror with IDENTICAL semantics — the same
CIV candidacy rule (cid-difference intervals from
``granular_pallas.civ_bounds``, structure frozen per rebuild segment) and
the same integrate expressions (``granular._mirror_substep`` itself) —
so ``jax.grad`` of the mirror isolates the kernel-side machinery (the
slab-DMA JVP kernel's ``Jᵀf̄`` term, the segment-checkpointed scan, the
order/inverse-order permutation transposes) from modelling differences.
The contract mirrors tests/test_cloth_grad.py: branchy physics (contact
activation, wall bounces) differentiates piecewise, the discrete
broad-phase structure is locally constant, and slab drops must be zero.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wgpu_physics_engine_tpu.core.state import ParticleState
from wgpu_physics_engine_tpu.models import broadphase, granular
from wgpu_physics_engine_tpu.ops import granular_pallas as gp

N = 400
DT = jnp.float32(1.0 / 240.0)
N_STEPS = 6  # rebuild_every=4 -> one full segment + a remainder segment


def _config(**kw):
    base = dict(num_particles=N, bounds=1.0, radius=0.05, rebuild_every=4,
                pallas_block=128, pallas_slab=256, grid_capacity=16)
    base.update(kw)
    return granular.GranularConfig(**base)


CFG = _config()


@pytest.fixture(scope="module")
def setup():
    state = granular.init_state(CFG, jax.random.PRNGKey(0))
    # settle into active contacts + wall/ground bounces
    state = granular.multi_step(state, CFG, DT, 60)
    _, dropped = granular.multi_step(state, CFG, DT, N_STEPS,
                                     return_stats=True)
    assert int(dropped) == 0  # gradient contract precondition
    wp = jax.random.normal(jax.random.PRNGKey(3), state.pos.shape)
    wv = jax.random.normal(jax.random.PRNGKey(4), state.vel.shape)
    return state, wp, wv


def _dense_multi(pos, vel, dt, kc, grav, e, n_steps, config):
    """Dense XLA mirror: same CIV candidacy, schedule, and integrate."""
    spec = config.grid_spec()
    civ = gp.civ_bounds(spec, thin=config.thin)
    md = 2.0 * jnp.float32(config.radius)
    eps = jnp.float32(1e-6)  # granular_pallas._EPS
    n = pos.shape[-1]
    block = config.pallas_block
    n_pad = -(-max(n, config.pallas_slab) // block) * block

    def segment(pos, vel, length):
        grid = broadphase.build_sorted_grid(pos, vel, spec)
        order = grid.order
        cidf, _, _ = gp.build_offsets_civ(grid, spec, block,
                                          config.pallas_slab, n_pad,
                                          thin=config.thin)
        cidf = jax.lax.stop_gradient(cidf[:n])
        posc = pos[:, order].T
        velc = vel[:, order].T
        dc = cidf[None, :] - cidf[:, None]
        valid = jnp.zeros(dc.shape, bool)
        for lo, hi in civ:
            valid |= (dc >= lo) & (dc <= hi)
        valid &= ~jnp.eye(n, dtype=bool)
        alive = jnp.ones((n, 1), bool)

        def sub(c, _):
            p, v = c
            d = p[:, None, :] - p[None, :, :]
            d2 = jnp.sum(d * d, axis=-1)
            touching = valid & (d2 < md * md) & (d2 > eps * eps)
            inv = jax.lax.rsqrt(jnp.where(d2 > eps * eps, d2, 1.0))
            w = jnp.where(touching, kc * (md * inv - 1.0), 0.0)
            f = jnp.sum(w[:, :, None] * d, axis=1)
            return granular._mirror_substep(p, v, f, config, dt, grav,
                                            e, alive), None

        (posc, velc), _ = jax.lax.scan(sub, (posc, velc), None,
                                       length=length)
        inv_o = jnp.argsort(order, stable=True)
        return posc.T[:, inv_o], velc.T[:, inv_o]

    k = config.rebuild_every
    full, rem = divmod(n_steps, k)
    for _ in range(full):
        pos, vel = segment(pos, vel, k)
    if rem:
        pos, vel = segment(pos, vel, rem)
    return pos, vel


def test_primal_matches_production(setup):
    state, _, _ = setup
    prod = granular.multi_step(state, CFG, DT, N_STEPS)
    diff = granular.multi_step_diff(state, CFG, DT, N_STEPS)
    # only fp-order noise between the fused kernel integrate and the
    # XLA mirror integrate (identical expressions, different fusion)
    np.testing.assert_allclose(np.asarray(diff.pos), np.asarray(prod.pos),
                               atol=5e-7)
    np.testing.assert_allclose(np.asarray(diff.vel), np.asarray(prod.vel),
                               atol=5e-6)


@pytest.mark.parametrize("thin", [False, True])
def test_grad_matches_dense_mirror(setup, thin):
    """Gradients w.r.t. state, dt, AND the traced physics parameters
    (k_contact / gravity / restitution) against the dense mirror."""
    state, wp, wv = setup
    config = _config(thin=thin) if thin else CFG
    # hot state: wall bounces fire inside the horizon so the restitution
    # cotangent is nonzero (the settled state never hits a wall in 6 steps)
    state = ParticleState(pos=state.pos, vel=state.vel * 8.0)
    _, dropped = granular.multi_step(state, config, DT, N_STEPS,
                                     return_stats=True)
    assert int(dropped) == 0
    kc = jnp.float32(config.k_contact)
    grav = jnp.float32(config.gravity)
    e = jnp.float32(config.restitution)

    def loss_diff(pos, vel, dt, kc, grav, e):
        out = granular.multi_step_diff(ParticleState(pos=pos, vel=vel),
                                       config, dt, N_STEPS,
                                       k_contact=kc, gravity=grav,
                                       restitution=e)
        return jnp.sum(out.pos * wp) + jnp.sum(out.vel * wv)

    def loss_dense(pos, vel, dt, kc, grav, e):
        p, v = _dense_multi(pos, vel, dt, kc, grav, e, N_STEPS, config)
        return jnp.sum(p * wp) + jnp.sum(v * wv)

    argnums = (0, 1, 2, 3, 4, 5)
    g1 = jax.jit(jax.grad(loss_diff, argnums=argnums))(
        state.pos, state.vel, DT, kc, grav, e)
    g2 = jax.jit(jax.grad(loss_dense, argnums=argnums))(
        state.pos, state.vel, DT, kc, grav, e)
    for name, a, b in zip(("pos", "vel", "dt", "kc", "grav", "e"), g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-30)
        # 1e-4: slab-kernel vs dense-[N,N] reduction order in fp32 — the
        # hot state's larger magnitudes push dt's noise to ~3e-5
        assert np.abs(a - b).max() / scale < 1e-4, name
        assert np.abs(a).max() > 0.0, name  # gradients actually flow


def test_grads_finite_with_walls_active(setup):
    state, wp, wv = setup
    # drive particles hard into the walls: restitution branch fires
    hot = ParticleState(pos=state.pos, vel=state.vel * 8.0)

    def loss(pos, vel):
        out = granular.multi_step_diff(ParticleState(pos=pos, vel=vel),
                                       CFG, DT, N_STEPS)
        return jnp.sum(out.pos * wp) + jnp.sum(out.vel * wv)

    gp_, gv = jax.jit(jax.grad(loss, argnums=(0, 1)))(hot.pos, hot.vel)
    assert np.isfinite(np.asarray(gp_)).all()
    assert np.isfinite(np.asarray(gv)).all()


def test_rejects_unsupported_configs(setup):
    state, _, _ = setup
    with pytest.raises(ValueError, match="CIV"):
        granular.multi_step_diff(state, _config(civ=False), DT, 2)
