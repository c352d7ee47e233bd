"""Examples must keep working (they are user-facing documentation)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_multichip_datagen_example(tmp_path):
    import multichip_datagen

    multichip_datagen.main(n_worlds=4, n_frames=1, fb=16,
                           outdir=str(tmp_path))
    files = os.listdir(tmp_path)
    assert any(f.endswith(".npy") for f in files)


def test_differentiable_example_one_step():
    import differentiable_cloth as dc
    import wgpu_physics_engine_tpu as eng
    from wgpu_physics_engine_tpu.models import cloth

    # one gradient evaluation of the example's rollout objective
    c = eng.ClothConfig(height=8, width=8)
    state0 = eng.init_cloth_state(c)
    pin = np.zeros((8, 8), bool)
    pin[0, :] = True
    state0 = state0._replace(pin_mask=jnp.asarray(pin), pin_pos=state0.pos)
    base = eng.ClothParams.from_config(c)
    dt = jnp.float32(1 / 480)

    def loss(k):
        params = base._replace(k_struct=k)
        step = jax.checkpoint(lambda s: cloth.substep(s, params, dt))
        s, _ = jax.lax.scan(lambda s, _: (step(s), None), state0, None,
                            length=24)
        return jnp.mean(s.pos[1])

    v, g = jax.value_and_grad(loss)(jnp.float32(450.0))
    assert np.isfinite(float(v)) and np.isfinite(float(g))


def test_inverse_rendering_light_stage_reduced():
    """Stage 1 of examples/inverse_rendering.py, few iterations: the
    pixel-MSE gradient must strictly improve the light direction."""
    import inverse_rendering as ir

    err = ir.recover_light(n_iters=6)
    assert err < 20.0  # starts 45 deg off; backtracking GD gets close fast


def test_inverse_granular_gradient_brackets_truth():
    """examples/inverse_granular.py objective: per-coordinate, the loss
    gradient on both sides of the true (k_contact, gravity, restitution)
    points back at the truth, and the loss at truth is ~0 (full
    convergence is the example's job)."""
    import inverse_granular as ig

    config, state, target, true, n_steps = ig.make_problem()
    truth = jnp.array([jnp.log(true["k_contact"]),
                       0.1 * true["gravity"],
                       true["restitution"]], jnp.float32)

    def loss(theta):
        log_k, grav, e = theta[0], 10.0 * theta[1], theta[2]
        from wgpu_physics_engine_tpu.models import granular
        out = granular.multi_step_diff(
            state, config, ig.DT, n_steps, k_contact=jnp.exp(log_k),
            gravity=grav, restitution=e)
        return (1e2 * jnp.mean((out.pos - target.pos) ** 2)
                + jnp.mean((out.vel - target.vel) ** 2))

    vg = jax.jit(jax.value_and_grad(loss))
    l_at, _ = vg(truth)
    assert float(l_at) < 1e-9
    for i in range(3):
        d = jnp.zeros(3).at[i].set(0.05)
        _, g_lo = vg(truth - d)
        _, g_hi = vg(truth + d)
        assert float(g_lo[i]) < 0 < float(g_hi[i]), i


def test_multichip_training_gradient_brackets_truth():
    """examples/multichip_training.py machinery on the 8-device mesh: the
    DP+SP sharded rollout loss has its minimum at the true stiffness —
    gradients from both sides point at it (full convergence is the
    example's job; the sign structure is the deterministic invariant)."""
    import multichip_training as mt

    m, c, params, state = mt.make_problem()
    target = mt.rollout(state, params, m)

    def loss(log_k):
        p = params._replace(k_struct=jnp.exp(log_k))
        out = mt.rollout(state, p, m)
        return 1e3 * jnp.mean((out.pos - target.pos) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    l_lo, g_lo = vg(jnp.log(jnp.float32(430.0)))
    l_at, g_at = vg(jnp.log(params.k_struct))
    l_hi, g_hi = vg(jnp.log(jnp.float32(470.0)))
    assert float(g_lo) < 0 < float(g_hi)
    assert float(l_at) < 1e-8 and abs(float(g_at)) < 1e-4
    assert float(l_lo) > 1e-4 and float(l_hi) > 1e-4
