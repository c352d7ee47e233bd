"""Granular system identification — recovering the contact stiffness,
gravity, and wall restitution of a granular material from observed
particle trajectories.

The reference's instanced-particle sim hardcodes these constants in WGSL
(/root/reference/simulations/4_instances_imgui/compute_movement.wgsl);
here they are traced scalars of ``granular.multi_step_diff`` — the
differentiable twin of the production slab-DMA contact kernel — so
``jax.grad`` of a trajectory-matching loss flows through the frozen
broad-phase schedule, the Pallas contact kernel (via its slab-DMA JVP
transpose), and the wall-bounce branches, and Adam fits all three
parameters jointly from pixels-free state observations.

Identifiability needs the physics to actually exercise each parameter
inside the horizon: the initial state is hot (large velocities) so wall
bounces fire (restitution signal) while the pile stays in contact
(stiffness signal); gravity is observable from any free flight.

Run (CPU, interpret-mode kernel — small N keeps it quick):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/inverse_granular.py
On a TPU the same code runs the real kernel.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import optax

from wgpu_physics_engine_tpu.core.state import ParticleState
from wgpu_physics_engine_tpu.models import granular

DT = jnp.float32(1.0 / 240.0)


def make_problem(n=400, n_steps=8, key=jax.random.PRNGKey(11)):
    config = granular.GranularConfig(
        num_particles=n, bounds=1.0, radius=0.05, rebuild_every=4,
        pallas_block=128, pallas_slab=256, grid_capacity=16)
    state = granular.init_state(config, key)
    state = granular.multi_step(state, config, DT, 60)  # settle contacts
    # hot start: wall bounces inside the horizon carry the restitution
    # signal (a settled pile never touches a wall in n_steps substeps)
    state = ParticleState(pos=state.pos, vel=state.vel * 8.0)
    true = dict(k_contact=jnp.float32(config.k_contact),
                gravity=jnp.float32(config.gravity),
                restitution=jnp.float32(config.restitution))
    target = granular.multi_step_diff(state, config, DT, n_steps, **true)
    return config, state, target, true, n_steps


def fit(config, state, target, true, n_steps, n_iters=150, verbose=True):
    """Joint Adam fit of (log k_contact, gravity, restitution)."""

    def loss(theta):
        # Adam's step length is ~lr in PARAMETER space, so each coordinate
        # is scaled to make its plausible range order-1: log-stiffness,
        # gravity in decades, restitution raw
        log_k, grav, e = theta[0], 10.0 * theta[1], theta[2]
        out = granular.multi_step_diff(
            state, config, DT, n_steps, k_contact=jnp.exp(log_k),
            gravity=grav, restitution=e)
        # velocity term carries the gravity signal (dv = g*t exactly in
        # free flight); pos alone leaves g under-determined at this horizon
        return (1e2 * jnp.mean((out.pos - target.pos) ** 2)
                + 1e0 * jnp.mean((out.vel - target.vel) ** 2))

    theta = jnp.array([jnp.log(0.5 * true["k_contact"]),   # 2x off
                       0.05 * true["gravity"],             # 2x off
                       jnp.float32(0.9)], jnp.float32)     # true 0.5
    opt = optax.adam(optax.exponential_decay(0.1, 40, 0.7))
    opt_state = opt.init(theta)

    @jax.jit
    def step(theta, opt_state):
        l, g = jax.value_and_grad(loss)(theta)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(theta, upd), opt_state, l

    for i in range(n_iters):
        theta, opt_state, l = step(theta, opt_state)
        if verbose and i % 10 == 0:
            k, grav, e = jnp.exp(theta[0]), 10.0 * theta[1], theta[2]
            print(f"  iter {i:3d}: loss {float(l):.3e}  "
                  f"k {float(k):8.1f}  g {float(grav):7.3f}  "
                  f"e {float(e):.3f}")
    return dict(k_contact=jnp.exp(theta[0]), gravity=10.0 * theta[1],
                restitution=theta[2])


def main(n_iters=150):
    config, state, target, true, n_steps = make_problem()
    fitted = fit(config, state, target, true, n_steps, n_iters=n_iters)
    print("  recovered vs true:")
    for name in ("k_contact", "gravity", "restitution"):
        f, t = float(fitted[name]), float(true[name])
        print(f"    {name:12s} {f:9.3f}  (true {t:9.3f}, "
              f"rel err {abs(f - t) / max(abs(t), 1e-9):.2%})")
    return fitted, true


if __name__ == "__main__":
    main()
