"""Distributed system identification — gradient-based parameter fitting
over a multi-chip mesh (the training-loop shape of the scaling playbook,
applied to physics).

A batch of worlds (data-parallel) of row-sharded cloths (spatial-parallel
with halo-exchange ppermutes) is rolled out under jit; ``jax.grad`` of the
trajectory-matching loss flows through the sharded stepper — shard_map's
transpose psums the parameter cotangents across the mesh, which IS the DP
gradient all-reduce — and Adam recovers the spring stiffness that produced
the observed trajectories.

Run (CPU demo with 8 virtual devices):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/multichip_training.py
On real hardware the same code runs over the chips jax.devices() reports.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import optax

import wgpu_physics_engine_tpu as eng
from wgpu_physics_engine_tpu.parallel import mesh as pmesh


def make_problem(n_devices=None, height=16, width=16, worlds_per_shard=2,
                 key=jax.random.PRNGKey(7)):
    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    rows = 2 if len(devices) % 2 == 0 else 1
    worlds = len(devices) // rows
    m = pmesh.make_mesh((worlds, rows), ("worlds", "rows"), devices)

    c = eng.ClothConfig(height=height, width=width)
    params = eng.ClothParams.from_config(c)
    base = eng.init_cloth_state(c)
    b = worlds_per_shard * worlds
    # per-world perturbations: stretched springs carry the stiffness signal
    noise = 0.3 * jax.random.normal(key, (b,) + base.pos.shape)
    state = eng.ClothState(pos=jnp.stack([base.pos] * b) + noise,
                           vel=jnp.zeros((b,) + base.vel.shape))

    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(m, P("worlds", None, "rows", None))
    state = state._replace(pos=jax.device_put(state.pos, sharding),
                           vel=jax.device_put(state.vel, sharding))
    return m, c, params, state


def rollout(state, params, m, n_steps=16):
    return pmesh.batched_spatial_multi_step(
        state, params, jnp.float32(1 / 480), n_steps, m,
        substeps_per_exchange=2, use_kernel=False)


def main(n_iters=60, n_devices=None):
    m, c, params, state = make_problem(n_devices)
    k_true = params.k_struct
    target = rollout(state, params, m)

    def loss(log_k):
        p = params._replace(k_struct=jnp.exp(log_k))
        out = rollout(state, p, m)
        return 1e3 * jnp.mean((out.pos - target.pos) ** 2)

    opt = optax.adam(optax.exponential_decay(0.05, 12, 0.7))
    log_k = jnp.log(0.5 * k_true)             # start 2x off
    opt_state = opt.init(log_k)

    @jax.jit
    def step(log_k, opt_state):
        l, g = jax.value_and_grad(loss)(log_k)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(log_k, upd), opt_state, l

    for i in range(n_iters):
        log_k, opt_state, l = step(log_k, opt_state)
        if i % 5 == 0:
            print(f"  iter {i:3d}: loss {float(l):.3e}  "
                  f"k_struct {float(jnp.exp(log_k)):9.2f} "
                  f"(true {float(k_true):.1f})")
    k = float(jnp.exp(log_k))
    print(f"  recovered k_struct {k:.2f} (true {float(k_true):.1f}, "
          f"started {0.5 * float(k_true):.1f})")
    return k, float(k_true)


if __name__ == "__main__":
    main()
