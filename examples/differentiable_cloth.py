"""Differentiable simulation — a capability the reference cannot express.

Because the whole step is a pure jitted function, ``jax.grad`` flows through
the simulator (springs, damping, contact, friction, projection). Here we
recover the gravity that makes the cloth's center of mass hit a target
height after one simulated second — a tiny inverse problem solved by
gradient descent THROUGH 480 physics substeps.

Run:  python examples/differentiable_cloth.py [--kernel]

``--kernel`` routes the rollout through ``cloth.multi_step_diff`` — the
forward AND backward passes then run as fused Pallas kernels
(ops/cloth_pallas_grad.py), the fast path on TPU; the default uses the
XLA stencil with per-substep rematerialization (fast enough on CPU).
"""

import os
import sys

# allow running straight from a source checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

import wgpu_physics_engine_tpu as eng
from wgpu_physics_engine_tpu.models import cloth


def main(use_kernel: bool = False):
    c = eng.ClothConfig(height=16, width=16)
    state0 = eng.init_cloth_state(c)        # flat sheet at y = 40
    base = eng.ClothParams.from_config(c)
    dt = jnp.float32(1.0 / 480.0)
    target_y = jnp.float32(30.0)            # want COM at 30 after 1 s
    # analytic answer for pure free fall: g = -2 * 10 / 1² = -20

    def rollout(gravity):
        params = base._replace(gravity=gravity)
        if use_kernel:
            # fused-kernel forward + transpose-kernel backward
            s = cloth.multi_step_diff(state0, params, dt, 480, segment=48)
        else:
            # rematerialize each substep: 480-step rollout backprops in
            # O(sqrt(T)) memory
            step = jax.checkpoint(lambda s: cloth.substep(s, params, dt))
            s, _ = jax.lax.scan(lambda s, _: (step(s), None), state0, None,
                                length=480)
        return jnp.mean(s.pos[1])

    def loss(gravity):
        return (rollout(gravity) - target_y) ** 2

    grad_fn = jax.jit(jax.value_and_grad(loss))
    g = jnp.float32(-9.81)
    for i in range(8):
        l, dg = grad_fn(g)
        g = g - 0.5 * dg
        print(f"iter {i}: loss {float(l):9.5f}  gravity {float(g):8.4f}  "
              f"(analytic -20)")


if __name__ == "__main__":
    main(use_kernel="--kernel" in sys.argv[1:])
