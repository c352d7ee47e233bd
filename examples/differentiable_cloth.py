"""Differentiable simulation — a capability the reference cannot express.

Because the whole step is a pure jitted function, ``jax.grad`` flows through
the simulator: here we optimize the structural stiffness so the cloth's
center of mass lands at a target height after 0.5 simulated seconds.

Run:  python examples/differentiable_cloth.py
"""

import jax
import jax.numpy as jnp

import wgpu_physics_engine_tpu as eng
from wgpu_physics_engine_tpu.models import cloth


def main():
    import numpy as np

    c = eng.ClothConfig(height=16, width=16)
    state0 = eng.init_cloth_state(c)
    pin = np.zeros((16, 16), bool)
    pin[0, :] = True     # hang from the top row so stiffness matters
    state0 = state0._replace(pin_mask=jnp.asarray(pin), pin_pos=state0.pos)
    base = eng.ClothParams.from_config(c)
    dt = jnp.float32(1.0 / 480.0)
    target_y = jnp.float32(35.0)

    # rematerialize each substep so a 240-step rollout backprops in O(sqrt)
    # memory
    def rollout(k_struct):
        params = base._replace(k_struct=k_struct)
        step = jax.checkpoint(lambda s: cloth.substep(s, params, dt))
        s, _ = jax.lax.scan(lambda s, _: (step(s), None), state0, None,
                            length=240)
        return jnp.mean(s.pos[1])

    def loss(k_struct):
        return (rollout(k_struct) - target_y) ** 2

    grad_fn = jax.jit(jax.value_and_grad(loss))
    k = jnp.float32(450.0)
    for i in range(10):
        l, g = grad_fn(k)
        k = k - 1e3 * g   # crude gradient descent
        print(f"iter {i}: loss {float(l):.5f} k_struct {float(k):.2f} "
              f"grad {float(g):.2e}")


if __name__ == "__main__":
    main()
