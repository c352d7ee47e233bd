"""Probe: differentiable cloth path on the real chip (round-3 feature).

Measures at 256² (flagship), exact mode:
  1. fwd-only fused kernel rate (reference point),
  2. value_and_grad through ops/cloth_pallas_grad (kernel fwd + trace +
     transpose kernels), segment sweep,
  3. value_and_grad through the XLA stencil + jax.checkpoint (the
     pre-round-3 differentiable path) — the speedup denominator.

Also the VMEM compile check for the transpose kernel at 256² (the one
thing CPU interpret mode cannot validate).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core import config as ccfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state
from wgpu_physics_engine_tpu.models import cloth

H = W = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SEGMENTS = [int(v) for v in sys.argv[2:]] or [32, 64, 96]
N_STEPS = 480
DT = jnp.float32(1 / 480)

c = ccfg.ClothConfig(height=H, width=W)
params = ClothParams.from_config(c)
state = init_cloth_state(c)
wp = jax.random.normal(jax.random.PRNGKey(1), state.pos.shape)


def timeit(tag, f, *args):
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.time() - t0)
    rate = H * W * N_STEPS / best
    print(f"{tag:38s} {best*1e3:8.1f} ms  {rate:.3e} p-steps/s", flush=True)
    return out


from wgpu_physics_engine_tpu.ops import cloth_pallas

timeit("fwd kernel 480", jax.jit(lambda s: cloth_pallas.multi_step(
    s, params, DT, N_STEPS)), state)

for seg in SEGMENTS:
    def loss(pos, vel, seg=seg):
        out = cloth.multi_step_diff(state._replace(pos=pos, vel=vel),
                                    params, DT, N_STEPS, segment=seg)
        return jnp.sum(out.pos * wp)
    g = timeit(f"grad kernel path seg={seg}", jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1))), state.pos, state.vel)

def loss_xla(pos, vel):
    step = jax.checkpoint(lambda s: cloth.substep(s, params, DT))
    s, _ = jax.lax.scan(lambda s, _: (step(s), None),
                        state._replace(pos=pos, vel=vel), None,
                        length=N_STEPS)
    return jnp.sum(s.pos * wp)

gx = timeit("grad XLA + checkpoint", jax.jit(
    jax.value_and_grad(loss_xla, argnums=(0, 1))), state.pos, state.vel)

# agreement spot-check (smooth regime: fresh flat cloth, short horizon)
d = max(float(jnp.max(jnp.abs(a - b))) /
        max(float(jnp.max(jnp.abs(b))), 1e-8)
        for a, b in zip(g[1], gx[1]))
print(f"grad rel-dev kernel vs XLA: {d:.2e} (branchy after impact — "
      "see tests/test_cloth_grad.py for the contract)", flush=True)
print("done", flush=True)
