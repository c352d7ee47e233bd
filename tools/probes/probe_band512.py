"""Probe: band-height sweep for the 512² banded transpose kernel under
the raised (100 MB) scoped-VMEM window, plus the ADVICE-r4 compile check
for a grid whose h is NOT a multiple of the chosen band (tail band has
unaligned slices — Mosaic may refuse; 150² routes to the banded path).

Usage: python tools/probes/probe_band512.py [size] [band ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core import config as ccfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state
from wgpu_physics_engine_tpu.ops import cloth_pallas_grad

H = W = int(sys.argv[1]) if len(sys.argv) > 1 else 512
BANDS = [int(v) for v in sys.argv[2:]] or [16, 32, 64]
N_STEPS = 480
DT = jnp.float32(1 / 480)

c = ccfg.ClothConfig(height=H, width=W)
params = ClothParams.from_config(c)
state = init_cloth_state(c)
wp = jax.random.normal(jax.random.PRNGKey(1), state.pos.shape)

for band in BANDS:
    def loss(pos, vel, band=band):
        out = cloth_pallas_grad.multi_step(
            state._replace(pos=pos, vel=vel), params, DT, N_STEPS,
            segment=64, band=band)
        return jnp.sum(out.pos * wp)

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    try:
        g = vg(state.pos, state.vel)
        np.asarray(g[1][0][:1, :1])
    except Exception as e:
        print(f"band={band:3d}  FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        continue
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        g = vg(state.pos, state.vel)
        np.asarray(g[1][0][:1, :1])
        best = min(best, time.time() - t0)
    print(f"band={band:3d}  {best*1e3:8.1f} ms  "
          f"{H*W*N_STEPS/best:.3e} p-steps/s", flush=True)

# --- non-multiple-of-band grid: compile + run a short horizon on-chip ---
c2 = ccfg.ClothConfig(height=150, width=150)
p2 = ClothParams.from_config(c2)
s2 = init_cloth_state(c2)
w2 = jax.random.normal(jax.random.PRNGKey(2), s2.pos.shape)


def loss2(pos, vel):
    out = cloth_pallas_grad.multi_step(s2._replace(pos=pos, vel=vel),
                                       p2, DT, 16, segment=16)
    return jnp.sum(out.pos * w2)


try:
    g2 = jax.jit(jax.value_and_grad(loss2, argnums=(0, 1)))(s2.pos, s2.vel)
    gnp = np.asarray(g2[1][0])
    print(f"150x150 tail-band grid: compiled+ran, grads finite="
          f"{np.isfinite(gnp).all()}", flush=True)
except Exception as e:
    print(f"150x150 tail-band grid FAILED: {type(e).__name__}: "
          f"{str(e)[:300]}", flush=True)
print("done", flush=True)
