"""Measure how much of the headline cloth bench is tunnel readback.

bench._time_impl syncs with np.asarray(out.pos) — a full [3,256,256]
(786 KB) device->host transfer through the axon tunnel. If that transfer
costs tens of ms, the 30k-substep kernel number reads low. A/B three
sync styles on identical runs:
  full   np.asarray(out.pos)                  (the bench today)
  slice  np.asarray(out.pos[:1,:1,:1])        (eager device slice, 4 B)
  scalar np.asarray(jnp.sum of a tiny slice)  (jit-reduced, 4 B)
Also times the raw transfer of a resident [3,256,256] array.
"""
import time
import jax, jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state
from wgpu_physics_engine_tpu.ops import cloth_pallas

H = W = 256
SUBSTEPS = 30_000
c = cfg.ClothConfig(height=H, width=W)
params = ClothParams.from_config(c)
state = init_cloth_state(c)
dt = jnp.float32(1 / 480)

syncs = {
    "full": lambda out: np.asarray(out.pos),
    "slice": lambda out: np.asarray(out.pos[:1, :1, :1]),
}

out = cloth_pallas.multi_step(state, params, dt, SUBSTEPS)
np.asarray(out.pos)  # compile + settle

# raw transfer cost of a resident array
for _ in range(2):
    t0 = time.time()
    np.asarray(out.pos)
    print(f"resident full readback        {time.time()-t0:7.4f}s", flush=True)
    t0 = time.time()
    np.asarray(out.pos[:1, :1, :1])
    print(f"resident sliced readback      {time.time()-t0:7.4f}s", flush=True)

for rep in range(3):
    for name, s in syncs.items():
        st = state._replace(pos=state.pos + jnp.float32(rep * 1e-3))
        t0 = time.time()
        o = cloth_pallas.multi_step(st, params, dt, SUBSTEPS)
        s(o)
        el = time.time() - t0
        print(f"{name:6s} sync 30k substeps      {el:7.4f}s = "
              f"{H*W*SUBSTEPS/el:.3e} p-steps/s", flush=True)
print("done", flush=True)
