"""SC fidelity at K=32 (+mxu): maxdev vs the exact per-substep-rebuild
path over 512 substeps at 256^2, same protocol as the K=8/K=16 round-3
probe (both measured maxdev ~0.16 — chaotic contact saturation)."""
import jax, jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state
from wgpu_physics_engine_tpu.models import cloth

H = W = 256
c = cfg.ClothConfig(height=H, width=W)
params = ClothParams.from_config(c)
state = init_cloth_state(c)
spec = cloth.default_self_collision_grid(c, skin=0.5 * c.particle_radius)
dt = jnp.float32(1 / 480)

exact = cloth.multi_step_self_collide(state, params, dt, 512, spec)
pe = np.asarray(exact.pos)
print("exact done", flush=True)

for tag, kw in (("K=16", dict(rebuild_every=16, pallas_slab=640)),
                ("K=32", dict(rebuild_every=32, pallas_slab=640))):
    out = cloth.multi_step_self_collide(state, params, dt, 512, spec, **kw)
    p = np.asarray(out.pos)
    d = np.abs(p - pe)
    print(f"{tag}: maxdev={d.max():.3e} meandev={d.mean():.3e}", flush=True)
print("done", flush=True)
