"""Probe: differentiable granular + self-collision paths on the real chip
(session-5 features; CPU-validated, TPU-unmeasured until the worker is
back).

Measures:
  1. granular multi_step_diff at N (default 1M, bench config K=16/s256):
     fwd-only production rate vs value_and_grad(pos, vel, dt, kc, grav, e)
     rate — the bwd re-runs each segment storing (state, force) in HBM
     ([K, n_pad, 3] x3 per live segment) and launches the JVP kernel per
     substep, so expect ~3-4x fwd cost; the probe confirms VMEM/HBM fit
     at scale (the one thing CPU interpret cannot check).
  2. cloth multi_step_self_collide_diff at HxW (default 256²):
     production frozen path (use_spring_kernel=False — the diff path's
     fwd twin) vs value_and_grad through _frozen_self_contact.

Usage: python probe_grad2.py [granular_N] [cloth_H]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core import config as ccfg
from wgpu_physics_engine_tpu.core.state import (ClothParams, ParticleState,
                                                init_cloth_state)
from wgpu_physics_engine_tpu.models import cloth, granular

GN = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
H = W = int(sys.argv[2]) if len(sys.argv) > 2 else 256


def timeit(tag, n_psteps, f, *args):
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.time() - t0)
    print(f"{tag:42s} {best*1e3:9.1f} ms  {n_psteps/best:.3e} p-steps/s",
          flush=True)
    return out


# ---- granular ----------------------------------------------------------
GSTEPS = 32
gcfg = granular.GranularConfig(num_particles=GN, rebuild_every=16,
                               pallas_slab=256)
gs = granular.init_state(gcfg, jax.random.PRNGKey(0))
gs = granular.multi_step(gs, gcfg, jnp.float32(1 / 240), 8)  # settle a bit
gwp = jax.random.normal(jax.random.PRNGKey(1), gs.pos.shape)
DT = jnp.float32(1 / 240)

timeit(f"granular fwd production {GN}", GN * GSTEPS,
       jax.jit(lambda s: granular.multi_step(s, gcfg, DT, GSTEPS)), gs)
timeit(f"granular fwd diff-path {GN}", GN * GSTEPS,
       jax.jit(lambda s: granular.multi_step_diff(s, gcfg, DT, GSTEPS)), gs)


def gloss(pos, vel, dt, kc, grav, e):
    out = granular.multi_step_diff(ParticleState(pos=pos, vel=vel), gcfg,
                                   dt, GSTEPS, k_contact=kc, gravity=grav,
                                   restitution=e)
    return jnp.sum(out.pos * gwp)


g = timeit(f"granular value_and_grad {GN}", GN * GSTEPS,
           jax.jit(jax.value_and_grad(gloss, argnums=(0, 1, 2, 3, 4, 5))),
           gs.pos, gs.vel, DT, jnp.float32(gcfg.k_contact),
           jnp.float32(gcfg.gravity), jnp.float32(gcfg.restitution))
print("  param grads:", [float(x) for x in g[1][2:]], flush=True)

# ---- cloth self-collision ----------------------------------------------
SSTEPS = 64
REBUILD = 16
c = ccfg.ClothConfig(height=H, width=W)
params = ClothParams.from_config(c)
cs = cloth.multi_step(init_cloth_state(c), params, jnp.float32(1 / 480),
                      1400)  # drape so self-contacts are live
grid = cloth.default_self_collision_grid(c, skin=2 * c.particle_radius)
cwp = jax.random.normal(jax.random.PRNGKey(2), cs.pos.shape)
CDT = jnp.float32(1 / 480)

timeit(f"SC fwd production xla-springs {H}x{W}", H * W * SSTEPS,
       jax.jit(lambda s: cloth.multi_step_self_collide(
           s, params, CDT, SSTEPS, grid, rebuild_every=REBUILD,
           use_spring_kernel=False)), cs)
timeit(f"SC fwd production fused {H}x{W}", H * W * SSTEPS,
       jax.jit(lambda s: cloth.multi_step_self_collide(
           s, params, CDT, SSTEPS, grid, rebuild_every=REBUILD)), cs)


def scloss(pos, vel, kc, pr):
    p = params._replace(k_contact=kc, particle_radius=pr)
    out = cloth.multi_step_self_collide_diff(
        cs._replace(pos=pos, vel=vel), p, CDT, SSTEPS, grid,
        rebuild_every=REBUILD)
    return jnp.sum(out.pos * cwp)


sg = timeit(f"SC value_and_grad {H}x{W}", H * W * SSTEPS,
            jax.jit(jax.value_and_grad(scloss, argnums=(0, 1, 2, 3))),
            cs.pos, cs.vel, params.k_contact, params.particle_radius)
print("  k_contact/radius grads:", float(sg[1][2]), float(sg[1][3]),
      flush=True)
print("done", flush=True)
