"""Probe: multi-block (rpb) wide-slab kernel mode on the two headline
broad-phase workloads. probe_sc4 decomposed the SC contact kernel into
~0.99 ms fixed per-block cost vs ~0.39 ms math at b256/s640 thin — rpb
divides the fixed part by sharing one wide A/B slab DMA per group across
rpb consecutive blocks. Expect SC substep 1.63 -> ~1.0 ms (rpb=4) if the
fixed cost is truly per-program; granular 1M similarly (27 ms/step wall
was ~4.5-6.9 us/block fixed-heavy).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core import config as ccfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state
from wgpu_physics_engine_tpu.models import cloth, granular

H = W = 256
c = ccfg.ClothConfig(height=H, width=W)
params = ClothParams.from_config(c)
cstate = init_cloth_state(c)
spec = cloth.default_self_collision_grid(c, skin=0.5 * c.particle_radius)
DTC = jnp.float32(1 / 480)


def time_sc(tag, n_steps=512, **kw):
    def run(s):
        return cloth.multi_step_self_collide(s, params, DTC, n_steps, spec,
                                             rebuild_every=32,
                                             pallas_slab=640, **kw)
    try:
        np.asarray(run(cstate).pos)
    except Exception as e:
        print(f"{tag:42s} FAILED: {str(e)[:200]}", flush=True)
        return
    best = float("inf")
    for t in range(3):
        st = cstate._replace(pos=cstate.pos + jnp.float32(t * 1e-3))
        t0 = time.time()
        np.asarray(run(st).pos)
        best = min(best, time.time() - t0)
    print(f"{tag:42s} {best/n_steps*1e3:7.3f} ms/substep  "
          f"rate {H*W*n_steps/best:.3e}", flush=True)


def drops_sc(tag, **kw):
    _, d = cloth.multi_step_self_collide(cstate, params, DTC, 512, spec,
                                         rebuild_every=32, pallas_slab=640,
                                         return_stats=True, **kw)
    print(f"{tag:42s} dropped={int(d)}", flush=True)


time_sc("sc K32 s640 rpb=1 (base)")
time_sc("sc K32 s640 rpb=2", rpb=2)
time_sc("sc K32 s640 rpb=4", rpb=4)
time_sc("sc K32 s640 rpb=8", rpb=8)
drops_sc("sc rpb=4 drops", rpb=4)
drops_sc("sc rpb=8 drops", rpb=8)


def time_g(tag, n_steps=64, **kw):
    cfg = granular.GranularConfig(num_particles=1_000_000,
                                  rebuild_every=16, pallas_slab=640,
                                  thin=True, **kw)
    state = granular.init_state(cfg, jax.random.PRNGKey(0))
    dt = jnp.float32(1 / 240)
    try:
        np.asarray(granular.multi_step(state, cfg, dt, n_steps).pos[:1, :1])
    except Exception as e:
        print(f"{tag:42s} FAILED: {str(e)[:200]}", flush=True)
        return
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(granular.multi_step(state, cfg, dt,
                                       n_steps).pos[:1, :1])
        best = min(best, time.time() - t0)
    print(f"{tag:42s} {best/n_steps*1e3:7.2f} ms/step  "
          f"rate {1e6*n_steps/best:.3e}", flush=True)


def drops_g(tag, **kw):
    cfg = granular.GranularConfig(num_particles=1_000_000,
                                  rebuild_every=16, pallas_slab=640,
                                  thin=True, **kw)
    state = granular.init_state(cfg, jax.random.PRNGKey(0))
    dt = jnp.float32(1 / 240)
    _, d = granular.multi_step(state, cfg, dt, 64, return_stats=True)
    print(f"{tag:42s} dropped={int(d)}", flush=True)


time_g("g thin K16 s640 rpb=1 (base)")
time_g("g thin K16 s640 rpb=4", rpb=4)
time_g("g thin K16 s640 rpb=8", rpb=8)
drops_g("g rpb=4 drops", rpb=4)
drops_g("g rpb=8 drops", rpb=8)
print("done", flush=True)
