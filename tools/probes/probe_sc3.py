"""Probe: SC 256^2 small-block sweep + K=32.

probe_mxu/probe_sc2 bracketed SC from ABOVE (b512/s1280 = 2.92e7,
slower; mxu no help or fidelity-broken) — but never from BELOW.
Granular round-2 lesson: smaller blocks = proportionally tighter slabs
beat fewer-DMA big blocks by ~40% (b128/s384 >> b256/s768) because the
dense [B,S] pair math shrinks quadratically-ish while DMA count only
doubles. SC sits at b256/s640 thin = 1.47 ms contact kernel, which is
~the VPU floor for 3x[256,640] masked pair math — tighter slabs are the
only remaining lever short of a two-level rebuild. Also: probe_fid32
showed K=32 (non-mxu) deviates no worse than K=16 (0.1628 vs 0.1620),
so the rebuild amortization can halve for free if drops stay 0.
"""
import sys
import time
import jax, jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.models import cloth
from wgpu_physics_engine_tpu.core import config as ccfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state

H = W = 256
c = ccfg.ClothConfig(height=H, width=W)
params = ClothParams.from_config(c)
cstate = init_cloth_state(c)
spec = cloth.default_self_collision_grid(c, skin=0.5 * c.particle_radius)
DTC = jnp.float32(1 / 480)


def time_sc(tag, n_steps=512, **kw):
    def run(s):
        return cloth.multi_step_self_collide(s, params, DTC, n_steps, spec,
                                             **kw)
    try:
        np.asarray(run(cstate).pos)
    except Exception as e:
        print(f"{tag:42s} FAILED: {str(e)[:120]}", flush=True)
        return
    best = float("inf")
    for t in range(3):
        st = cstate._replace(pos=cstate.pos + jnp.float32(t * 1e-3))
        t0 = time.time()
        np.asarray(run(st).pos)
        best = min(best, time.time() - t0)
    print(f"{tag:42s} {best/n_steps*1e3:7.3f} ms/substep  rate {H*W*n_steps/best:.3e}",
          flush=True)


def drops_sc(tag, **kw):
    _, d = cloth.multi_step_self_collide(cstate, params, DTC, 512, spec,
                                         return_stats=True, **kw)
    print(f"{tag:42s} dropped={int(d)}", flush=True)


time_sc("sc base K16 b256 s640", rebuild_every=16, pallas_slab=640)
time_sc("sc K16 b128 s384", rebuild_every=16, pallas_block=128,
        pallas_slab=384)
time_sc("sc K16 b128 s512", rebuild_every=16, pallas_block=128,
        pallas_slab=512)
time_sc("sc K16 b256 s512", rebuild_every=16, pallas_slab=512)
time_sc("sc K32 b256 s640", rebuild_every=32, pallas_slab=640)
drops_sc("sc b128 s384 drops", rebuild_every=16, pallas_block=128,
         pallas_slab=384)
drops_sc("sc b128 s512 drops", rebuild_every=16, pallas_block=128,
         pallas_slab=512)
drops_sc("sc b256 s512 drops", rebuild_every=16, pallas_slab=512)
drops_sc("sc K32 s640 drops", rebuild_every=32, pallas_slab=640)
print("done", flush=True)
