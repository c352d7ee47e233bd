"""Probe: SC 256^2 with big blocks (chunked CIV pair math) + granular
thin slab width sweep.

The b512/s1280 SC configs OOMed scoped VMEM (17.67M > 16M) before the
column-chunked pair phase; with chunk=640 the dense temporaries halve.
Fewer blocks = fewer slab-DMA issues (the measured wall at b256).
Also: granular thin s640 (3.70e7) beat s512 (2.82e7) — wider slabs cut
B-pass firings — so try s768/s896.
"""
import sys
import time
import jax, jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.models import granular, cloth
from wgpu_physics_engine_tpu.core import config as ccfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state

SECTION = sys.argv[1] if len(sys.argv) > 1 else "all"

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
    np.asarray(run(cstate).pos)
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


if SECTION in ("sc", "all"):
    time_sc("sc base K16 b256 s640", rebuild_every=16, pallas_slab=640)
    time_sc("sc K16 b512 s1280", rebuild_every=16, pallas_block=512,
            pallas_slab=1280)
    time_sc("sc K16 b384 s960", rebuild_every=16, pallas_block=384,
            pallas_slab=960)
    time_sc("sc K16 b512 s1536", rebuild_every=16, pallas_block=512,
            pallas_slab=1536)
    drops_sc("sc b512 s1280 drops", rebuild_every=16, pallas_block=512,
             pallas_slab=1280)
    drops_sc("sc b384 s960 drops", rebuild_every=16, pallas_block=384,
             pallas_slab=960)

N = 1_000_000
DT = jnp.float32(1 / 240)
g = lambda **kw: granular.GranularConfig(num_particles=N, rebuild_every=16,
                                         **kw)


def time_g(tag, cfg, n_steps=64):
    state = granular.init_state(cfg, jax.random.PRNGKey(0))
    np.asarray(granular.multi_step(state, cfg, DT, n_steps).pos[:1, :1])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(granular.multi_step(state, cfg, DT, n_steps).pos[:1, :1])
        best = min(best, time.time() - t0)
    print(f"{tag:42s} {best/n_steps*1e3:7.2f} ms/step  rate {N*n_steps/best:.3e}",
          flush=True)


def drops_g(tag, cfg, n_steps=16):
    state = granular.init_state(cfg, jax.random.PRNGKey(0))
    _, d = granular.multi_step(state, cfg, DT, n_steps, return_stats=True)
    print(f"{tag:42s} dropped={int(d)}", flush=True)


if SECTION in ("g", "all"):
    time_g("g thin K16 s768", g(pallas_slab=768, thin=True))
    time_g("g thin K16 s896", g(pallas_slab=896, thin=True))
    time_g("g thin K16 b256 s1280", g(pallas_block=256, pallas_slab=1280,
                                      thin=True))
    drops_g("g thin s768 drops", g(pallas_slab=768, thin=True))
print("done", flush=True)
