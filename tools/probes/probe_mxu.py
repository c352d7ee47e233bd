"""Probe: MXU pair math + thin CIV for granular 1M and SC 256^2.

Usage: python probe_mxu.py [g|g2|sc|micro]  (default: all — but prefer
running sections in separate processes: compiling many very large
programs with big ones resident is the known worker-crash pattern).
"""
import sys
import time
import jax, jax.numpy as jnp
import numpy as np

SECTION = sys.argv[1] if len(sys.argv) > 1 else "all"

from wgpu_physics_engine_tpu.models import granular, cloth
from wgpu_physics_engine_tpu.core import config as ccfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state

N = 1_000_000
DT = jnp.float32(1 / 240)


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


g = lambda **kw: granular.GranularConfig(num_particles=N, rebuild_every=16,
                                         **kw)

if SECTION in ("g", "all"):
    time_g("g base  K16 s256 civ", g(pallas_slab=256))
    time_g("g mxu   K16 s256 civ", g(pallas_slab=256, mxu=True))
    time_g("g sums  K16 s256 civ", g(pallas_slab=256, mxu="sums"))
if SECTION in ("g2", "all"):
    time_g("g mxu   K16 b64 s256", g(pallas_block=64, pallas_slab=256,
                                     mxu=True))
    time_g("g mxu   K16 b256 s384", g(pallas_block=256, pallas_slab=384,
                                      mxu=True))
    time_g("g thin+mxu K16 s512", g(pallas_slab=512, thin=True, mxu=True))
    time_g("g thin+mxu K16 s640", g(pallas_slab=640, thin=True, mxu=True))
    drops_g("g thin s512 drops", g(pallas_slab=512, thin=True, mxu=True))
    drops_g("g thin s640 drops", g(pallas_slab=640, thin=True, mxu=True))

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


if SECTION in ("sc", "all"):
    time_sc("sc base K16 s640", rebuild_every=16, pallas_slab=640)
    time_sc("sc mxu  K16 s640", rebuild_every=16, pallas_slab=640, mxu=True)
    time_sc("sc sums K16 s640", rebuild_every=16, pallas_slab=640, mxu="sums")
    time_sc("sc mxu  K32 s640", rebuild_every=32, pallas_slab=640, mxu=True)
    # contact kernel is DMA-issue-bound at b256 (~1024 slab DMAs/launch):
    # bigger blocks halve the issue count; thin mode keeps slab growth ~5/2·b
    time_sc("sc base K16 b512 s1280", rebuild_every=16, pallas_block=512,
            pallas_slab=1280)
    time_sc("sc mxu  K16 b512 s1280", rebuild_every=16, pallas_block=512,
            pallas_slab=1280, mxu=True)
    time_sc("sc base K16 b512 s1536", rebuild_every=16, pallas_block=512,
            pallas_slab=1536)
    time_sc("sc base K16 b128 s384", rebuild_every=16, pallas_block=128,
            pallas_slab=384)

def drops_sc(tag, n_steps=512, **kw):
    _, d = cloth.multi_step_self_collide(cstate, params, DTC, n_steps, spec,
                                         return_stats=True, **kw)
    print(f"{tag:42s} dropped={int(d)}", flush=True)


if SECTION in ("sc", "all"):
    drops_sc("sc b512 s1280 drops", rebuild_every=16, pallas_block=512,
             pallas_slab=1280)
    drops_sc("sc b128 s384 drops", rebuild_every=16, pallas_block=128,
             pallas_slab=384)

# micro: inverse permutation via argsort vs scatter at 65k (SC rebuild)
MICRO = SECTION in ("micro", "all")
nn = 65536
key = jax.random.PRNGKey(0)
order = jax.random.permutation(key, nn).astype(jnp.int32)
iota = jnp.arange(nn, dtype=jnp.int32)


def many(f, x, iters=200):
    def body(c, _):
        return f(c), None
    return jax.lax.scan(body, x, None, length=iters)[0]


f_arg = jax.jit(lambda o: many(lambda v: jnp.argsort(v, stable=True), o))
f_sca = jax.jit(lambda o: many(
    lambda v: jnp.zeros_like(v).at[v].set(iota), o))
if MICRO:
    for tag, f in (("argsort 65k x200", f_arg),
                   ("perm-scatter 65k x200", f_sca)):
        np.asarray(f(order))[:1]
        t0 = time.time(); np.asarray(f(order))[:1]; el = time.time() - t0
        print(f"{tag:38s} {el/200*1e3:7.3f} ms/iter", flush=True)
print("done", flush=True)
