"""A/B: grid=(B,) batched-worlds kernel vs lane-folded kernel.

Workload = BASELINE configs[4] datagen physics: 512 worlds of the default
60x60 cloth, 24 substeps per call (one frame), per-world params. Also
checks on-device bitwise equality between the two packagings and times a
full datagen step_and_render+codec pipeline with the lanes kernel in
place (it is the default batched route now).
"""
import time
import jax, jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.parallel import datagen, codec
from wgpu_physics_engine_tpu.render import texture as T
from wgpu_physics_engine_tpu.ops import cloth_pallas

NW = 512
c = cfg.ClothConfig()
key = jax.random.key(0)
batch = datagen.randomized_worlds(c, NW, key)
dt = jnp.float32(1 / c.hz)


_scalar = jax.jit(lambda t: jnp.sum(jnp.ravel(t)[:4096]))


def sync(r):
    """8-byte readback sync: a full np.asarray of a [512,3,60,60] leaf is
    ~22 MB over the ~10 MB/s tunnel and swamps the compute time — reduce
    on-device and read back one scalar instead (+~46 ms fixed dispatch)."""
    np.asarray(_scalar(jax.tree.leaves(r)[0]))


def timeit(tag, fn, nw=NW, reps=3):
    sync(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        r = fn()
        sync(r)
        best = min(best, time.time() - t0)
    print(f"{tag:38s} {best:7.3f}s = {best/nw*1e3:6.2f} ms/world", flush=True)
    return r


grid_b = jax.jit(lambda s, p: cloth_pallas._multi_step_batched(
    s, p, dt, 24, interpret=False, fast_math=False))
lanes = jax.jit(lambda s, p: cloth_pallas._multi_step_lanes(
    s, p, dt, 24, interpret=False, fast_math=False))

a = timeit("grid=(B,) batched 24 substeps",
           lambda: grid_b(batch.state, batch.params))
b = timeit("lane-folded 24 substeps",
           lambda: lanes(batch.state, batch.params))
dev = np.max(np.abs(np.asarray(a.pos) - np.asarray(b.pos)))
print(f"bitwise max|dpos| grid vs lanes          {dev:.3e}", flush=True)

# interleaved best-of for tunnel noise
for _ in range(2):
    timeit("grid=(B,) batched (again)",
           lambda: grid_b(batch.state, batch.params))
    timeit("lane-folded (again)",
           lambda: lanes(batch.state, batch.params))

# full datagen pipeline with the lanes kernel as the batched default
cams = datagen.randomized_cameras(NW, jax.random.fold_in(key, 7))
tex_pack = T.pack_rgb8(T.get("mesh", max_size=256))
base = datagen.globe_base_fbs(cams, batch.params, tex_pack)
jax.block_until_ready(base.color)
timeit("s+r cached + codec k16 (lanes)", lambda: codec.encode(
    datagen.step_and_render(batch, dt, 24, cams, tex_pack,
                            base_fb=base)[1], k=16))
timeit("physics only via multi_step", lambda: cloth_pallas.multi_step(
    batch.state, batch.params, dt, 24))
print("done", flush=True)
