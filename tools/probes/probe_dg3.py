"""Datagen phase profile: physics / render(flat,tex,packed,cached) / codec.

NOTE the workload: BASELINE configs[4] datagen is the DEFAULT 60x60
cloth (3,600 instances — binned sphere kernel active) rendered to 256^2
framebuffers; the 3.9 ms/world round-2 record is at this scale. A
256^2-particle cloth here would silently disable the binned raster
(n > MAX_INSTANCES) and measure an 18x heavier non-baseline config —
that's what inflated the late-round-3 readings (11.19 textured /
5.87 flat), on top of tunnel degradation."""
import time
import jax, jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.parallel import datagen, codec
from wgpu_physics_engine_tpu.render import texture as T
from wgpu_physics_engine_tpu import render as R

NW = 512
c = cfg.ClothConfig()          # 60x60 — the BASELINE datagen scene
key = jax.random.key(0)
batch = datagen.randomized_worlds(c, NW, key)
cams = datagen.randomized_cameras(NW, jax.random.fold_in(key, 7))
dt = jnp.float32(1 / c.hz)
tex_f32 = T.get("mesh", max_size=256)
tex_pack = T.pack_rgb8(tex_f32)
solid = T.solid((0.3, 0.5, 0.7))


def _sync(r):
    # 4-byte fence: a full np.asarray would fetch the whole output over
    # the 2-15 MB/s tunnel and time EGRESS, not compute (this inflated
    # every round-3 reading of this probe by 2-5 ms/world — see
    # tools/probes/probe_dg_split.py and bench._child_datagen)
    leaf = jax.tree.leaves(r)[0]
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])


def timeit(tag, fn, nw=NW):
    _sync(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = fn()
        _sync(r)
        best = min(best, time.time() - t0)
    print(f"{tag:38s} {best:7.3f}s = {best/nw*1e3:6.2f} ms/world", flush=True)
    return r


# physics only (24 substeps like the earlier probes). NOTE: jitted at
# top level — the un-jitted call this probe used through round 3 paid
# the axon tunnel's per-dispatch cost on every eager glue op of the
# batched path (lane-fold padding etc.), which inflated the "physics"
# line to 2-3.6 ms/world when the kernel itself is ~0.07.
from wgpu_physics_engine_tpu.ops import cloth_pallas
phys = jax.jit(lambda s, p: cloth_pallas.multi_step(s, p, dt, 24))
timeit("physics 24 substeps", lambda: phys(batch.state, batch.params))

# step+render variants (24 substeps + render + uint8)
timeit("s+r solid tex", lambda: datagen.step_and_render(
    batch, dt, 24, cams, solid)[1])
timeit("s+r f32 tex256", lambda: datagen.step_and_render(
    batch, dt, 24, cams, tex_f32)[1])
timeit("s+r packed tex256", lambda: datagen.step_and_render(
    batch, dt, 24, cams, tex_pack)[1])

base = datagen.globe_base_fbs(cams, batch.params, tex_pack)
jax.block_until_ready(base.color)
timeit("s+r packed cached-globe", lambda: datagen.step_and_render(
    batch, dt, 24, cams, tex_pack, base_fb=base)[1])

# + codec
timeit("s+r cached + codec k16", lambda: codec.encode(
    datagen.step_and_render(batch, dt, 24, cams, tex_pack,
                            base_fb=base)[1], k=16))

# render-only isolation: 0 substeps
timeit("r only cached (0 substeps)", lambda: datagen.step_and_render(
    batch, dt, 0, cams, tex_pack, base_fb=base)[1])

# ---- heavy non-baseline workload: 256^2-PARTICLE cloth (65k instances/
# world) — exercises the round-3 chunked-instance-table kernel vs the
# XLA chunk path it replaced as the >MAX_INSTANCES route
NWH = 64
ch = cfg.ClothConfig(height=256, width=256)
hbatch = datagen.randomized_worlds(ch, NWH, jax.random.fold_in(key, 9))
hcams = datagen.randomized_cameras(NWH, jax.random.fold_in(key, 10))


timeit("heavy 65k chunked krn batched-bins", lambda: datagen.step_and_render(
    hbatch, dt, 0, hcams, solid, batch_binned=True)[1], nw=NWH)
# per-world prologue + chunked kernel (use_kernel auto-True past the cap)
timeit("heavy 65k chunked krn per-world", lambda: datagen.step_and_render(
    hbatch, dt, 0, hcams, solid, batch_binned=False)[1], nw=NWH)
# the TRUE XLA chunk-scan arm needs use_raster_kernel=False — plain
# batch_binned=False now auto-routes to the chunked kernel
timeit("heavy 65k XLA chunk-scan", lambda: datagen.step_and_render(
    hbatch, dt, 0, hcams, solid, batch_binned=False,
    use_raster_kernel=False)[1], nw=NWH)
print("done", flush=True)
