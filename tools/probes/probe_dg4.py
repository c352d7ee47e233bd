"""Datagen DEVICE-side phase profile (fence-synced) + pipelined steady state.

probe_dg3's timings include a FULL-array tunnel readback (np.asarray of
the whole leaf), so its absolute ms/world are egress-dominated — on a
slow-tunnel day (8-17 MB/s observed Aug 19) the 100 MB uint8 frame
batch alone costs ~10-20 ms/world and buries every compute phase.
This probe fences with a tiny slice readback instead (the bench.py
trick: an eager device slice -> 4-byte host read fences the producer
without timing the tunnel), then measures the REAL pipelined generator
(egress overlapped behind the next frame's compute) separately.
"""
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
tex_pack = T.pack_rgb8(T.get("mesh", max_size=256))


def fence(r):
    x = jax.tree.leaves(r)[0]
    np.asarray(x[(slice(0, 1),) * x.ndim])


def timeit(tag, fn, nw=NW, reps=3):
    fence(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fence(fn())
        best = min(best, time.time() - t0)
    print(f"{tag:38s} {best:7.3f}s = {best/nw*1e3:6.3f} ms/world", flush=True)
    return best


from wgpu_physics_engine_tpu.ops import cloth_pallas, raster_pallas as _rp

timeit("physics 24 substeps (lane kernel)", lambda: cloth_pallas.multi_step(
    batch.state, batch.params, dt, 24))

base = datagen.globe_base_fbs(cams, batch.params, tex_pack)
jax.block_until_ready(base.color)
fence(base.color)

# batched prologue alone
fbh = fbw = 256


@jax.jit
def prologue_all():
    return jax.vmap(
        lambda cam, st, pr: _rp.tiled_prologue(
            cam.view[:3, :3], cam.eye, st.pos.reshape(3, -1).T, pr,
            cam.znear, jnp.tan(cam.fovy_rad / 2.0), cam.aspect, fbh, fbw)
    )(cams, batch.state, batch.params.particle_radius)


timeit("batched raster prologue", prologue_all)

timeit("s+r cached (device only)", lambda: datagen.step_and_render(
    batch, dt, 24, cams, tex_pack, base_fb=base)[1])

timeit("r only cached (0 substeps, device)", lambda: datagen.step_and_render(
    batch, dt, 0, cams, tex_pack, base_fb=base)[1])

imgs = datagen.step_and_render(batch, dt, 24, cams, tex_pack, base_fb=base)[1]
jax.block_until_ready(imgs)
timeit("codec k16 encode only (device)", lambda: codec.encode(imgs, k=16))

timeit("s+r cached + codec (device only)", lambda: codec.encode(
    datagen.step_and_render(batch, dt, 24, cams, tex_pack,
                            base_fb=base)[1], k=16))

# ---- pipelined steady state: the generator overlaps egress behind the
# next frame's compute; per-frame wall time after warmup is the honest
# datagen throughput number (includes host concat + codec fetch)
for tag, kwargs in (("pipelined codec k16", dict(codec_k=16)),
                    ("pipelined codec k8", dict(codec_k=8))):
    gen = datagen.generate_trajectory_dataset(
        c, NW, n_frames=8, steps_per_frame=24, key=key,
        randomize_cameras=True, **kwargs)
    times = []
    t0 = time.time()
    for f, imgs_np, _ in gen:
        t1 = time.time()
        times.append(t1 - t0)
        t0 = t1
    steady = sorted(times[2:])[len(times[2:]) // 2]
    print(f"{tag:38s} steady {steady:7.3f}s = {steady/NW*1e3:6.3f} ms/world"
          f" (first {times[0]:.1f}s)", flush=True)
print("done", flush=True)
