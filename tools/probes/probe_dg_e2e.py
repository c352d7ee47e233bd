"""End-to-end datagen wall-clock at the BASELINE configs[4] scale
(4,096 worlds, 256² frames), EGRESS INCLUDED — overlap on vs off
(VERDICT r4 item 3).

The committed datagen headline (1.17 ms/world) is compute-only by
design (4-byte fence; the egress tunnel rate is reported alongside).
This probe measures what a user actually waits per frame when pulling
the dataset to the host through this harness's tunnel:

  * overlap ON  — `generate_trajectory_dataset` as shipped: frame f+1's
    step+render+encode is dispatched before frame f's fetch, so compute
    rides behind the fetch;
  * overlap OFF — the same launches, synchronously fetched per frame.

Usage: python tools/probes/probe_dg_e2e.py [n_worlds] [n_frames]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.parallel import codec, datagen
from wgpu_physics_engine_tpu.render import texture as T

N_WORLDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N_FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 3
K = 16
STEPS = 24
c = cfg.ClothConfig()
key = jax.random.key(0)

bytes_per_world = 32 * 32 * 3 * K          # int8 DCT coeffs at 256², k=16
mb_per_frame = N_WORLDS * bytes_per_world / 1e6
print(f"{N_WORLDS} worlds, {N_FRAMES} frames, codec k={K}: "
      f"{mb_per_frame:.0f} MB/frame egress", flush=True)

# ---- overlap ON: the shipped generator ----
gen = datagen.generate_trajectory_dataset(
    c, N_WORLDS, N_FRAMES + 1, STEPS, key, randomize_cameras=True,
    codec_k=K)
f0, imgs, _ = next(gen)               # frame 0: pays all compiles
t0 = time.time()
n = 0
for f, imgs, _ in gen:
    n += 1
el_on = (time.time() - t0) / n
print(f"overlap ON : {el_on:6.2f} s/frame = "
      f"{el_on / N_WORLDS * 1e3:6.2f} ms/world  ({n} frames)", flush=True)

# ---- overlap OFF: same launches, synchronous fetch ----
tex = T.pack_rgb8(T.get("mesh", max_size=256))
batch = datagen.randomized_worlds(c, N_WORLDS, jax.random.fold_in(key, 1))
cams = datagen.randomized_cameras(N_WORLDS, jax.random.fold_in(key, 7))
base = datagen.globe_base_fbs(cams, batch.params, tex)
dt = jnp.float32(1.0 / c.hz)

batch, im = datagen.step_and_render(batch, dt, STEPS, cams, tex,
                                    base_fb=base)
_ = np.asarray(codec.encode(im, k=K))          # compile + warm
t0 = time.time()
for _ in range(N_FRAMES):
    batch, im = datagen.step_and_render(batch, dt, STEPS, cams, tex,
                                        base_fb=base)
    arr = np.asarray(codec.encode(im, k=K))    # synchronous fetch
el_off = (time.time() - t0) / N_FRAMES
print(f"overlap OFF: {el_off:6.2f} s/frame = "
      f"{el_off / N_WORLDS * 1e3:6.2f} ms/world", flush=True)
print(f"overlap hides {(el_off - el_on) * 1e3 / N_WORLDS:.2f} ms/world "
      f"({(1 - el_on / el_off) * 100:.0f}% of the serial wall-clock); "
      f"implied tunnel rate {mb_per_frame / el_on:.1f} MB/s", flush=True)
print("done", flush=True)
