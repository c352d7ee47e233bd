"""Multi-chip batched datagen: shard thousands of independent cloth worlds
over a device mesh and dump rendered framebuffers via the native async
writer.

Run on a TPU pod slice, or simulate locally:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/multichip_datagen.py
"""

import os
import sys

# allow running straight from a source checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import os

import jax
import jax.numpy as jnp
import numpy as np

import wgpu_physics_engine_tpu as eng
from wgpu_physics_engine_tpu import native
from wgpu_physics_engine_tpu import render as R
from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.parallel import datagen, mesh as pmesh
from wgpu_physics_engine_tpu.render import texture as T


def main(n_worlds=64, n_frames=4, fb=64, outdir="/tmp/wpe_datagen"):
    import math

    # the worlds axis must divide evenly across the mesh
    n_dev = math.gcd(n_worlds, len(jax.devices()))
    devices = jax.devices()[:n_dev]
    m = pmesh.make_mesh((len(devices),), ("worlds",), devices)
    print(f"mesh: {m}")

    c = cfg.ClothConfig(height=32, width=32)
    batch = datagen.randomized_worlds(c, n_worlds, jax.random.key(0))
    # shard the worlds axis across the mesh: the step/render partitions with
    # zero inter-chip collectives
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(m, P("worlds"))
    batch = datagen.WorldBatch(
        state=jax.tree.map(lambda x: jax.device_put(x, sh), batch.state),
        params=jax.tree.map(lambda x: jax.device_put(x, sh), batch.params),
    )

    cam = R.make_camera(cfg.CameraConfig(), aspect=1.0)
    tex = T.checkerboard()
    os.makedirs(outdir, exist_ok=True)
    writer = native.ShardWriter() if native.available() else None

    for f in range(n_frames):
        batch, imgs = datagen.step_and_render(
            batch, jnp.float32(1 / 480), 24, cam, tex, fb_size=(fb, fb),
            use_pallas=jax.default_backend() == "tpu")
        arr = np.asarray(imgs)
        path = os.path.join(outdir, f"frame_{f:04d}.npy")
        if writer:
            writer.submit(path, arr)
        else:
            np.save(path, arr)
        print(f"frame {f}: {arr.shape} finite={np.isfinite(arr).all()}")
    if writer:
        print("shards written:", writer.close())


if __name__ == "__main__":
    main()
