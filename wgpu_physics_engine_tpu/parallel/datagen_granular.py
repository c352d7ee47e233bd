"""Batched granular datagen: vmapped granular worlds with per-world
MATERIALS, stepped by the slab-DMA kernel and rendered to framebuffers.

The granular twin of :mod:`.datagen` (BASELINE configs[4] extended to the
configs[2] model family — the reference has neither). Diversity comes
from two axes the cloth generator cannot express:

* per-world initial conditions (lattice jitter seed + velocity noise);
* per-world material constants — ``k_contact`` / ``gravity`` /
  ``restitution`` ride :func:`granular.multi_step`'s traced params
  vector, so ONE compiled program serves every material in the batch
  (the static-config path would recompile per material).

Same pipeline shape as the cloth generator: worlds are embarrassingly
parallel (``lax.map``, never vmap — the slab kernel carries SMEM
scalars), the raster tile-binning prologue is vmapped across worlds in
one program, the static scene part (wireframe box) is pre-rendered once
per (world, camera), frames compress on device with the DCT codec, and
frame f+1's launch is dispatched before frame f's fetch so egress rides
behind compute.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import config as cfg
from ..core.state import ParticleState
from ..models import granular
from .. import render as R
from .datagen import randomized_cameras

SAND = (0.86, 0.65, 0.35)


class GranularWorldBatch(NamedTuple):
    """A batch of independent granular worlds (leading axis = world)."""

    state: ParticleState        # pos/vel [B, 3, N]
    k_contact: jnp.ndarray      # [B] traced material constants
    gravity: jnp.ndarray        # [B]
    restitution: jnp.ndarray    # [B]


def randomized_granular_worlds(config: granular.GranularConfig,
                               n_worlds: int, key: jax.Array,
                               vel_jitter: float = 0.5,
                               k_jitter: float = 0.3,
                               gravity_jitter: float = 0.2,
                               restitution_range=(0.2, 0.8)
                               ) -> GranularWorldBatch:
    """Per-world initial conditions + material constants. The geometry
    (N, radius, bounds — everything that shapes the broad-phase grid)
    stays shared so one compiled program steps the whole batch."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    states = jax.vmap(lambda k: granular.init_state(config, k))(
        jax.random.split(k1, n_worlds))
    vel = states.vel + vel_jitter * jax.random.normal(
        k2, states.vel.shape, jnp.float32)
    u = lambda k, lo, hi: jax.random.uniform(k, (n_worlds,), jnp.float32,
                                             minval=lo, maxval=hi)
    return GranularWorldBatch(
        state=ParticleState(pos=states.pos, vel=vel),
        k_contact=jnp.float32(config.k_contact)
        * u(k3, 1.0 - k_jitter, 1.0 + k_jitter),
        gravity=jnp.float32(config.gravity)
        * u(k4, 1.0 - gravity_jitter, 1.0 + gravity_jitter),
        restitution=u(k5, *restitution_range))


def box_base_fbs(cameras: R.Camera, bounds: float,
                 fb_size: Tuple[int, int] = (256, 256)):
    """Pre-render the STATIC part of every world's frame — background +
    wireframe box — once per (world, camera) (the granular analog of
    ``datagen.globe_base_fbs``)."""
    h, w = fb_size
    segs = jnp.asarray(R.geometry.wireframe_box(float(bounds))
                       ).reshape(-1, 2, 3)

    @jax.jit
    def one(cam):
        return R.draw_lines(R.clear(h, w), cam, segs, color=(0.0, 0.0, 1.0))

    return jax.vmap(one)(cameras)


@functools.partial(jax.jit, static_argnames=("config", "n_steps", "fb_size",
                                             "chunk", "as_uint8",
                                             "batch_binned",
                                             "use_raster_kernel"))
def granular_step_and_render(batch: GranularWorldBatch,
                             config: granular.GranularConfig,
                             dt: jnp.ndarray, n_steps: int,
                             camera: R.Camera,
                             light: cfg.LightConfig = cfg.LightConfig(),
                             fb_size: Tuple[int, int] = (256, 256),
                             chunk: int = 512,
                             base_fb=None,
                             as_uint8: bool = True,
                             batch_binned: Optional[bool] = None,
                             use_raster_kernel: Optional[bool] = None
                             ) -> Tuple[GranularWorldBatch, jnp.ndarray]:
    """Advance every world ``n_steps`` substeps under its own materials,
    then render each to a framebuffer (sand-colored spheres over the
    cached box frame). Same contract as ``datagen.step_and_render``."""
    def step_one(args):
        pos, vel, kc, g, e = args
        out = granular.multi_step(ParticleState(pos=pos, vel=vel), config,
                                  dt, n_steps, k_contact=kc, gravity=g,
                                  restitution=e)
        return out.pos, out.vel

    pos, vel = jax.lax.map(step_one, (batch.state.pos, batch.state.vel,
                                      batch.k_contact, batch.gravity,
                                      batch.restitution))
    new_batch = batch._replace(state=ParticleState(pos=pos, vel=vel))

    n_worlds = pos.shape[0]
    cams = camera if camera.view.ndim == 3 else jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_worlds,) + x.shape), camera)
    fbh, fbw = fb_size
    if batch_binned is None:
        batch_binned = (jax.default_backend() == "tpu"
                        and fbh % 16 == 0 and fbw % 128 == 0)
    binned = None
    if batch_binned:
        from ..ops import raster_pallas as _rp

        binned = jax.vmap(
            lambda cam, p: _rp.tiled_prologue(
                cam.view[:3, :3], cam.eye, p.reshape(3, -1).T,
                jnp.float32(config.radius), cam.znear,
                jnp.tan(cam.fovy_rad / 2.0), cam.aspect, fbh, fbw)
        )(cams, pos)

    has_bn, has_base = binned is not None, base_fb is not None
    extras = ([binned] if has_bn else []) + ([base_fb] if has_base else [])

    def rend(a):
        p, cam, *extra = a
        bn = extra[0] if has_bn else None
        fb = (extra[-1] if has_base
              else R.clear(fbh, fbw))
        fb = R.draw_instanced_spheres(
            fb, cam, p.reshape(3, -1).T, float(config.radius), light,
            flat_color=SAND, chunk=chunk, binned=bn,
            use_kernel=use_raster_kernel)
        img = fb.color
        if as_uint8:
            img = (jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
        return img

    images = jax.lax.map(rend, (pos, cams, *extras))
    return new_batch, images


def generate_granular_dataset(
    config: granular.GranularConfig, n_worlds: int, n_frames: int,
    steps_per_frame: int, key: jax.Array,
    fb_size: Tuple[int, int] = (256, 256),
    camera: Optional[R.Camera] = None,
    world_chunk: Optional[int] = None,
    randomize_cameras: bool = False,
    codec_k: Optional[int] = None,
    codec_quality: float = 1.0,
    hz: float = 240.0,
):
    """Yield ``(frame_idx, images, batches)`` host-side per frame — the
    granular twin of :func:`datagen.generate_trajectory_dataset` (same
    chunking incl. the remainder chunk, same codec contract, same
    transfer/compute overlap; see that docstring for the pipeline
    notes)."""
    import numpy as np

    world_chunk = world_chunk or n_worlds
    dt = jnp.float32(1.0 / hz)
    cam_cfg = cfg.CameraConfig(radius=3.2 * config.bounds, phi=0.35,
                               theta=0.4)

    n_full, rem = divmod(n_worlds, world_chunk)
    chunk_sizes = [world_chunk] * n_full + ([rem] if rem else [])
    batches, cameras, base_fbs = [], [], []
    for k, size in zip(jax.random.split(key, len(chunk_sizes)), chunk_sizes):
        batches.append(randomized_granular_worlds(config, size, k))
        if randomize_cameras:
            cameras.append(randomized_cameras(
                size, jax.random.fold_in(k, 7),
                radius_range=(2.2 * config.bounds, 4.0 * config.bounds)))
        else:
            cameras.append(camera or R.make_camera(cam_cfg, aspect=1.0))
        cams = cameras[-1]
        if cams.view.ndim != 3:
            cams = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (size,) + x.shape), cams)
        base_fbs.append(box_base_fbs(cams, config.bounds, fb_size))

    if codec_k is not None:
        from . import codec as _codec

    pending = None
    for f in range(n_frames):
        imgs_dev = []
        for bi in range(len(batches)):
            batches[bi], im = granular_step_and_render(
                batches[bi], config, dt, steps_per_frame, cameras[bi],
                fb_size=fb_size, base_fb=base_fbs[bi])
            if codec_k is not None:
                im = _codec.encode(im, k=codec_k, quality=codec_quality)
            imgs_dev.append(im)      # async dispatch; no host sync here
        if pending is not None:
            pf, pdev = pending
            yield pf, np.concatenate([np.asarray(x) for x in pdev],
                                     axis=0), batches
        pending = (f, imgs_dev)
    if pending is not None:
        pf, pdev = pending
        yield pf, np.concatenate([np.asarray(x) for x in pdev],
                                 axis=0), batches
