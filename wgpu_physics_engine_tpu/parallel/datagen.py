"""Batched datagen: thousands of vmapped cloth worlds stepped and rendered
to framebuffers per launch (BASELINE.json configs[4]: "4096 vmapped cloth
scenes + headless instanced-sphere render to 256² framebuffers").

The reference has no datagen story at all (single interactive window); this
is the north-star capability the TPU rebuild exists for. Worlds are
embarrassingly parallel: under a ``worlds`` mesh axis the step and render
partition with zero collectives (SURVEY §5).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import config as cfg
from ..core.state import ClothParams, ClothState, init_cloth_state
from ..models import cloth
from .. import render as R
from ..render import texture as T


class WorldBatch(NamedTuple):
    """A batch of independent cloth worlds (leading axis = world)."""

    state: ClothState          # pos/vel [B, 3, H, W]
    params: ClothParams        # each leaf [B]


def randomized_worlds(config: cfg.ClothConfig, n_worlds: int, key: jax.Array,
                      height_jitter: float = 5.0,
                      vel_jitter: float = 1.0,
                      stiffness_jitter: float = 0.2) -> WorldBatch:
    """Sample varied initial conditions: spawn height, initial velocity,
    and spring-stiffness scale per world — the knobs the reference exposes
    as egui sliders, randomized for dataset diversity."""
    k1, k2, k3 = jax.random.split(key, 3)
    base = init_cloth_state(config)
    dy = jax.random.uniform(k1, (n_worlds,), jnp.float32,
                            minval=-height_jitter, maxval=height_jitter)
    pos = jnp.broadcast_to(base.pos, (n_worlds,) + base.pos.shape)
    pos = pos.at[:, 1].add(dy[:, None, None])
    vel = vel_jitter * jax.random.normal(
        k2, (n_worlds,) + base.vel.shape, jnp.float32)

    p1 = ClothParams.from_config(config)
    scale = 1.0 + stiffness_jitter * jax.random.uniform(
        k3, (n_worlds,), jnp.float32, minval=-1.0, maxval=1.0)
    ones = jnp.ones((n_worlds,), jnp.float32)
    params = ClothParams(*[jnp.broadcast_to(leaf, (n_worlds,)) for leaf in p1])
    params = params._replace(
        k_struct=p1.k_struct * scale,
        k_shear=p1.k_shear * scale,
        k_bend=p1.k_bend * scale,
    )
    del ones
    return WorldBatch(state=ClothState(pos=pos, vel=vel), params=params)


def randomized_cameras(n_worlds: int, key: jax.Array,
                       radius_range=(30.0, 55.0),
                       phi_range=(0.05, 1.2),
                       aspect: float = 1.0) -> R.Camera:
    """Batched orbit cameras (leaves have a leading worlds axis): random
    azimuth, elevation, and zoom per world — varied dataset viewpoints."""
    k1, k2, k3 = jax.random.split(key, 3)
    theta = jax.random.uniform(k1, (n_worlds,), jnp.float32, 0.0, 2 * jnp.pi)
    phi = jax.random.uniform(k2, (n_worlds,), jnp.float32, *phi_range)
    radius = jax.random.uniform(k3, (n_worlds,), jnp.float32, *radius_range)
    return jax.vmap(
        lambda r, t, p: R.make_camera(cfg.CameraConfig(), aspect,
                                      radius=r, theta=t, phi=p)
    )(radius, theta, phi)


def _render_world(pos: jnp.ndarray, camera: R.Camera, globe_radius,
                  particle_radius, globe_tex, light: cfg.LightConfig,
                  fb_size: Tuple[int, int], chunk: int,
                  binned=None, base_fb=None,
                  use_raster_kernel=None) -> jnp.ndarray:
    h, w = fb_size
    if base_fb is None:
        fb = R.clear(h, w)
        fb = R.draw_globe(fb, camera, globe_radius, globe_tex, light)
    else:
        fb = base_fb
    centers = pos.reshape(3, -1).T
    fb = R.draw_instanced_spheres(fb, camera, centers, particle_radius,
                                  light, chunk=chunk, binned=binned,
                                  use_kernel=use_raster_kernel)
    return fb.color


def globe_base_fbs(cameras: R.Camera, params: ClothParams,
                   globe_tex: jnp.ndarray,
                   light: cfg.LightConfig = cfg.LightConfig(),
                   fb_size: Tuple[int, int] = (256, 256)):
    """Pre-render the STATIC part of every world's frame — background +
    textured/lit globe — once per (world, camera).

    The globe never moves during a trajectory and the camera is fixed
    per world, so its render (bilinear texture gathers + Phong — ~half
    of the textured per-frame render cost, measured round 3) can be paid
    once per DATASET instead of once per frame; each frame then
    composites only the moving cloth spheres over the cached color+depth.
    Bit-identical compositing inputs — only cross-frame reuse changes.

    Worlds are processed in chunks of 512 (``lax.map`` batches of the
    vmapped render): one flat vmap over 4096 worlds allocates ~18 GB of
    [B, 3, 256, 256] Phong temporaries and OOMs the 16 GB HBM (measured
    round 4); per-512 chunks peak ~2.3 GB with identical outputs.
    """
    h, w = fb_size

    @jax.jit
    def one(cam, radius):
        return R.draw_globe(R.clear(h, w), cam, radius, globe_tex, light)

    n = cameras.view.shape[0]
    chunk = 512
    if n <= chunk:
        return jax.vmap(one)(cameras, params.globe_radius)
    n_full = n // chunk
    head = jax.tree.map(lambda x: x[:n_full * chunk].reshape(
        (n_full, chunk) + x.shape[1:]), cameras)
    rad = params.globe_radius
    rad_head = rad[:n_full * chunk].reshape(n_full, chunk)
    out = jax.lax.map(lambda a: jax.vmap(one)(a[0], a[1]), (head, rad_head))
    out = jax.tree.map(lambda x: x.reshape((n_full * chunk,) + x.shape[2:]),
                       out)
    if n % chunk:
        tail = jax.vmap(one)(
            jax.tree.map(lambda x: x[n_full * chunk:], cameras),
            rad[n_full * chunk:])
        out = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), out, tail)
    return out


@functools.partial(
    jax.jit, static_argnames=("n_steps", "light", "fb_size", "chunk",
                              "use_pallas", "as_uint8", "batch_binned",
                              "use_raster_kernel"))
def step_and_render(batch: WorldBatch, dt: jnp.ndarray, n_steps: int,
                    camera: R.Camera, globe_tex: jnp.ndarray,
                    light: cfg.LightConfig = cfg.LightConfig(),
                    fb_size: Tuple[int, int] = (256, 256),
                    chunk: int = 512,
                    base_fb=None,
                    use_pallas: bool = True,
                    as_uint8: bool = True,
                    batch_binned: Optional[bool] = None,
                    use_raster_kernel: Optional[bool] = None
                    ) -> Tuple[WorldBatch, jnp.ndarray]:
    """Advance every world ``n_steps`` substeps, then render each to a
    framebuffer. Returns (new batch, images [B, h, w, 3] — uint8 by default:
    device→host egress is the datagen bottleneck, 4× smaller than fp32).
    ``camera`` may be a single Camera or a batched one (leading worlds axis
    on every leaf, e.g. from :func:`randomized_cameras`) for per-world
    viewpoints. Fully on-device; shard the batch over a ``worlds`` mesh
    axis to scale across chips.

    ``light`` is static (hashable frozen dataclass) so non-default
    lights jit cleanly instead of failing pytree flattening."""
    batched_cam = camera.view.ndim == 3
    if use_pallas:
        from ..ops import cloth_pallas

        # batch-aware pallas path: lax.map over worlds inside (vmapping a
        # pallas_call with SMEM scalar inputs is not supported)
        new_state = cloth_pallas.multi_step(batch.state, batch.params, dt,
                                            n_steps)
    else:
        new_state = jax.vmap(
            lambda s, p: cloth.multi_step(s, p, dt, n_steps)
        )(batch.state, batch.params)

    n_worlds = batch.state.pos.shape[0]
    cams = camera if batched_cam else jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_worlds,) + x.shape), camera)

    # Batched raster prologue: the tile-binning half of the sphere kernel
    # (project/argsort/histogram/windows) is small XLA work with NO
    # batching constraint — inside the per-world map it serializes and
    # costs ~0.5 of the 1.4 ms/world render floor. Compute it for ALL
    # worlds in one vmapped program; only the kernel launch (SMEM scalars,
    # unvmappable) stays per-world. (A fully-batched render — one
    # (worlds, tiles) pallas visibility launch per world group + vmapped
    # composite — was built and A/B'd in round 3: NO faster than this
    # per-world lax.map in the same process (5.9 vs 5.5 ms/world), i.e.
    # the per-world map is compute-bound, not dispatch-bound. Not kept.)
    fbh, fbw = fb_size
    if batch_binned is None:
        # any instance count: past MAX_INSTANCES the binned kernel runs
        # its chunked-table grid (raster_pallas.sphere_raster_tiled_binned)
        batch_binned = (jax.default_backend() == "tpu"
                        and fbh % 16 == 0 and fbw % 128 == 0)
    binned = None
    if batch_binned:
        from ..ops import raster_pallas as _rp

        binned = jax.vmap(
            lambda cam, st, pr: _rp.tiled_prologue(
                cam.view[:3, :3], cam.eye, st.pos.reshape(3, -1).T, pr,
                cam.znear, jnp.tan(cam.fovy_rad / 2.0), cam.aspect,
                fbh, fbw)
        )(cams, new_state, batch.params.particle_radius)

    def rend(args):
        state, params, cam, bn, base = args
        img = _render_world(state.pos, cam, params.globe_radius,
                            params.particle_radius, globe_tex, light,
                            fb_size, chunk, binned=bn, base_fb=base,
                            use_raster_kernel=use_raster_kernel)
        if as_uint8:
            # cast per world so the map accumulates uint8, not fp32
            # (4096 worlds × 256² fp32 would be 3.2 GB of HBM)
            img = (jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
        return img

    # sequential map (no batch_size → no vmap): a vmap would (a) batch the
    # Pallas raster kernel's SMEM scalars, which Mosaic rejects, and
    # (b) materialize [worlds, pixels, chunk] intermediates in the XLA path
    # (64 GB at 512 worlds x 256^2). One world renders in ~1.4 ms on chip,
    # so sequential costs little.
    # lax.map can't carry None leaves: append whichever optional operands
    # exist and re-slot them (statically) inside the mapped fn
    has_bn, has_base = binned is not None, base_fb is not None
    extras = ([binned] if has_bn else []) + ([base_fb] if has_base else [])

    def rend_packed(a):
        state, params, cam, *extra = a
        bn = extra[0] if has_bn else None
        base = extra[-1] if has_base else None
        return rend((state, params, cam, bn, base))

    images = jax.lax.map(rend_packed,
                         (new_state, batch.params, cams, *extras))
    return WorldBatch(state=new_state, params=batch.params), images


def generate_trajectory_dataset(
    config: cfg.ClothConfig, n_worlds: int, n_frames: int,
    steps_per_frame: int, key: jax.Array,
    fb_size: Tuple[int, int] = (256, 256),
    camera: Optional[R.Camera] = None,
    globe_tex: Optional[jnp.ndarray] = None,
    world_chunk: Optional[int] = None,
    use_pallas: bool = True,
    randomize_cameras: bool = False,
    codec_k: Optional[int] = None,
    codec_quality: float = 1.0,
    cache_globe: bool = True,
):
    """Yield (frame_idx, images, batch) host-side per frame.

    ``world_chunk`` bounds device memory: worlds are processed in chunks of
    that size (default: all at once).

    ``codec_k``: if set, frames are compressed ON DEVICE with the fixed-rate
    DCT codec (:mod:`..parallel.codec`) before fetch — yielded arrays are
    ``[B, h/8, w/8, 3, codec_k]`` int8 (64/k× less egress; decode with
    :func:`codec.decode`). Egress is the datagen bottleneck, so this is the
    lever when the host link, not the chip, is the wall.

    Transfer/compute overlap: frame f+1's step+render launch is DISPATCHED
    before frame f's device buffers are fetched to the host, so the
    device→host egress (the datagen bottleneck) rides behind the next
    launch's compute instead of serializing with it. Note the yielded
    ``batches`` therefore already hold frame f+1's state when frame f's
    images are delivered.
    """
    import numpy as np

    # 256 mip of the globe texture, packed to one uint32 RGB8 plane:
    # gathers from a 512² fp32 texture fall out of cache and cost
    # +1.3 ms/world at 512 worlds (measured round 3; at 256² output the
    # lost detail is sub-pixel), and packing cuts the sampler's gathers
    # from 12/pixel to 4 with a 3× smaller table (see texture.pack_rgb8)
    globe_tex = (T.pack_rgb8(T.get("mesh", max_size=256))
                 if globe_tex is None else globe_tex)
    world_chunk = world_chunk or n_worlds
    dt = jnp.float32(1.0 / config.hz)

    # chunk sizes: full chunks + a final short one so EVERY requested world
    # is generated (n_worlds % world_chunk used to be silently dropped);
    # the short chunk costs one extra compile of the step at its shape
    n_full, rem = divmod(n_worlds, world_chunk)
    chunk_sizes = [world_chunk] * n_full + ([rem] if rem else [])
    batches = []
    cameras = []
    base_fbs = []
    for k, size in zip(jax.random.split(key, len(chunk_sizes)), chunk_sizes):
        batches.append(randomized_worlds(config, size, k))
        if randomize_cameras:
            cameras.append(randomized_cameras(size, jax.random.fold_in(k, 7)))
        else:
            cameras.append(camera or R.make_camera(cfg.CameraConfig(), aspect=1.0))
        if cache_globe:
            # globe + background pre-rendered ONCE per (world, camera):
            # the static half of the frame (texture gathers + Phong) is
            # paid per dataset, not per frame
            cams = cameras[-1]
            if cams.view.ndim != 3:
                cams = jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (size,) + x.shape), cams)
            base_fbs.append(globe_base_fbs(cams, batches[-1].params,
                                           globe_tex, fb_size=fb_size))
        else:
            base_fbs.append(None)

    if codec_k is not None:
        from . import codec as _codec

    pending = None          # (frame_idx, [device image arrays per chunk])
    for f in range(n_frames):
        imgs_dev = []
        for bi in range(len(batches)):
            batches[bi], im = step_and_render(
                batches[bi], dt, steps_per_frame, cameras[bi], globe_tex,
                fb_size=fb_size, base_fb=base_fbs[bi],
                use_pallas=use_pallas)
            if codec_k is not None:
                im = _codec.encode(im, k=codec_k, quality=codec_quality)
            imgs_dev.append(im)      # async dispatch; no host sync here
        if pending is not None:
            pf, pdev = pending
            yield pf, np.concatenate([np.asarray(x) for x in pdev], axis=0), batches
        pending = (f, imgs_dev)
    if pending is not None:                       # n_frames == 0: yield nothing
        pf, pdev = pending
        yield pf, np.concatenate([np.asarray(x) for x in pdev], axis=0), batches
