"""Bisect the per-world render cost (2.44 ms/world device-side, Aug 19
probe_dg4) at the BASELINE datagen scale: 512 worlds x 60x60 cloth
(3,600 instances) -> 256^2 fb, cached globe, packed texture, fused-oc
kernel composite. VPU op-count says the visibility sweep is ~0.1 ms and
the composite ~0.05 — something structural eats the other ~2.2."""
import functools
import time
import jax, jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.parallel import datagen
from wgpu_physics_engine_tpu.render import texture as T
from wgpu_physics_engine_tpu import render as R
from wgpu_physics_engine_tpu.ops import raster_pallas as _rp

NW = 512
c = cfg.ClothConfig()
key = jax.random.key(0)
batch = datagen.randomized_worlds(c, NW, key)
cams = datagen.randomized_cameras(NW, jax.random.fold_in(key, 7))
dt = jnp.float32(1 / c.hz)
tex_pack = T.pack_rgb8(T.get("mesh", max_size=256))
H = W = 256


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
    print(f"{tag:44s} {best:7.3f}s = {best/nw*1e3:6.3f} ms/world", flush=True)
    return best


base = datagen.globe_base_fbs(cams, batch.params, tex_pack)
jax.block_until_ready(base.color)

state = batch.state
pr = batch.params.particle_radius


@jax.jit
def prologue_all():
    return jax.vmap(
        lambda cam, st, p: _rp.tiled_prologue(
            cam.view[:3, :3], cam.eye, st.pos.reshape(3, -1).T, p,
            cam.znear, jnp.tan(cam.fovy_rad / 2.0), cam.aspect, H, W)
    )(cams, state, pr)


binned = prologue_all()
jax.block_until_ready(binned[0])


@jax.jit
def vis_only():
    def one(a):
        cam, bn = a
        _, dirs = R.camera.pixel_rays(cam, H, W)
        return _rp.sphere_raster_tiled_binned(*bn, dirs, cam.znear,
                                              return_oc=True)[0]
    return jax.lax.map(one, (cams, binned))


timeit("A vis kernel only (incl pixel_rays)", vis_only)


@jax.jit
def rays_only():
    def one(cam):
        return R.camera.pixel_rays(cam, H, W)[1]
    return jax.lax.map(one, cams)


timeit("B pixel_rays only", rays_only)


@jax.jit
def full_render():
    def one(a):
        cam, bn, st, bf = a
        fb = R.draw_instanced_spheres(
            bf, cam, st.pos.reshape(3, -1).T, pr[0], cfg.LightConfig(),
            binned=bn)
        return (jnp.clip(fb.color, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    return jax.lax.map(one, (cams, binned, state, base))


timeit("C full per-world draw+uint8 (lax.map)", full_render)


# D: no lax.map — vmap everything EXCEPT the kernel launch: run the
# kernel per world via lax.map into stacked (tmin, hit, oc), then one
# batched composite over all worlds
@jax.jit
def split_render():
    def one(a):
        cam, bn = a
        _, dirs = R.camera.pixel_rays(cam, H, W)
        return _rp.sphere_raster_tiled_binned(*bn, dirs, cam.znear,
                                              return_oc=True)
    tmin, hit, oc = jax.lax.map(one, (cams, binned))

    def comp(cam, t, hh, o, bf):
        eye, dirs = R.camera.pixel_rays(cam, H, W)
        tg = jnp.where(hh, t, 0.0)
        cen = eye[:, None, None] + o
        p_world = eye[:, None, None] + tg[None] * dirs
        rel = p_world - cen
        rot = cam.view[:3, :3]
        p_view = jnp.einsum("ij,jhw->ihw", rot, p_world - eye[:, None, None])
        color = jnp.broadcast_to(jnp.asarray([1.0, 0., 0.], jnp.float32),
                                 (H, W, 3))
        zn = R.raster._ndc_z(jnp.where(hh, p_view[2], -1.0), cam)
        win = hh & (zn < bf.depth)
        out = jnp.where(win[..., None], color, bf.color)
        return (jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    return jax.vmap(comp)(cams, tmin, hit, oc, base)


timeit("D kernel-map + batched composite", split_render)

# E: tiny-N sanity — per-world map at NW=64 to expose fixed/world costs
small = 64
cams64 = jax.tree.map(lambda x: x[:small], cams)
binned64 = jax.tree.map(lambda x: x[:small], binned)
state64 = jax.tree.map(lambda x: x[:small], state)
base64 = jax.tree.map(lambda x: x[:small], base)


@jax.jit
def full_render64():
    def one(a):
        cam, bn, st, bf = a
        fb = R.draw_instanced_spheres(
            bf, cam, st.pos.reshape(3, -1).T, pr[0], cfg.LightConfig(),
            binned=bn)
        return (jnp.clip(fb.color, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    return jax.lax.map(one, (cams64, binned64, state64, base64))


timeit("E full draw at 64 worlds", full_render64, nw=small)
print("done", flush=True)
