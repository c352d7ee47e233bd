"""Inverse rendering — gradients from PIXELS back to scene and physics
parameters, a capability far outside the reference's reach.

The whole render stack (analytic ray-sphere passes + Phong, render/) is
pure jnp with gradient-safe guards (round 3), so ``jax.grad`` flows from
an image loss back through shading, sphere intersection, and — composed
with the differentiable simulator (``cloth.multi_step_diff``) — through
the PHYSICS to parameters like gravity:

  stage 1: recover the Phong light position from a rendered globe
           (pixel MSE, gradient descent; classic shading-gradient case).
  stage 2: recover GRAVITY from one rendered frame of the falling cloth —
           loss(g) = || render(simulate(g)) − target ||²; the gradient
           crosses the renderer (lit instanced spheres) AND 120 physics
           substeps (fused-kernel custom_vjp on TPU, XLA elsewhere).

Run:  python examples/inverse_rendering.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import dataclasses

import jax
import jax.numpy as jnp

import wgpu_physics_engine_tpu as eng
from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.models import cloth
from wgpu_physics_engine_tpu.render import camera as cam
from wgpu_physics_engine_tpu.render import raster, texture


def _globe_image(light_pos, h=48, w=64):
    camera = cam.make_camera(cfg.CameraConfig(), aspect=w / h)
    light = dataclasses.replace(cfg.LightConfig(), position=light_pos)
    fb = raster.clear(h, w)
    fb = raster.draw_globe(fb, camera, 10.0, texture.earth_gradient(64),
                           light)
    return fb.color


def recover_light(n_iters=60):
    """Shading observes the light's direction (and weakly its distance),
    so parametrize the unknown as (azimuth, elevation) on the true radius
    — a well-posed 2-parameter inverse problem with an exact optimum."""
    true_pos = jnp.asarray([25.0, 18.0, 12.0])
    radius = jnp.linalg.norm(true_pos)
    target = _globe_image(true_pos)

    def pos(angles):
        th, ph = angles[0], angles[1]
        return radius * jnp.asarray([jnp.cos(ph) * jnp.cos(th), jnp.sin(ph),
                                     jnp.cos(ph) * jnp.sin(th)])

    def loss(angles):
        return jnp.mean((_globe_image(pos(angles)) - target) ** 2)

    def err_deg(angles):
        u = pos(angles) / radius
        t = true_pos / radius
        return float(jnp.degrees(jnp.arccos(jnp.clip(jnp.dot(u, t), -1, 1))))

    vg = jax.jit(jax.value_and_grad(loss))
    lf = jax.jit(loss)
    a = jnp.asarray([1.4, 1.1])               # ~45 deg off
    a0 = a
    lr = 20.0
    l, g = vg(a)
    for i in range(n_iters):
        # backtracking: halve the step until the pixel loss decreases
        for _ in range(8):
            a_try = a - lr * g
            l_try = lf(a_try)
            if float(l_try) < float(l):
                break
            lr *= 0.5
        a, l = a_try, l_try
        l, g = vg(a)
        lr *= 1.3
        if i % 12 == 0:
            print(f"  light iter {i:2d}: loss {float(l):.3e}  "
                  f"direction error {err_deg(a):6.2f} deg")
    err = err_deg(a)
    print(f"  recovered direction error {err:.2f} deg "
          f"(started at {err_deg(a0):.2f})")
    return err


def _cloth_image(state, h=48, w=64):
    # aim at the falling sheet (it spawns at y = 40, far above the globe)
    camera = cam.make_camera(cfg.CameraConfig(target=(0.0, 36.0, 0.0),
                                              radius=30.0), aspect=w / h)
    light = cfg.LightConfig()
    centers = state.pos.reshape(3, -1).T
    fb = raster.clear(h, w)
    # lit spheres: pixel shading varies smoothly with particle position
    # (flat shading would have zero interior gradient — coverage only)
    fb = raster.draw_instanced_spheres(fb, camera, centers, 0.6, light,
                                       lit=True, use_kernel=False)
    return fb.color


def recover_gravity(n_bisect=14):
    """Pixel losses over physics rollouts are nonconvex with a narrow
    basin, so do what a practitioner does: bracket with a coarse forward
    scan, then drive the pixel-loss DERIVATIVE to zero by bisection —
    every refinement step consumes d(image MSE)/d(gravity) computed
    end-to-end through the renderer and 240 physics substeps."""
    c = eng.ClothConfig(height=16, width=16)
    params = eng.ClothParams.from_config(c)
    state0 = eng.init_cloth_state(c)
    dt = jnp.float32(1 / 480)
    g_true = -22.5                              # off any scan grid point

    def frame(g):
        out = cloth.multi_step_diff(
            state0, params._replace(gravity=g), dt, 240, segment=48)
        return _cloth_image(out)

    target = frame(jnp.float32(g_true))

    def loss(g):
        return jnp.mean((frame(g) - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    # coarse bracket from forward evaluations only
    grid = [-5.0, -12.5, -20.0, -27.5, -35.0]
    losses = [float(loss(jnp.float32(g))) for g in grid]
    i_best = min(range(len(grid)), key=lambda i: losses[i])
    lo, hi = sorted((grid[max(i_best - 1, 0)],
                     grid[min(i_best + 1, len(grid) - 1)]))
    print(f"  scan best g={grid[i_best]} (loss {losses[i_best]:.3e}); "
          f"bisecting dL/dg on [{lo}, {hi}]")
    for i in range(n_bisect):
        mid = 0.5 * (lo + hi)
        l, dg = vg(jnp.float32(mid))
        # derivative sign tells which side of the basin minimum we're on
        if float(dg) > 0:
            hi = mid
        else:
            lo = mid
        if i % 4 == 0:
            print(f"  bisect {i:2d}: g {mid:8.4f}  loss {float(l):.3e}  "
                  f"dL/dg {float(dg):+.2e}")
    g = 0.5 * (lo + hi)
    print(f"  recovered gravity {g:.3f} (true {g_true})")
    return g, g_true


def main():
    print("stage 1: light direction from globe pixels")
    recover_light()
    print("stage 2: gravity from one rendered cloth frame")
    g, g_true = recover_gravity()
    print(f"  |error| {abs(g - g_true):.4f}")


if __name__ == "__main__":
    main()
