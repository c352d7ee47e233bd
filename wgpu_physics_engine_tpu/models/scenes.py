"""Application layer: the five reference simulations as scene objects.

Each scene mirrors one reference app's ``App`` impl (L5) plus its egui
control panel (L6): a host-side stateful wrapper around the functional core
with an ``update(delta_time)`` / ``render(h, w)`` frame contract
(wgpu-bootstrap's ``trait App`` — SURVEY C17) and runtime-tunable parameters
that re-trace nothing (params are traced jit arguments, the TPU equivalent
of ``queue.write_buffer`` on a uniform — cloth.rs:821-839, 1475-1488).

Scenes:
* :class:`CubeScene`          — sim 1 (flat-colored indexed cube, C3)
* :class:`TexturedCubeScene`  — sim 2 (diffuse textured cube, C4)
* :class:`GlobeScene`         — sim 3 (lit/textured UV sphere + light panel, C6)
* :class:`FreeParticleScene`  — sim 4 (bouncing spheres in a wireframe box, C8)
* :class:`ClothScene`         — sim 5 flagship (cloth over globe, C11)
* :class:`GranularScene`      — sim 4 scaled to contact-resolved granular
  piles (BASELINE configs[2]; no reference equivalent)
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import config as cfg
from ..core.state import ClothParams, ParticleParams, init_cloth_state
from .. import render as R
from ..render import texture as T
from . import cloth, particles


class _FrameClock:
    """FPS bookkeeping (the egui FPS label, cloth.rs:1446,1459)."""

    def __init__(self):
        self._last = None
        self.fps = 0.0

    def tick(self) -> float:
        now = time.time()
        dt = 1.0 / 60.0 if self._last is None else max(now - self._last, 1e-6)
        self._last = now
        self.fps = 1.0 / dt
        return dt


class _SceneBase:
    """Common camera/light handling + input (orbit) controls."""

    def __init__(self, camera_cfg: cfg.CameraConfig, light: cfg.LightConfig,
                 aspect: float):
        self.camera_cfg = camera_cfg
        self.light = light
        self._aspect = aspect
        self._orbit = dict(radius=camera_cfg.radius, theta=camera_cfg.theta,
                           phi=camera_cfg.phi)
        self.clock = _FrameClock()

    # --- input / resize (App::input, App::resize equivalents) ---
    def orbit(self, d_theta: float = 0.0, d_phi: float = 0.0,
              d_radius: float = 0.0) -> None:
        self._orbit["theta"] += d_theta
        self._orbit["phi"] = float(np.clip(self._orbit["phi"] + d_phi,
                                           -1.55, 1.55))
        self._orbit["radius"] = max(self._orbit["radius"] + d_radius, 0.1)

    def set_zoom(self, radius: float) -> None:  # camera zoom slider
        self._orbit["radius"] = radius

    def resize(self, width: int, height: int) -> None:
        self._aspect = width / height

    def camera(self) -> R.Camera:
        return R.make_camera(self.camera_cfg, self._aspect, **self._orbit)

    # --- light panel (globe.rs:491-545) ---
    def set_light(self, position=None, ks=None, shininess=None,
                  compute_specular=None) -> None:
        upd = {}
        if position is not None:
            upd["position"] = tuple(position)
        if ks is not None:
            upd["ks"] = ks
        if shininess is not None:
            upd["shininess"] = shininess
        if compute_specular is not None:
            upd["compute_specular"] = compute_specular
        self.light = dataclasses.replace(self.light, **upd)

    @staticmethod
    def _to_image(fb: R.Framebuffer) -> np.ndarray:
        return np.asarray(jnp.clip(fb.color, 0.0, 1.0))


class CubeScene(_SceneBase):
    """Sim 1: indexed draw of a per-face colored cube (cube_app.rs:156-296)."""

    def __init__(self, camera_cfg=cfg.CameraConfig(radius=5.0, phi=0.5, theta=0.7),
                 light=cfg.LightConfig(), aspect=800 / 600):
        super().__init__(camera_cfg, light, aspect)
        self.mesh = R.DeviceMesh.from_host(R.geometry.cube_mesh(1.0))

    def update(self, delta_time: Optional[float] = None) -> None:
        self.clock.tick()

    def render(self, height: int = 600, width: int = 800) -> np.ndarray:
        fb = R.clear(height, width)
        fb = R.draw_mesh(fb, self.camera(), self.mesh, mode="color")
        return self._to_image(fb)


class TexturedCubeScene(_SceneBase):
    """Sim 2: textured cube with clamped diffuse shading
    (textured_cube_app.rs:111-369, cube_textured_shader.wgsl:59-76)."""

    def __init__(self, texture: Optional[jnp.ndarray] = None,
                 camera_cfg=cfg.CameraConfig(radius=5.0, phi=0.5, theta=0.7),
                 light=cfg.LightConfig(), aspect=800 / 600):
        super().__init__(camera_cfg, light, aspect)
        self.mesh = R.DeviceMesh.from_host(R.geometry.cube_mesh(1.0))
        self.texture = T.get("texture") if texture is None else texture

    def update(self, delta_time: Optional[float] = None) -> None:
        self.clock.tick()

    def render(self, height: int = 600, width: int = 800) -> np.ndarray:
        fb = R.clear(height, width)
        fb = R.draw_mesh(fb, self.camera(), self.mesh, texture=self.texture,
                         mode="diffuse", light=self.light)
        return self._to_image(fb)


class GlobeScene(_SceneBase):
    """Sim 3: lit/textured UV sphere with Phong specular and a light control
    panel (globe.rs:85-562). Renders analytically (exact sphere) by default;
    ``use_mesh=True`` rasterizes the tessellated mesh like the reference."""

    def __init__(self, config=cfg.GlobeConfig(), texture=None,
                 camera_cfg=cfg.CameraConfig(), light=cfg.LightConfig(),
                 aspect=800 / 600, use_mesh: bool = False):
        super().__init__(camera_cfg, light, aspect)
        self.config = config
        self.texture = T.get("moon1024") if texture is None else texture
        self.use_mesh = use_mesh
        self.mesh = R.DeviceMesh.from_host(R.geometry.generate_uv_sphere(
            config.radius, config.stack_count, config.sector_count))

    def update(self, delta_time: Optional[float] = None) -> None:
        self.clock.tick()

    def render(self, height: int = 600, width: int = 800) -> np.ndarray:
        fb = R.clear(height, width)
        cam = self.camera()
        if self.use_mesh:
            fb = R.draw_mesh(fb, cam, self.mesh, texture=self.texture,
                             mode="phong", light=self.light)
        else:
            fb = R.draw_globe(fb, cam, self.config.radius, self.texture,
                              self.light)
        return self._to_image(fb)


class FreeParticleScene(_SceneBase):
    """Sim 4: N spheres bouncing in a wireframe box with physics sliders
    (instance.rs:169-1017)."""

    def __init__(self, config=cfg.FreeParticleConfig(), texture=None,
                 camera_cfg=cfg.CameraConfig(radius=40.0, phi=0.3, theta=0.3),
                 light=cfg.LightConfig(), aspect=800 / 600, seed: int = 0):
        super().__init__(camera_cfg, light, aspect)
        self.config = config
        self.params = ParticleParams.from_config(config)
        self.state = particles.init_state(config, jax.random.key(seed))
        self.texture = T.get("moon1024") if texture is None else texture
        self.time_scale = config.time_scale

    # egui sliders (instance.rs:924-981)
    def set_gravity(self, g) -> None:
        self.params = self.params._replace(gravity=jnp.asarray(g, jnp.float32))

    def set_bounds(self, b: float) -> None:
        self.params = self.params._replace(bounds=jnp.float32(b))

    def set_radius(self, r: float) -> None:
        self.params = self.params._replace(radius=jnp.float32(r))

    def set_time_scale(self, s: float) -> None:
        self.time_scale = s

    def update(self, delta_time: Optional[float] = None) -> None:
        dt = self.clock.tick()
        if delta_time is not None:
            dt = delta_time
        self.state = particles.multi_step(
            self.state, self.params, jnp.float32(self.time_scale * dt), 1,
            bug_compat=self.config.bug_compat)

    def simulate(self, seconds: float, hz: float = 60.0) -> None:
        """Run physics headless at a fixed rate in one fused launch."""
        n = max(1, int(round(seconds * hz)))
        self.state = particles.multi_step(
            self.state, self.params, jnp.float32(self.time_scale / hz), n,
            bug_compat=self.config.bug_compat)

    def render(self, height: int = 600, width: int = 800) -> np.ndarray:
        fb = R.clear(height, width)
        cam = self.camera()
        segs = jnp.asarray(R.geometry.wireframe_box(
            float(self.params.bounds))).reshape(-1, 2, 3)
        fb = R.draw_lines(fb, cam, segs, color=(0.0, 0.0, 1.0))
        fb = R.draw_instanced_spheres(
            fb, cam, self.state.pos.T, float(self.params.radius), self.light,
            texture=self.texture, flat_color=None,
            chunk=min(512, max(8, self.state.pos.shape[-1])))
        return self._to_image(fb)


class ClothScene(_SceneBase):
    """Sim 5 flagship: mass-spring cloth over the lit/textured globe
    (ClothSimApp, cloth.rs:229-1502) with the full egui panel's runtime
    parameters and the substep schedule of App::update (cloth.rs:1458-1493).
    """

    def __init__(self, config=cfg.ClothConfig(), globe_texture=None,
                 particle_color=(1.0, 0.0, 0.0),
                 camera_cfg=cfg.CameraConfig(), light=cfg.LightConfig(),
                 aspect=1200 / 800, use_pallas: bool = True,
                 self_collide: bool = False):
        super().__init__(camera_cfg, light, aspect)
        self.config = config
        self.params = ClothParams.from_config(config)
        self.state = init_cloth_state(config)
        self.globe_texture = T.get("mesh") if globe_texture is None else globe_texture
        self.particle_color = particle_color
        self.time_scale = config.time_scale
        self.use_pallas = use_pallas
        # cloth-cloth contact (BASELINE configs[3]): frozen-window
        # spatial hash + slab-DMA narrow phase, an extension over the
        # reference (which lets the cloth pass through itself)
        self.self_collide = self_collide
        self._sc_grid = cloth.default_self_collision_grid(
            config, skin=2.0 * config.particle_radius)

    # --- egui sliders (cloth.rs:1409-1435) ---
    def set_gravity(self, g: float) -> None:
        self.params = self.params._replace(gravity=jnp.float32(g))

    def set_time_scale(self, s: float) -> None:
        self.time_scale = s

    def set_speed_damp(self, d: float) -> None:
        self.params = self.params._replace(speed_damp=jnp.float32(d))

    def set_particle_radius(self, r: float) -> None:
        """The radius slider RESETS the cloth in the reference (it rewrites
        the whole instance buffer — cloth.rs:1427-1435); reproduced here."""
        self.params = self.params._replace(particle_radius=jnp.float32(r))
        self.state = init_cloth_state(self.config)

    def pin(self, mask: np.ndarray) -> None:
        """Fixed-pin constraint extension: pin particles where mask is True
        at their current positions."""
        self.state = self.state._replace(
            pin_mask=jnp.asarray(mask), pin_pos=self.state.pos)

    def _stepper(self):
        if self.self_collide:
            return functools.partial(cloth.multi_step_self_collide,
                                     grid_spec=self._sc_grid,
                                     rebuild_every=8)
        if self.use_pallas:
            try:
                from ..ops import cloth_pallas
                return cloth_pallas.multi_step
            except Exception as e:
                from ..utils.metrics import get_logger

                get_logger().warning(
                    "Pallas stepper unavailable (%s: %s); falling back to "
                    "the XLA stencil path", type(e).__name__, e)
        return cloth.multi_step

    def update(self, delta_time: Optional[float] = None) -> None:
        dt = self.clock.tick()
        if delta_time is not None:
            dt = delta_time
        n, sub_dt = cloth.frame_substeps(dt, self.time_scale, self.config.hz,
                                         self.config.max_substeps)
        self.state = self._stepper()(self.state, self.params,
                                     jnp.float32(sub_dt), n)

    def simulate(self, seconds: float, hz: Optional[float] = None) -> None:
        """Run physics headless (no frame pacing): one fused launch."""
        hz = self.config.hz if hz is None else hz
        n = int(round(seconds * hz))
        self.state = self._stepper()(self.state, self.params,
                                     jnp.float32(1.0 / hz), n)

    def render(self, height: int = 800, width: int = 1200) -> np.ndarray:
        fb = R.clear(height, width)
        cam = self.camera()
        fb = R.draw_globe(fb, cam, float(self.params.globe_radius),
                          self.globe_texture, self.light)
        centers = self.state.pos.reshape(3, -1).T
        fb = R.draw_instanced_spheres(
            fb, cam, centers, float(self.params.particle_radius), self.light,
            flat_color=self.particle_color)
        return self._to_image(fb)

    @property
    def instance_count(self) -> int:  # egui label (cloth.rs:1448)
        return self.config.num_particles

    @property
    def spring_count(self) -> int:
        """egui "springs" info label (cloth.rs:1438-1448)."""
        from ..core import topology

        return sum(topology.spring_counts(self.config.height,
                                          self.config.width))


class GranularScene(_SceneBase):
    """Granular pile: the free-particle box (sim 4, C8) scaled from 10 to
    up to millions of spheres with real particle-particle contact via the
    sorted-grid broad-phase + slab-DMA Pallas kernel (BASELINE configs[2]
    — the reference's integrator has no interactions at all, see
    /root/reference/simulations/4_instances_imgui/compute_movement.wgsl:36-105).

    Geometry-shaping parameters live in the static
    :class:`granular.GranularConfig` (radius/bounds shape the broad-phase
    grid, so changing them recompiles — use :meth:`reconfigure`); the
    MATERIAL constants (``k_contact``/``gravity``/``restitution``) are
    runtime traced scalars riding the kernel's params vector, so their
    setters are zero-retrace like every other scene's sliders."""

    def __init__(self, config=None,
                 camera_cfg=None, light=cfg.LightConfig(),
                 aspect=800 / 600, seed: int = 0):
        from . import granular

        self._granular = granular
        config = config or granular.GranularConfig(num_particles=20_000)
        camera_cfg = camera_cfg or cfg.CameraConfig(
            radius=3.2 * config.bounds, phi=0.35, theta=0.4)
        super().__init__(camera_cfg, light, aspect)
        self.config = config
        self.state = granular.init_state(config, jax.random.key(seed))
        self.k_contact = jnp.float32(config.k_contact)
        self.gravity = jnp.float32(config.gravity)
        self.restitution = jnp.float32(config.restitution)
        self.time_scale = 1.0
        self.hz = 240.0
        self.max_substeps = 8         # clamp like cloth.frame_substeps —
        # n_steps is a static jit arg, so an unbounded wall-clock-derived
        # count would recompile every frame (30-60 s each on axon)
        self.dropped = 0              # broad-phase overflow telemetry

    # --- egui sliders (zero-retrace: traced kernel params vector) ---
    def set_gravity(self, g: float) -> None:
        self.gravity = jnp.float32(g)

    def set_k_contact(self, k: float) -> None:
        self.k_contact = jnp.float32(k)

    def set_restitution(self, e: float) -> None:
        self.restitution = jnp.float32(e)

    @property
    def params(self):
        """Viewer-facing material view (handle_key reads .gravity)."""
        import types

        return types.SimpleNamespace(gravity=self.gravity,
                                     k_contact=self.k_contact,
                                     restitution=self.restitution)

    def set_time_scale(self, s: float) -> None:
        self.time_scale = s

    def reconfigure(self, **changes) -> None:
        """Replace static physics config (recompiles; resets nothing).
        Material keys are redirected to the traced runtime scalars."""
        for key, setter in (("k_contact", self.set_k_contact),
                            ("gravity", self.set_gravity),
                            ("restitution", self.set_restitution)):
            if key in changes:
                setter(changes.pop(key))
        if changes:
            self.config = dataclasses.replace(self.config, **changes)

    def _advance(self, n: int) -> None:
        self.state, d = self._granular.multi_step(
            self.state, self.config, jnp.float32(1.0 / self.hz), n,
            return_stats=True, k_contact=self.k_contact,
            gravity=self.gravity, restitution=self.restitution)
        self.dropped = max(self.dropped, int(d))

    def update(self, delta_time: Optional[float] = None) -> None:
        dt = self.clock.tick()
        if delta_time is not None:
            dt = delta_time
        n = int(round(self.time_scale * dt * self.hz))
        self._advance(min(max(n, 1), self.max_substeps))

    def simulate(self, seconds: float, hz: Optional[float] = None) -> None:
        """Run physics headless in one fused launch (no substep clamp)."""
        if hz is not None:
            self.hz = hz
        self._advance(max(1, int(round(seconds * self.hz))))

    def render(self, height: int = 600, width: int = 800) -> np.ndarray:
        fb = R.clear(height, width)
        cam = self.camera()
        segs = jnp.asarray(R.geometry.wireframe_box(
            float(self.config.bounds))).reshape(-1, 2, 3)
        fb = R.draw_lines(fb, cam, segs, color=(0.0, 0.0, 1.0))
        fb = R.draw_instanced_spheres(
            fb, cam, self.state.pos.T, float(self.config.radius), self.light,
            flat_color=(0.86, 0.65, 0.35))      # sand
        return self._to_image(fb)

    @property
    def instance_count(self) -> int:
        return self.config.num_particles
