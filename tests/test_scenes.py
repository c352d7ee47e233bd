"""Scene/application-layer tests (L5/L6 parity): frame contract, runtime
sliders, datagen pipeline, checkpoint."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.models import scenes
from wgpu_physics_engine_tpu.parallel import datagen
from wgpu_physics_engine_tpu.utils import checkpoint


SMALL = dict(height=8, width=8)


def test_cloth_scene_frame_contract():
    s = scenes.ClothScene(config=cfg.ClothConfig(**SMALL), use_pallas=False)
    s.update(1.0 / 60.0)
    img = s.render(32, 48)
    assert img.shape == (32, 48, 3)
    assert np.isfinite(img).all()
    assert s.instance_count == 64


def test_cloth_scene_sliders_no_retrace():
    """Slider changes go through traced params — same compiled program."""
    s = scenes.ClothScene(config=cfg.ClothConfig(**SMALL), use_pallas=False)
    s.update(1.0 / 60.0)
    from wgpu_physics_engine_tpu.models import cloth
    n0 = cloth.multi_step._cache_size()
    s.set_gravity(-3.0)
    s.set_speed_damp(0.99)
    s.update(1.0 / 60.0)
    assert cloth.multi_step._cache_size() == n0


def test_cloth_radius_slider_resets_state():
    s = scenes.ClothScene(config=cfg.ClothConfig(**SMALL), use_pallas=False)
    s.simulate(0.5)
    moved = np.asarray(s.state.pos).copy()
    s.set_particle_radius(0.2)
    reset = np.asarray(s.state.pos)
    assert not np.array_equal(moved, reset)
    assert (reset[1] == np.float32(40.0)).all()   # back at spawn height


def test_scene_camera_and_light_controls():
    s = scenes.GlobeScene()
    s.orbit(d_theta=0.3, d_phi=0.1)
    s.set_zoom(25.0)
    s.set_light(ks=1.0, shininess=40.0, compute_specular=False)
    s.resize(400, 200)
    img = s.render(20, 40)
    assert img.shape == (20, 40, 3)


def test_free_particle_scene_updates():
    s = scenes.FreeParticleScene(config=cfg.FreeParticleConfig(num_particles=8))
    p0 = np.asarray(s.state.pos).copy()
    s.update(1.0 / 30.0)
    assert not np.array_equal(p0, np.asarray(s.state.pos))
    s.set_gravity((0.0, -2.0, 0.0))
    s.set_time_scale(0.5)
    s.update(1.0 / 30.0)
    img = s.render(24, 32)
    assert np.isfinite(img).all()


def test_datagen_batch_shapes_and_diversity():
    gen = datagen.generate_trajectory_dataset(
        cfg.ClothConfig(height=8, width=8), n_worlds=4, n_frames=2,
        steps_per_frame=4, key=jax.random.key(0), fb_size=(24, 24),
        use_pallas=False)
    frames = list(gen)
    assert len(frames) == 2
    _, imgs, batches = frames[-1]
    assert imgs.shape == (4, 24, 24, 3)
    # worlds differ (randomized spawn heights / stiffness)
    st = batches[0].state
    assert not np.array_equal(np.asarray(st.pos[0]), np.asarray(st.pos[1]))
    p = batches[0].params
    assert len(set(np.asarray(p.k_struct).tolist())) > 1


def test_datagen_pallas_batch_path():
    """Batched pallas stepper (lax.map over worlds) runs in interpret mode."""
    from wgpu_physics_engine_tpu.core.state import ClothParams
    batch = datagen.randomized_worlds(cfg.ClothConfig(height=8, width=8), 3,
                                      jax.random.key(1))
    from wgpu_physics_engine_tpu.ops import cloth_pallas
    out = cloth_pallas.multi_step(batch.state, batch.params,
                                  jnp.float32(1 / 480), 4, interpret=True)
    assert out.pos.shape == (3, 3, 8, 8)
    assert np.isfinite(np.asarray(out.pos)).all()


def test_checkpoint_roundtrip_scene_state(tmp_path):
    s = scenes.ClothScene(config=cfg.ClothConfig(**SMALL), use_pallas=False)
    s.simulate(0.25)
    path = str(tmp_path / "state.npz")
    checkpoint.save(path, s.state, {"sim_t": 0.25})
    restored, meta = checkpoint.load(path, s.state)
    np.testing.assert_array_equal(np.asarray(restored.pos), np.asarray(s.state.pos))
    assert meta["sim_t"] == 0.25


def test_checkpoint_mismatch_raises_named_error(tmp_path):
    """Loading against a differently-shaped/structured `like` raises
    CheckpointMismatchError, not an opaque unflatten failure."""
    import pytest

    s = scenes.ClothScene(config=cfg.ClothConfig(**SMALL), use_pallas=False)
    path = str(tmp_path / "state.npz")
    checkpoint.save(path, s.state)
    # shape mismatch: a bigger grid
    other = scenes.ClothScene(config=cfg.ClothConfig(height=16, width=16),
                              use_pallas=False)
    with pytest.raises(checkpoint.CheckpointMismatchError, match="pos"):
        checkpoint.load(path, other.state)
    # structure mismatch: a different pytree entirely
    with pytest.raises(checkpoint.CheckpointMismatchError):
        checkpoint.load(path, {"a": np.zeros(3), "b": np.zeros(4)})
    # dtype mismatch
    cast = jax.tree.map(lambda x: np.asarray(x, np.float64), s.state)
    with pytest.raises(checkpoint.CheckpointMismatchError, match="float64"):
        checkpoint.load(path, cast)
    # non-strict load still works for matching state
    restored, _ = checkpoint.load(path, s.state, strict=False)
    np.testing.assert_array_equal(np.asarray(restored.pos),
                                  np.asarray(s.state.pos))


def test_cloth_scene_renders_both_materials():
    """Perceptual check: a draped cloth frame contains both the red cloth
    particles and visible globe pixels (depth compositing works)."""
    s = scenes.ClothScene(config=cfg.ClothConfig(height=16, width=16),
                          use_pallas=False)
    s.simulate(5.0)
    img = s.render(96, 96)
    red = (img[..., 0] > 0.8) & (img[..., 1] < 0.3)
    assert red.sum() > 20                       # cloth visible
    grey = (img.std(axis=-1) < 0.05) & (img.sum(axis=-1) > 0.5)
    assert grey.sum() > 20                      # lit checkered globe visible


def test_orbit_input_clamps():
    """Mouse-drag orbit equivalent: phi clamps near the poles, radius stays
    positive (OrbitCamera input contract, SURVEY C17)."""
    s = scenes.GlobeScene()
    s.orbit(d_phi=10.0)
    assert abs(s._orbit["phi"]) <= 1.55
    s.orbit(d_radius=-1000.0)
    assert s._orbit["radius"] > 0
    img = s.render(16, 16)
    assert np.isfinite(img).all()


def test_datagen_randomized_cameras():
    """Per-world viewpoints: randomized batched cameras give distinct images
    of IDENTICAL states."""
    import jax.numpy as jnp
    from wgpu_physics_engine_tpu.parallel import datagen
    from wgpu_physics_engine_tpu.core.state import ClothParams, ClothState
    import wgpu_physics_engine_tpu as eng
    import jax

    c = cfg.ClothConfig(height=8, width=8)
    base = eng.init_cloth_state(c)
    batch = datagen.WorldBatch(
        state=ClothState(pos=jnp.stack([base.pos] * 3),
                         vel=jnp.stack([base.vel] * 3)),
        params=jax.tree.map(lambda x: jnp.broadcast_to(x, (3,)),
                            ClothParams.from_config(c)),
    )
    cams = datagen.randomized_cameras(3, jax.random.key(0))
    _, imgs = datagen.step_and_render(
        batch, jnp.float32(1 / 480), 1, cams,
        datagen.T.checkerboard(), fb_size=(24, 24), use_pallas=False)
    a, b = np.asarray(imgs[0]), np.asarray(imgs[1])
    assert not np.array_equal(a, b)     # same state, different viewpoint


def test_datagen_randomize_cameras_path():
    import jax
    from wgpu_physics_engine_tpu.parallel import datagen

    gen = datagen.generate_trajectory_dataset(
        cfg.ClothConfig(height=8, width=8), n_worlds=3, n_frames=1,
        steps_per_frame=2, key=jax.random.key(1), fb_size=(16, 16),
        use_pallas=False, randomize_cameras=True)
    _, imgs, _ = next(iter(gen))
    assert imgs.shape == (3, 16, 16, 3)
    assert not np.array_equal(imgs[0], imgs[1])


def test_granular_scene_frame_contract():
    """GranularScene: update/render/simulate contract + overflow telemetry
    surface (no reference equivalent — BASELINE configs[2] scene)."""
    import numpy as np
    from wgpu_physics_engine_tpu.models.granular import GranularConfig

    s = scenes.GranularScene(config=GranularConfig(num_particles=400,
                                                   bounds=3.0, radius=0.1))
    y0 = float(np.asarray(s.state.pos[1]).mean())
    s.update(1.0 / 30.0)
    s.simulate(0.2)
    assert float(np.asarray(s.state.pos[1]).mean()) < y0   # gravity acts
    img = s.render(90, 120)
    assert img.shape == (90, 120, 3) and np.isfinite(img).all()
    assert img.std() > 0.01                                # box + particles
    assert s.dropped == 0
    assert s.instance_count == 400
    s.set_time_scale(0.5)
    # material keys are redirected to the traced runtime scalars (zero
    # retrace), NOT the static config — scenes.GranularScene.reconfigure
    orig_k = s.config.k_contact
    s.reconfigure(k_contact=1000.0)
    assert float(s.k_contact) == 1000.0
    assert s.config.k_contact == orig_k


def test_cloth_scene_self_collide():
    """ClothScene(self_collide=True) steps through the frozen-window
    self-collision path and stays finite."""
    import numpy as np

    s = scenes.ClothScene(config=cfg.ClothConfig(height=12, width=12),
                          self_collide=True)
    s.update(1.0 / 60.0)
    s.simulate(0.05)
    assert np.isfinite(np.asarray(s.state.pos)).all()
    img = s.render(60, 90)
    assert np.isfinite(img).all()


def test_granular_scene_material_sliders_no_retrace():
    """GranularScene material setters are zero-retrace (traced kernel
    params vector), and reconfigure() redirects material keys there."""
    from wgpu_physics_engine_tpu.models import granular, scenes as sc

    s = sc.GranularScene(config=granular.GranularConfig(
        num_particles=400, rebuild_every=4, pallas_block=128,
        pallas_slab=256, grid_capacity=16))
    s.update(1.0 / 60.0)
    n0 = granular.multi_step._cache_size()
    s.set_gravity(-3.0)
    s.set_k_contact(900.0)
    s.set_restitution(0.8)
    s.update(1.0 / 60.0)
    assert granular.multi_step._cache_size() == n0
    cfg0 = s.config
    s.reconfigure(gravity=-2.0, k_contact=500.0)
    assert s.config is cfg0                      # static config untouched
    assert float(s.gravity) == -2.0 and float(s.k_contact) == 500.0
    s.update(1.0 / 60.0)
    assert granular.multi_step._cache_size() == n0
