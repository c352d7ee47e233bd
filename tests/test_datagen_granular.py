"""Granular datagen (parallel/datagen_granular.py): per-world materials,
chunking incl. remainder, codec path, render sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.models import granular
from wgpu_physics_engine_tpu.parallel import datagen_granular as dgg

CFG = granular.GranularConfig(num_particles=200, bounds=1.0, radius=0.05,
                              rebuild_every=4, pallas_block=128,
                              pallas_slab=256, grid_capacity=16)


def test_dataset_shapes_and_remainder_chunk():
    """3 worlds with chunk 2 must yield ALL 3 worlds (remainder chunk),
    uint8 images with sand spheres and box lines actually rendered."""
    frames = list(dgg.generate_granular_dataset(
        CFG, n_worlds=3, n_frames=2, steps_per_frame=2,
        key=jax.random.PRNGKey(0), fb_size=(64, 64), world_chunk=2))
    assert [f for f, _, _ in frames] == [0, 1]
    for _, imgs, batches in frames:
        assert imgs.shape == (3, 64, 64, 3) and imgs.dtype == np.uint8
    assert sum(b.state.pos.shape[0] for b in batches) == 3
    img = frames[-1][1][0].astype(np.float32) / 255.0
    # sand-colored sphere pixels (R>G>B warm tones) and blue box lines
    warm = (img[..., 0] > 0.5) & (img[..., 0] > img[..., 2] + 0.2)
    blue = (img[..., 2] > 0.5) & (img[..., 0] < 0.3)
    assert warm.sum() > 20 and blue.sum() > 10


def test_per_world_materials_change_physics():
    """Same initial state, different gravity/stiffness per world ->
    different trajectories out of ONE compiled program."""
    base = granular.init_state(CFG, jax.random.PRNGKey(1))
    b = 3
    batch = dgg.GranularWorldBatch(
        state=jax.tree.map(lambda x: jnp.stack([x] * b), base),
        k_contact=jnp.float32(CFG.k_contact) * jnp.array([1.0, 1.0, 2.0]),
        gravity=jnp.float32(CFG.gravity) * jnp.array([1.0, 0.5, 1.0]),
        restitution=jnp.full((b,), CFG.restitution, jnp.float32))
    from wgpu_physics_engine_tpu import render as R
    from wgpu_physics_engine_tpu.core import config as ccfg

    cam = R.make_camera(ccfg.CameraConfig(radius=3.2 * CFG.bounds),
                        aspect=1.0)
    out, _ = dgg.granular_step_and_render(
        batch, CFG, jnp.float32(1 / 240), 8, cam, fb_size=(64, 64))
    p = np.asarray(out.state.pos)
    assert not np.array_equal(p[0], p[1])      # gravity differs
    assert not np.array_equal(p[0], p[2])      # stiffness differs
    # world 0 ran the exact production physics for its materials
    ref = granular.multi_step(base, CFG, jnp.float32(1 / 240), 8)
    np.testing.assert_array_equal(p[0], np.asarray(ref.pos))


def test_codec_path_shapes():
    frames = list(dgg.generate_granular_dataset(
        CFG, n_worlds=2, n_frames=1, steps_per_frame=1,
        key=jax.random.PRNGKey(2), fb_size=(64, 64), codec_k=8,
        randomize_cameras=True))
    _, enc, _ = frames[0]
    assert enc.shape == (2, 8, 8, 3, 8) and enc.dtype == np.int8
    from wgpu_physics_engine_tpu.parallel import codec

    dec = np.asarray(codec.decode(jnp.asarray(enc)))
    assert dec.shape == (2, 64, 64, 3)
