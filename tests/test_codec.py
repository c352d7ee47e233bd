"""Fixed-rate DCT codec (parallel/codec.py): round-trip fidelity, shapes,
and datagen integration. The codec exists for datagen egress (the reference
has no export path; SURVEY §2 C2 is a single interactive window)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wgpu_physics_engine_tpu.parallel import codec


def _smooth_image(h=64, w=64, seed=0):
    """Smooth synthetic frame (renderered framebuffers are smooth)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        128 + 100 * np.sin(2 * np.pi * xx / w + c) * np.cos(2 * np.pi * yy / h)
        for c in range(3)
    ], axis=-1)
    img += rng.normal(0, 2.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_shapes_and_dtype():
    img = _smooth_image(64, 96)
    enc = codec.encode(jnp.asarray(img), k=16)
    assert enc.shape == (8, 12, 3, 16)
    assert enc.dtype == jnp.int8
    # batched (datagen layout [B, H, W, C])
    batch = jnp.stack([jnp.asarray(img)] * 4)
    encb = codec.encode(batch, k=10)
    assert encb.shape == (4, 8, 12, 3, 10)
    # per-image encode matches the batched encode
    np.testing.assert_array_equal(np.asarray(encb[0]), np.asarray(enc[..., :10]))


def test_roundtrip_psnr_smooth():
    img = _smooth_image()
    for k, floor in [(8, 28.0), (16, 32.0), (32, 36.0)]:
        enc = codec.encode(jnp.asarray(img), k=k)
        dec = codec.decode(np.asarray(enc))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        p = codec.psnr(img, dec)
        assert p > floor, f"k={k}: PSNR {p:.1f} dB < {floor}"


def test_k64_near_lossless_smooth():
    """All 64 coefficients kept: only quantization error remains, which the
    JPEG table bounds tightly at low frequencies on smooth content."""
    img = _smooth_image()
    dec = codec.decode(np.asarray(codec.encode(jnp.asarray(img), k=64)))
    assert codec.psnr(img, dec) > 38.0


def test_flat_image_near_exact():
    """A constant image is a DC-only block: round-trips to within the DC
    quantization step (16/8 = 2 gray levels)."""
    img = np.full((32, 32, 3), 77, np.uint8)
    dec = codec.decode(np.asarray(codec.encode(jnp.asarray(img), k=4)))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2
    assert (dec == dec.flat[0]).all()       # still perfectly flat


def test_compression_ratio():
    img = _smooth_image(256, 256)
    enc = np.asarray(codec.encode(jnp.asarray(img), k=16))
    assert img.nbytes / enc.nbytes == 4.0   # 64/16


def test_quality_knob_monotone():
    img = _smooth_image()
    coarse = codec.decode(np.asarray(codec.encode(jnp.asarray(img), k=32,
                                                  quality=4.0)), quality=4.0)
    fine = codec.decode(np.asarray(codec.encode(jnp.asarray(img), k=32,
                                                quality=1.0)), quality=1.0)
    assert codec.psnr(img, fine) > codec.psnr(img, coarse)


def test_datagen_codec_integration():
    """End-to-end: generate_trajectory_dataset(codec_k=...) yields int8
    coefficient tensors that decode to plausible frames."""
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.parallel import datagen

    c = cfg.ClothConfig(height=8, width=8)
    gen = datagen.generate_trajectory_dataset(
        c, n_worlds=2, n_frames=2, steps_per_frame=2,
        key=jax.random.key(0), fb_size=(32, 32), use_pallas=False,
        codec_k=12)
    frames = list(gen)
    assert len(frames) == 2
    for f, enc, _ in frames:
        assert enc.shape == (2, 4, 4, 3, 12) and enc.dtype == np.int8
        dec = codec.decode(enc)
        assert dec.shape == (2, 32, 32, 3)
        assert dec.std() > 1.0          # not a blank frame


def test_zigzag_is_permutation():
    zz = codec._zigzag_order()
    assert sorted(zz.tolist()) == list(range(64))
    # standard JPEG zigzag prefix
    assert zz[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


def test_datagen_zero_frames():
    """n_frames=0 yields nothing (regression: the transfer-overlap change
    made the final flush unpack None)."""
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.parallel import datagen

    gen = datagen.generate_trajectory_dataset(
        cfg.ClothConfig(height=8, width=8), n_worlds=2, n_frames=0,
        steps_per_frame=1, key=jax.random.key(0), fb_size=(16, 16),
        use_pallas=False)
    assert list(gen) == []


def test_cli_datagen_decode_roundtrip(tmp_path):
    """End-to-end CLI: datagen --codec-k at a NON-default quality writes
    int8 shards + a codec_meta.json sidecar; decode needs no flags (the
    sidecar is the source of truth) and refuses a contradicting --quality.
    Runs in a CPU-forced subprocess (the harness sitecustomize would
    otherwise grab the TPU)."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS",)}
    env["JAX_PLATFORMS"] = "cpu"
    enc_dir, dec_dir = str(tmp_path / "enc"), str(tmp_path / "dec")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "wgpu_physics_engine_tpu", "datagen",
         "--worlds", "2", "--frames", "1", "--size", "32", "32",
         "--codec-k", "12", "--quality", "2.5", "--outdir", enc_dir],
        env=env, cwd=root, capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    meta = codec.read_meta(enc_dir)
    assert meta["k"] == 12 and meta["quality"] == 2.5
    r = subprocess.run(
        [sys.executable, "-m", "wgpu_physics_engine_tpu", "decode",
         "--indir", enc_dir, "--outdir", dec_dir],
        env=env, cwd=root, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    out = np.load(os.path.join(dec_dir, "frame_00000_rgb.npy"))
    assert out.shape == (2, 32, 32, 3) and out.dtype == np.uint8
    # quality came from the sidecar, not a default: pixels match a direct
    # decode at 2.5 and differ from one at 1.0
    enc = np.load(os.path.join(enc_dir, "frame_00000.npy"))
    np.testing.assert_array_equal(out, codec.decode(enc, quality=2.5))
    assert not np.array_equal(out, codec.decode(enc, quality=1.0))
    # contradicting flag refused; --force-quality overrides
    r = subprocess.run(
        [sys.executable, "-m", "wgpu_physics_engine_tpu", "decode",
         "--indir", enc_dir, "--outdir", dec_dir, "--quality", "1.0"],
        env=env, cwd=root, capture_output=True, text=True, timeout=300)
    assert r.returncode == 1 and "disagrees" in r.stdout
    # missing sidecar refused without --force-quality
    os.remove(os.path.join(enc_dir, "codec_meta.json"))
    r = subprocess.run(
        [sys.executable, "-m", "wgpu_physics_engine_tpu", "decode",
         "--indir", enc_dir, "--outdir", dec_dir],
        env=env, cwd=root, capture_output=True, text=True, timeout=300)
    assert r.returncode == 1 and "sidecar" in r.stdout


def test_meta_sidecar_roundtrip(tmp_path):
    codec.write_meta(str(tmp_path), k=9, quality=3.0, fb_size=(64, 48))
    meta = codec.read_meta(str(tmp_path))
    assert meta == {"codec_version": codec.CODEC_VERSION, "k": 9,
                    "quality": 3.0, "fb_size": [64, 48]}
    with pytest.raises(FileNotFoundError):
        codec.read_meta(str(tmp_path / "nope"))


def test_datagen_batched_prologue_matches_per_world():
    """The vmapped raster-binning prologue + per-world kernel launches
    (batch_binned=True, interpret mode on CPU) produce the same frames as
    the plain per-world render path."""
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.parallel import datagen

    c = cfg.ClothConfig(height=8, width=8)
    batch = datagen.randomized_worlds(c, 3, jax.random.key(1))
    cams = datagen.randomized_cameras(3, jax.random.key(2))
    from wgpu_physics_engine_tpu.render import texture as T

    tex = T.checkerboard(size=32)
    dt = jnp.float32(1 / 480)
    _, imgs_b = datagen.step_and_render(
        batch, dt, 2, cams, tex, fb_size=(16, 128), use_pallas=False,
        batch_binned=True)
    _, imgs_p = datagen.step_and_render(
        batch, dt, 2, cams, tex, fb_size=(16, 128), use_pallas=False,
        batch_binned=False)
    diff = np.abs(np.asarray(imgs_b).astype(int) - np.asarray(imgs_p).astype(int))
    assert diff.max() <= 1         # fp-order-only differences round to ±1


def test_datagen_cached_globe_matches_fresh():
    """base_fb (the static globe+background render cached across frames)
    composites bit-identically to rendering the globe per frame, in every
    operand combination of the packed lax.map dispatch (with/without the
    batched binning prologue)."""
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.parallel import datagen
    from wgpu_physics_engine_tpu.render import texture as T

    c = cfg.ClothConfig(height=8, width=8)
    batch = datagen.randomized_worlds(c, 3, jax.random.key(3))
    cams = datagen.randomized_cameras(3, jax.random.key(4))
    tex = T.checkerboard(size=32)
    dt = jnp.float32(1 / 480)
    base = datagen.globe_base_fbs(cams, batch.params, tex,
                                  fb_size=(16, 128))
    for binned in (False, True):
        _, fresh = datagen.step_and_render(
            batch, dt, 2, cams, tex, fb_size=(16, 128), use_pallas=False,
            batch_binned=binned)
        _, cached = datagen.step_and_render(
            batch, dt, 2, cams, tex, fb_size=(16, 128), use_pallas=False,
            batch_binned=binned, base_fb=base)
        np.testing.assert_array_equal(np.asarray(cached),
                                      np.asarray(fresh))


def test_texture_get_max_size_mips():
    """max_size box-downsamples committed assets (datagen's cache-size
    lever) and leaves the full-resolution load untouched."""
    from wgpu_physics_engine_tpu.render import texture as T

    full = T.get("mesh")
    mip = T.get("mesh", max_size=256)
    assert full.shape[0] > 256 and mip.shape[:2] == (256, 256)
    # the mip is the box filter of the full texture
    h2, w2 = mip.shape[0], mip.shape[1]
    box = np.asarray(full).reshape(h2, full.shape[0] // h2, w2,
                                   full.shape[1] // w2, 3).mean((1, 3))
    np.testing.assert_allclose(np.asarray(mip), box, atol=1e-6)


def test_datagen_cached_globe_matches_per_frame():
    """cache_globe=True (globe+background rendered once per world and
    composited under every frame) must produce the same images as
    re-rendering the globe per frame — same compositing inputs, only
    cross-frame reuse changes (uint8 may differ by 1 on XLA-fusion
    rounding boundaries)."""
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.parallel import datagen

    kw = dict(n_worlds=3, n_frames=2, steps_per_frame=2,
              key=jax.random.key(2), fb_size=(16, 16), use_pallas=False,
              randomize_cameras=True)
    c = cfg.ClothConfig(height=8, width=8)
    a = [im for _, im, _ in
         datagen.generate_trajectory_dataset(c, cache_globe=True, **kw)]
    b = [im for _, im, _ in
         datagen.generate_trajectory_dataset(c, cache_globe=False, **kw)]
    for ia, ib in zip(a, b):
        diff = np.abs(ia.astype(np.int16) - ib.astype(np.int16))
        assert diff.max() <= 1
        # the globe must actually be IN the cached-path frames (not a
        # cleared background): some non-background pixels exist
        assert (ia.reshape(3, -1, 3) != ia[:, :1, :1]).any()


def test_datagen_world_chunk_remainder():
    """Requesting n_worlds not divisible by world_chunk generates ALL
    worlds via a final short chunk (regression: 100 worlds with chunk 64
    used to silently produce 64)."""
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.parallel import datagen

    gen = datagen.generate_trajectory_dataset(
        cfg.ClothConfig(height=8, width=8), n_worlds=5, n_frames=1,
        steps_per_frame=1, key=jax.random.key(0), fb_size=(16, 16),
        world_chunk=3, use_pallas=False)
    frames = list(gen)
    assert len(frames) == 1
    _, imgs, batches = frames[0]
    assert imgs.shape[0] == 5
    assert [b.state.pos.shape[0] for b in batches] == [3, 2]


def test_cli_decode_raw_dir_skips_cleanly(tmp_path):
    """A datagen run WITHOUT --codec-k writes raw uint8 shards and no
    sidecar; decode must skip them with rc 0 (nothing to decode), not
    demand --force-quality for a quality that would never be used."""
    import os
    import subprocess
    import sys

    indir = tmp_path / "raw"
    indir.mkdir()
    np.save(indir / "frame_00000.npy",
            np.zeros((2, 8, 8, 3), np.uint8))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS",)}
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "wgpu_physics_engine_tpu", "decode",
         "--indir", str(indir), "--outdir", str(tmp_path / "out")],
        env=env, cwd=root, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "skip" in r.stdout


def test_cli_decode_version_mismatch_clean_error(tmp_path):
    """A future codec_version in the sidecar must produce the clean
    one-line refusal (rc 1), not an uncaught traceback."""
    import json
    import os
    import subprocess
    import sys

    indir = tmp_path / "enc"
    indir.mkdir()
    np.save(indir / "frame_00000.npy",
            np.zeros((2, 1, 1, 3, 4), np.int8))
    (indir / "codec_meta.json").write_text(json.dumps(
        {"codec_version": 999, "k": 4, "quality": 1.0}))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS",)}
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "wgpu_physics_engine_tpu", "decode",
         "--indir", str(indir), "--outdir", str(tmp_path / "out")],
        env=env, cwd=root, capture_output=True, text=True, timeout=300)
    assert r.returncode == 1, (r.stdout, r.stderr[-2000:])
    assert "codec_version" in r.stdout
    assert "Traceback" not in r.stderr
