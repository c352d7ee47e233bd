"""utils: debug (failure detection), metrics, viewer, CLI."""

import numpy as np
import jax.numpy as jnp
import pytest

from wgpu_physics_engine_tpu.utils import debug, metrics, viewer


def test_assert_finite_passes_and_raises():
    debug.assert_finite({"a": jnp.ones(3)})
    with pytest.raises(ValueError, match="non-finite"):
        debug.assert_finite({"a": jnp.array([1.0, np.nan])})


def test_checked_wrapper_raises_on_nan():
    def bad_step(state):
        return state * jnp.float32(np.inf)

    wrapped = debug.checked(bad_step)
    with pytest.raises(FloatingPointError):
        np.asarray(wrapped(jnp.ones(4)))


def test_find_nan_step():
    def step(x):
        # goes non-finite at step 7 (value overflows float32 at 2^128)
        return x * 1e5

    idx = debug.find_nan_step(step, jnp.float32(1.0), 32, chunk=4)
    assert idx == 7


def test_meter_rates():
    m = metrics.Meter()
    for _ in range(5):
        m.add("frames")
        m.add("particle_steps", 100.0)
    assert m.totals["frames"] == 5
    assert "frames" in m.summary()


def test_viewer_png_gif(tmp_path):
    img = np.random.rand(8, 8, 3).astype(np.float32)
    viewer.save_png(img, str(tmp_path / "a.png"))
    viewer.save_gif([img, img * 0.5], str(tmp_path / "a.gif"), fps=5)
    assert (tmp_path / "a.png").exists()
    assert (tmp_path / "a.gif").exists()


def test_cli_single_frame(tmp_path):
    from wgpu_physics_engine_tpu.__main__ import main

    out = str(tmp_path / "cube.png")
    assert main(["cube", "--out", out, "--size", "24", "32"]) == 0
    from PIL import Image

    assert Image.open(out).size == (32, 24)


def test_cli_datagen(tmp_path):
    from wgpu_physics_engine_tpu.__main__ import main

    outdir = str(tmp_path / "dg")
    assert main(["datagen", "--worlds", "2", "--frames", "1", "--grid", "8",
                 "--size", "16", "16", "--outdir", outdir]) == 0
    import os
    files = os.listdir(outdir)
    assert any(f.endswith(".npy") for f in files)
    arr = np.load(os.path.join(outdir, sorted(files)[0]))
    assert arr.shape == (2, 16, 16, 3)

def test_ansi_frame_renders():
    img = np.zeros((16, 16, 3), np.float32)
    img[:8, :, 0] = 1.0                       # top half red
    s = viewer.ansi_frame(img, max_cols=16)
    assert "\x1b[38;2;255;0;0m" in s          # red foreground (top pixels)
    assert s.count("\n") == 7                 # 16 rows → 8 char lines
