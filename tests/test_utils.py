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


def test_parse_keys_arrows_and_chars():
    keys = viewer.parse_keys(b"\x1b[Aq+\x1b[D g")
    assert keys == ["up", "q", "+", "left", " ", "g"]


def test_live_key_dispatch_drives_scene():
    """The live-loop key table steers orbit/zoom and the zero-retrace
    sliders (the reference's mouse-orbit + egui inputs, cloth.rs:1383-1451,
    1497-1499)."""
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.models import scenes

    s = scenes.ClothScene(config=cfg.ClothConfig(height=4, width=4),
                          use_pallas=False)
    th0, r0 = s._orbit["theta"], s._orbit["radius"]
    assert viewer.handle_key(s, "left") is None
    assert s._orbit["theta"] == pytest.approx(th0 - 0.15)
    viewer.handle_key(s, "up")
    viewer.handle_key(s, "+")
    assert s._orbit["radius"] < r0
    g0 = float(np.asarray(s.params.gravity))
    viewer.handle_key(s, "G")
    assert float(np.asarray(s.params.gravity)) == pytest.approx(g0 * 1.1)
    ts0 = s.time_scale
    viewer.handle_key(s, "t")
    assert s.time_scale == pytest.approx(ts0 * 0.8)
    assert viewer.handle_key(s, " ") == "pause"
    assert viewer.handle_key(s, "q") == "quit"
    assert viewer.handle_key(s, "z") is None   # unbound key is a no-op


def test_live_key_dispatch_full_panel():
    """Every remaining egui control is key-reachable: light azimuth /
    shininess / ks / specular toggle (globe.rs:491-545), speed damping and
    the state-resetting particle-radius slider (cloth.rs:1409-1435)."""
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.models import scenes

    s = scenes.ClothScene(config=cfg.ClothConfig(height=4, width=4),
                          use_pallas=False)
    p0 = np.asarray(s.light.position)
    viewer.handle_key(s, "L")
    p1 = np.asarray(s.light.position)
    assert not np.allclose(p0, p1)
    assert np.linalg.norm(p1) == pytest.approx(np.linalg.norm(p0), rel=1e-5)
    assert p1[1] == p0[1]                      # azimuth only: y fixed
    sh0 = s.light.shininess
    viewer.handle_key(s, "S")
    assert s.light.shininess == pytest.approx(min(sh0 * 1.25, 256.0))
    ks0 = s.light.ks
    viewer.handle_key(s, "k")
    assert s.light.ks == pytest.approx(max(ks0 - 0.1, 0.0))
    assert s.light.compute_specular
    viewer.handle_key(s, "x")
    assert not s.light.compute_specular
    d0 = float(np.asarray(s.params.speed_damp))
    viewer.handle_key(s, "d")
    assert float(np.asarray(s.params.speed_damp)) == pytest.approx(d0 / 1.02)
    # radius resets the cloth state, like the reference's slider
    s.state = s.state._replace(pos=s.state.pos + 1.0)
    r0 = float(np.asarray(s.params.particle_radius))
    viewer.handle_key(s, "R")
    assert float(np.asarray(s.params.particle_radius)) == pytest.approx(r0 * 1.1)
    from wgpu_physics_engine_tpu.core.state import init_cloth_state

    np.testing.assert_array_equal(np.asarray(s.state.pos),
                                  np.asarray(init_cloth_state(s.config).pos))


def test_status_line_readouts():
    """The status line carries the reference's egui info labels
    (cloth.rs:1438-1448): fps, instance count, spring count."""
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.core.topology import spring_counts
    from wgpu_physics_engine_tpu.models import scenes

    s = scenes.ClothScene(config=cfg.ClothConfig(height=4, width=4),
                          use_pallas=False)
    line = viewer.status_line(s, paused=True)
    assert "inst 16" in line
    assert f"springs {sum(spring_counts(4, 4))}" in line
    assert "[paused]" in line
    g = scenes.GlobeScene()
    line = viewer.status_line(g)
    assert f"verts {g.mesh.positions.shape[0]}" in line


def test_live_noninteractive_runs(capsys):
    """live() with interactive=False streams frames and exits cleanly
    (no tty required)."""
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.models import scenes

    s = scenes.ClothScene(config=cfg.ClothConfig(height=4, width=4),
                          use_pallas=False)
    viewer.live(s, seconds=0.2, fps=10, size=(16, 16), max_cols=16,
                interactive=False)
    out = capsys.readouterr().out
    assert "fps" in out and "\x1b[38;2;" in out


def test_parse_events_sgr_mouse():
    """SGR 1006 mouse sequences decode into ('mouse', b, x, y, pressed)
    tuples interleaved with key tokens; malformed sequences degrade to
    characters; parse_keys drops mouse events (back-compat)."""
    buf = (b"\x1b[<0;10;5M"          # left press at (10, 5)
           b"q"
           b"\x1b[<32;12;4M"         # left drag to (12, 4)
           b"\x1b[<0;12;4m"          # release
           b"\x1b[<64;1;1M"          # wheel up
           b"\x1b[A")
    ev = viewer.parse_events(buf)
    assert ev == [("mouse", 0, 10, 5, True), "q",
                  ("mouse", 32, 12, 4, True), ("mouse", 0, 12, 4, False),
                  ("mouse", 64, 1, 1, True), "up"]
    assert viewer.parse_keys(buf) == ["q", "up"]
    # malformed: missing terminator / non-numeric fields -> plain chars
    assert all(isinstance(e, str) for e in viewer.parse_events(b"\x1b[<0;x;2M"))


def test_parse_events_carries_split_escape():
    """An SGR sequence split across a 256-byte os.read boundary must not
    degrade to literal chars (dropping the event): parse_events returns
    the incomplete tail, the caller prepends it to the next read."""
    whole = b"q\x1b[<32;120;45M\x1b[A"
    for cut in range(1, len(whole)):
        a, b = whole[:cut], whole[cut:]
        ev1, rest = viewer.parse_events(a, return_rest=True)
        ev2, rest2 = viewer.parse_events(rest + b, return_rest=True)
        assert ev1 + ev2 == [
            "q", ("mouse", 32, 120, 45, True), "up"], f"cut={cut}"
        assert rest2 == b""
    # complete buffers leave no remainder and match the plain call
    ev, rest = viewer.parse_events(whole, return_rest=True)
    assert rest == b"" and ev == viewer.parse_events(whole)
    # a bare trailing ESC is held back, not emitted as a char
    ev, rest = viewer.parse_events(b"g\x1b", return_rest=True)
    assert ev == ["g"] and rest == b"\x1b"


def test_live_key_light_xyz():
    """Per-axis light position keys u/U i/I o/O mirror the reference's
    Light X/Y/Z sliders (cloth.rs:1400-1402)."""
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.models import scenes

    s = scenes.ClothScene(config=cfg.ClothConfig(height=4, width=4),
                          use_pallas=False)
    p0 = [float(v) for v in s.light.position]
    for key, axis, d in (("u", 0, -1.0), ("U", 0, +1.0), ("i", 1, -1.0),
                         ("I", 1, +1.0), ("o", 2, -1.0), ("O", 2, +1.0)):
        before = [float(v) for v in s.light.position]
        assert viewer.handle_key(s, key) is None
        after = [float(v) for v in s.light.position]
        assert after[axis] == pytest.approx(before[axis] + d)
        for other in range(3):
            if other != axis:
                assert after[other] == before[other]
    assert [float(v) for v in s.light.position] == pytest.approx(p0)


def test_mouse_drag_orbits_scene():
    """Left-drag orbits the camera (the reference's OrbitCamera mouse
    input, cloth.rs:1497-1499) and the wheel zooms; release ends the
    drag so the next press doesn't jump."""
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.models import scenes

    s = scenes.ClothScene(config=cfg.ClothConfig(height=4, width=4),
                          use_pallas=False)
    drag = {}
    th0, ph0, r0 = (s._orbit[k] for k in ("theta", "phi", "radius"))
    viewer.handle_mouse(s, ("mouse", 0, 10, 5, True), drag)      # press
    assert s._orbit["theta"] == th0                              # no jump
    viewer.handle_mouse(s, ("mouse", 32, 13, 4, True), drag)     # drag
    assert s._orbit["theta"] == pytest.approx(th0 + 0.04 * 3)
    assert s._orbit["phi"] == pytest.approx(ph0 + 0.08)
    viewer.handle_mouse(s, ("mouse", 0, 13, 4, False), drag)     # release
    assert not drag
    viewer.handle_mouse(s, ("mouse", 32, 20, 9, True), drag)     # new drag
    th1 = s._orbit["theta"]
    viewer.handle_mouse(s, ("mouse", 32, 20, 9, True), drag)
    assert s._orbit["theta"] == th1                              # no motion
    viewer.handle_mouse(s, ("mouse", 64, 1, 1, True), drag)      # wheel up
    assert s._orbit["radius"] == pytest.approx(r0 * 0.9)
    viewer.handle_mouse(s, ("mouse", 65, 1, 1, True), drag)      # wheel dn
    assert s._orbit["radius"] == pytest.approx(r0 * 0.9 * 1.1)


def test_mouse_wheel_with_modifiers_still_zooms():
    """Shift/ctrl-wheel (modifier bits 4/16 set) must zoom like plain
    wheel — terminals often forward only modified wheel events when the
    plain wheel is bound to scrollback."""
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.models import scenes

    s = scenes.ClothScene(config=cfg.ClothConfig(height=4, width=4),
                          use_pallas=False)
    r0 = s._orbit["radius"]
    viewer.handle_mouse(s, ("mouse", 68, 1, 1, True), {})   # shift-wheel up
    assert s._orbit["radius"] == pytest.approx(r0 * 0.9)
    viewer.handle_mouse(s, ("mouse", 81, 1, 1, True), {})   # ctrl-wheel dn
    assert s._orbit["radius"] == pytest.approx(r0 * 0.9 * 1.1)
