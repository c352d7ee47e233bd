"""Slab-DMA granular kernel (ops/granular_pallas.py) vs the XLA frozen
path and brute force. Runs in Pallas interpret mode on the CPU test mesh
(same pattern as test_cloth_pallas.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core.state import ParticleState
from wgpu_physics_engine_tpu.models import granular


def _brute_step(pos, vel, cfg, dt):
    """O(N^2) reference with models/granular._frozen_substep semantics:
    penalty contact -> gravity -> Euler -> wall clamp & reflect."""
    n = pos.shape[1]
    d = pos[:, :, None] - pos[:, None, :]
    dist = np.sqrt((d * d).sum(axis=0))
    min_dist = 2.0 * cfg.radius
    touching = (dist < min_dist) & (dist > 1e-6)
    np.fill_diagonal(touching, False)
    inv = 1.0 / np.where(dist > 1e-6, dist, 1.0)
    w = np.where(touching, cfg.k_contact * (min_dist - dist) * inv, 0.0)
    force = (w[None] * d).sum(axis=2)
    force[1] += cfg.gravity
    vel = vel + force * dt
    pos = pos + vel * dt
    limit = cfg.bounds - cfg.radius
    hit = ((pos < -limit) & (vel < 0)) | ((pos > limit) & (vel > 0))
    vel = np.where(hit, -cfg.restitution * vel, vel)
    pos = np.clip(pos, -limit, limit)
    return pos, vel


def test_pallas_matches_xla_frozen():
    """Same frozen-window schedule, slab kernel vs gather path — identical
    candidate sets, so results agree to accumulation-order noise. N=500 is
    not a multiple of pallas_block (padding exercised) and 6 steps is not
    a multiple of rebuild_every=4 (remainder block exercised)."""
    cfg = granular.GranularConfig(
        num_particles=500, bounds=2.0, radius=0.08, restitution=0.4,
        rebuild_every=4, window=64, max_neighbors=96,
        pallas_block=128, pallas_slab=512)
    state = granular.init_state(cfg, jax.random.PRNGKey(0))
    dt = jnp.float32(1 / 240)
    out_x, drop_x = granular.multi_step(state, cfg, dt, 6,
                                        return_stats=True, backend="xla")
    out_p, drop_p = granular.multi_step(state, cfg, dt, 6,
                                        return_stats=True, backend="pallas")
    assert int(drop_x) == 0 and int(drop_p) == 0
    np.testing.assert_allclose(np.asarray(out_p.pos), np.asarray(out_x.pos),
                               atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(out_p.vel), np.asarray(out_x.vel),
                               atol=1e-4, rtol=0)


def test_civ_kernel_matches_windows_bitwise():
    """CIV mode (cid-interval validity, the default) admits EXACTLY the
    window formulation's candidate sets — same slab offsets away from
    grid borders, and border blocks only scan extra always-invalid lanes
    whose contribution is an exact +0.0 — so positions and velocities
    must match BITWISE, not just to tolerance."""
    base = dict(num_particles=1500, bounds=2.0, radius=0.08,
                restitution=0.4, rebuild_every=4, pallas_block=128,
                pallas_slab=512)
    cfg_w = granular.GranularConfig(**base, civ=False)
    cfg_c = granular.GranularConfig(**base, civ=True)
    state = granular.init_state(cfg_w, jax.random.PRNGKey(7))
    dt = jnp.float32(1 / 240)
    out_w = granular.multi_step(state, cfg_w, dt, 6, backend="pallas")
    out_c, drop_c = granular.multi_step(state, cfg_c, dt, 6,
                                        return_stats=True, backend="pallas")
    assert int(drop_c) == 0
    np.testing.assert_array_equal(np.asarray(out_c.pos),
                                  np.asarray(out_w.pos))
    np.testing.assert_array_equal(np.asarray(out_c.vel),
                                  np.asarray(out_w.vel))
    # fast-mode (no stats) must produce the same physics
    out_f = granular.multi_step(state, cfg_c, dt, 6, backend="pallas")
    np.testing.assert_array_equal(np.asarray(out_f.pos),
                                  np.asarray(out_c.pos))


def test_thin_civ_matches_full():
    """Thin CIV (one dx.D +/- (d2+1) interval per dx) admits a superset
    of the 9-interval candidates whose extras all fail the distance test
    (exact +0.0) — same candidate set, one lane reduction per dx instead
    of three, so forces differ only by fp reassociation."""
    base = dict(num_particles=1500, bounds=2.0, radius=0.08,
                restitution=0.4, rebuild_every=4, pallas_block=128,
                civ=True)
    cfg_f = granular.GranularConfig(**base, pallas_slab=512)
    cfg_t = granular.GranularConfig(**base, pallas_slab=768, thin=True)
    state = granular.init_state(cfg_f, jax.random.PRNGKey(5))
    dt = jnp.float32(1 / 240)
    out_f = granular.multi_step(state, cfg_f, dt, 6, backend="pallas")
    out_t, drop_t = granular.multi_step(state, cfg_t, dt, 6,
                                        return_stats=True, backend="pallas")
    assert int(drop_t) == 0
    np.testing.assert_allclose(np.asarray(out_t.pos), np.asarray(out_f.pos),
                               atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(out_t.vel), np.asarray(out_f.vel),
                               atol=1e-4, rtol=0)


def test_pipelined_kernel_matches_unpipelined():
    """Cross-block DMA double buffering must not change a single bit:
    identical slabs, identical math, only prefetch timing differs.
    N=1500 gives 12 blocks — the prefetch path crosses the 8-row
    offset-tile boundary, where a round-3 windowing bug (BlockSpec index
    maps stride in block-shape units) once made blocks 8+ DMA from
    garbage offsets."""
    base = dict(num_particles=1500, bounds=2.0, radius=0.08, restitution=0.4,
                rebuild_every=4, pallas_block=128, pallas_slab=512)
    cfg_p = granular.GranularConfig(**base, pipeline=True)
    cfg_u = granular.GranularConfig(**base, pipeline=False)
    state = granular.init_state(cfg_p, jax.random.PRNGKey(3))
    dt = jnp.float32(1 / 240)
    out_p = granular.multi_step(state, cfg_p, dt, 6, backend="pallas")
    out_u = granular.multi_step(state, cfg_u, dt, 6, backend="pallas")
    np.testing.assert_array_equal(np.asarray(out_p.pos),
                                  np.asarray(out_u.pos))
    np.testing.assert_array_equal(np.asarray(out_p.vel),
                                  np.asarray(out_u.vel))


def test_pallas_matches_brute_force_dense():
    """Dense 6^3 pile under gravity vs the O(N^2) reference — validates
    both window completeness (Verlet invariant) and the physics op order."""
    cfg = granular.GranularConfig(
        num_particles=216, bounds=1.5, radius=0.1, restitution=0.3,
        k_contact=500.0, rebuild_every=4, pallas_block=128, pallas_slab=512)
    side = 6
    g = jnp.stack(jnp.meshgrid(*[jnp.arange(side, dtype=jnp.float32)] * 3,
                               indexing="ij")).reshape(3, -1)
    pos = (g - (side - 1) / 2) * (2.2 * cfg.radius)
    state = ParticleState(pos=pos, vel=jnp.zeros_like(pos))
    dt = jnp.float32(1 / 480)
    out, dropped = granular.multi_step(state, cfg, dt, 24,
                                       return_stats=True, backend="pallas")
    assert int(dropped) == 0
    bp, bv = np.asarray(pos, np.float32), np.zeros((3, 216), np.float32)
    for _ in range(24):
        bp, bv = _brute_step(bp, bv, cfg, float(dt))
    np.testing.assert_allclose(np.asarray(out.pos), bp, atol=2e-4, rtol=0)


def test_slab_overflow_telemetry_fires():
    """An undersized slab reports dropped > 0 instead of silently losing
    contacts (same contract as the window/max_neighbors telemetry).
    All 400 particles in one grid cell -> every window spans ~400 slots,
    far beyond what slabs A+B (128 each) can cover."""
    cfg = granular.GranularConfig(
        num_particles=400, bounds=4.0, radius=0.08, rebuild_every=4,
        pallas_block=128, pallas_slab=128)  # slab == block: no margin
    pos = jnp.asarray(
        np.random.default_rng(1).uniform(-0.1, 0.1, (3, 400)), jnp.float32)
    state = ParticleState(pos=pos, vel=jnp.zeros_like(pos))
    _, dropped = granular.multi_step(state, cfg, jnp.float32(1 / 240), 4,
                                     return_stats=True, backend="pallas")
    assert int(dropped) > 0


def test_pallas_settles_in_box():
    """Long-horizon stability: everything stays in the box and falls."""
    cfg = granular.GranularConfig(num_particles=512, radius=0.1, bounds=4.0,
                                  restitution=0.3, pallas_block=128,
                                  pallas_slab=512)
    state = granular.init_state(cfg, jax.random.key(0))
    out = granular.multi_step(state, cfg, jnp.float32(1 / 240), 200,
                              backend="pallas")
    p = np.asarray(out.pos)
    assert np.isfinite(p).all()
    limit = cfg.bounds - cfg.radius
    assert (np.abs(p) <= limit + 1e-4).all()
    assert p[1].mean() < 0.0


def test_build_windows_invariants():
    """Rebuild-product invariants behind the round-2 corruption fixes:
    empty/pad windows anchor at their own slot (tight hulls, still empty),
    slab offsets are 128-aligned, the drop telemetry is zero when slabs
    cover every window, and the off rows are padded to sublane multiples."""
    from wgpu_physics_engine_tpu.models import broadphase
    from wgpu_physics_engine_tpu.ops import granular_pallas

    cfg = granular.GranularConfig(num_particles=700, bounds=2.0, radius=0.08,
                                  pallas_block=128, pallas_slab=512)
    spec = cfg.grid_spec()
    st = granular.init_state(cfg, jax.random.PRNGKey(3))
    grid = broadphase.build_sorted_grid(st.pos, st.vel, spec)
    n = 700
    n_pad = -(-max(n, 512) // 128) * 128
    w, off, dropped = granular_pallas.build_windows(grid, spec, 128, 512,
                                                    n_pad)
    w = np.asarray(w)
    off = np.asarray(off)
    starts, ends = w[:, :9], w[:, 16:25]
    assert (ends >= starts).all()
    assert ends.max() <= n
    # pad rows hold the empty window [n, n)
    assert (starts[n:] == n).all() and (ends[n:] == n).all()
    # off: 128-aligned, in range, rows padded to a multiple of 8
    # +8 rows: the pipelined kernel reads row+1 through a 16-row window
    assert off.shape == ((n_pad // 128 + 7) // 8 * 8 + 8, 18)
    assert (off % 128 == 0).all()
    assert off.min() >= 0 and off.max() <= n_pad - 512
    # every nonempty window is covered by slab A or slab B here
    assert int(dropped) == 0
    nb = n_pad // 128
    offs = off[:nb].reshape(nb, 9, 2)
    for b in range(nb):
        for g in range(9):
            s = starts[b * 128:(b + 1) * 128, g]
            e = ends[b * 128:(b + 1) * 128, g]
            a0, b0 = offs[b, g]
            nonempty = e > s
            in_a = (s >= a0) & (e <= a0 + 512)
            in_b = (s >= b0) & (e <= b0 + 512)
            assert (in_a | in_b | ~nonempty).all()


_DROPPED_COUNTS_CHILD = """
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from wgpu_physics_engine_tpu.models import granular

cfg = granular.GranularConfig(num_particles=600, bounds=2.0,
                              radius=0.08, pallas_block=128,
                              pallas_slab=512)
st = granular.init_state(cfg, jax.random.PRNGKey(4))
dt = jnp.float32(1 / 240)
cfg_small = granular.GranularConfig(num_particles=600, bounds=2.0,
                                    radius=0.08, pallas_block=128,
                                    pallas_slab=128)
_, d_small = granular.multi_step(st, cfg_small, dt, 2,
                                 return_stats=True, backend="pallas")
_, d_ok = granular.multi_step(st, cfg, dt, 2,
                              return_stats=True, backend="pallas")
assert int(d_ok) == 0, int(d_ok)
assert 0 <= int(d_small) < 600 * 9 * 600, int(d_small)
print("CHILD OK")
"""


def test_dropped_counts_only_real_entries():
    """The telemetry counts window ENTRIES outside the slabs, not raw
    range arithmetic: a window fully past slab B contributes its width,
    not (end - slab_end).

    QUARANTINED into a fresh subprocess (round 4, VERDICT r3 item 2):
    compiling this test's small-slab program inside the full-suite
    process segfaults the XLA CPU compiler — 3/3 reproductions at the
    round-3 HEAD (twice in `pxla.compile` fresh-compile, once through
    the persistent-cache read), always at THIS test, always after ~80
    prior tests' compiles — while the identical code passes 23/23 in
    its own process. That is upstream compiler state, not kernel
    behavior; the subprocess runs the identical assertions."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # never let the child register the axon TPU plugin (sitecustomize
    # does when this var is set) — tests must not touch the chip
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    # share the suite's persistent compile cache so reruns skip compiles
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/wpe_xla_cache"))
    r = subprocess.run([sys.executable, "-c", _DROPPED_COUNTS_CHILD],
                       env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0 and "CHILD OK" in r.stdout, (
        f"rc={r.returncode}\n{r.stdout}\n{r.stderr[-2000:]}")


def test_cell_start_matches_searchsorted():
    """build_sorted_grid's histogram+cumsum cell_start == the searchsorted
    definition (the round-2 rebuild optimization must be exact)."""
    from wgpu_physics_engine_tpu.models import broadphase

    k = jax.random.PRNGKey(5)
    pos = jax.random.uniform(k, (3, 3000), minval=-2.0, maxval=2.0)
    spec = broadphase.GridSpec(origin=(-2.5,) * 3, cell_size=0.4,
                               dims=(13, 13, 13))
    grid = broadphase.build_sorted_grid(pos, jnp.zeros_like(pos), spec)
    cells = jnp.arange(spec.num_cells + 3, dtype=grid.sorted_cid.dtype)
    ref = jnp.searchsorted(grid.sorted_cid, cells, side="left")
    np.testing.assert_array_equal(np.asarray(grid.cell_start),
                                  np.asarray(ref))


def test_tiny_n_with_slab_larger_than_block():
    """n_pad must stay a multiple of pallas_block even when the slab is
    the binding constraint (regression: n=100, block=256, slab=384 raised
    a reshape error in build_windows)."""
    cfg = granular.GranularConfig(num_particles=100, bounds=2.0,
                                  radius=0.08, pallas_block=256,
                                  pallas_slab=384)
    st = granular.init_state(cfg, jax.random.PRNGKey(6))
    out = granular.multi_step(st, cfg, jnp.float32(1 / 240), 3,
                              backend="pallas")
    assert np.isfinite(np.asarray(out.pos)).all()


def test_civ_fast_drop_indicator_iff_exact():
    """CIV fast-mode (stats=False) dropped indicator contract: nonzero
    IFF the exact per-particle count (stats=True) is nonzero, and a lower
    bound of it. Regression: the gap count once included cid-HOLE slots
    (slots of the hull belonging to no particle's window), firing with
    zero real drops and sending users chasing phantom slab sizing."""
    from wgpu_physics_engine_tpu.models import broadphase
    from wgpu_physics_engine_tpu.ops import granular_pallas

    spec = broadphase.GridSpec(origin=(-2.0,) * 3, cell_size=0.25,
                               dims=(16, 16, 16))
    block = 128
    hits = 0
    for seed in range(8):
        k = jax.random.PRNGKey(seed)
        # clustered positions -> uneven columns -> blocks straddle
        # boundaries (need_b fires) with non-dense cid sets (holes)
        pos = jnp.concatenate([
            jax.random.uniform(jax.random.fold_in(k, i), (3, 500),
                               minval=-1.9, maxval=-1.9 + 0.9 * (i + 1))
            for i in range(3)], axis=1)
        grid = broadphase.build_sorted_grid(pos, jnp.zeros_like(pos), spec)
        n = pos.shape[1]
        for slab, thin in ((128, False), (256, False), (128, True),
                           (384, True)):
            n_pad = -(-max(n, slab) // block) * block
            _, _, fast = granular_pallas.build_offsets_civ(
                grid, spec, block, slab, n_pad, thin=thin, stats=False)
            _, _, exact = granular_pallas.build_offsets_civ(
                grid, spec, block, slab, n_pad, thin=thin, stats=True)
            fast, exact = int(fast), int(exact)
            # SOUND direction only: real drops must never be missed.
            # (fast may over-report — empty-window anchors in the A-B
            # gap — so neither fast<=exact nor the converse holds.)
            assert exact == 0 or fast > 0, (seed, slab, thin, fast,
                                            exact)
            hits += exact > 0
    assert hits > 0          # the sweep must actually exercise drops


def test_small_grid_falls_back_to_windows():
    """dims < 3 grids (tiny bounds / big radius) must run on the window
    path instead of tripping civ_bounds' dims>=3 assert (regression:
    civ=True default made this a trace-time crash)."""
    cfg = granular.GranularConfig(num_particles=64, bounds=0.5, radius=0.3,
                                  pallas_block=128, pallas_slab=128)
    assert min(cfg.grid_spec().dims) < 3
    st = granular.init_state(cfg, jax.random.PRNGKey(1))
    out = granular.multi_step(st, cfg, jnp.float32(1 / 240), 2,
                              backend="pallas")
    assert np.isfinite(np.asarray(out.pos)).all()


def test_thin_requires_civ():
    """thin outside the CIV kernel phase would be silently ignored
    (wrong slab sizing, wrong perf) — it must refuse loudly."""
    import pytest

    st = granular.init_state(
        granular.GranularConfig(num_particles=64), jax.random.PRNGKey(0))
    for bad in (dict(thin=True, civ=False),
                dict(thin=True, bounds=0.5, radius=0.3)):
        cfg = granular.GranularConfig(num_particles=64, **{
            "pallas_block": 128, "pallas_slab": 128, **bad})
        with pytest.raises(ValueError, match="requires civ"):
            granular.multi_step(st, cfg, jnp.float32(1 / 240), 2,
                                backend="pallas")


def _civ_counts_for_cids(cids):
    """Build a 16^3 grid from explicit cell ids and return the fast and
    exact dropped counts at block=slab=128."""
    from wgpu_physics_engine_tpu.models import broadphase
    from wgpu_physics_engine_tpu.ops import granular_pallas

    spec = broadphase.GridSpec(origin=(0.0,) * 3, cell_size=1.0,
                               dims=(16, 16, 16))
    cids = np.asarray(sorted(cids))
    cx, rem = cids // 256, cids % 256
    pos = jnp.asarray(
        np.stack([cx, rem // 16, rem % 16]).astype(np.float32) + 0.5)
    grid = broadphase.build_sorted_grid(pos, jnp.zeros_like(pos), spec)
    n = pos.shape[1]
    block = slab = 128
    n_pad = -(-max(n, slab) // block) * block
    _, _, fast = granular_pallas.build_offsets_civ(
        grid, spec, block, slab, n_pad, stats=False)
    _, _, exact = granular_pallas.build_offsets_civ(
        grid, spec, block, slab, n_pad, stats=True)
    return int(fast), int(exact)


def test_civ_fast_indicator_sound_on_masked_gap_drops():
    """False-negative regression (round-3 review): block 0 holds cids
    {90, 100, 130}; cid 90's (dx=1,dy=1) window [cells 361-363] spans the
    A-B gap with real entries, while cstar=100's window [371-373] is
    EMPTY with its anchor past them. A count clamped to cstar's own
    window reported 0 here and silently masked the real contact loss —
    the indicator must stay SOUND (fast > 0 whenever exact > 0)."""
    fast, exact = _civ_counts_for_cids(
        [90] * 60 + [100] * 8 + [130] * 60
        + [361] * 128 + [362] * 128 + [375] * 128 + [401] * 128)
    assert exact > 0
    assert fast > 0


def test_civ_fast_indicator_phantom_overreport_documented():
    """Known limitation (documented in build_offsets_civ): an EMPTY
    window anchored inside the A-B gap fires the fast indicator with
    zero real drops — per-block aggregates cannot distinguish this from
    the masked-drop case above, and a silent-loss indicator must not
    false-negative, so fast mode over-reports here by design. stats=True
    is the definitive count."""
    fast, exact = _civ_counts_for_cids(
        [100] * 60 + [110] * 8 + [130] * 60
        + [371] * 128 + [375] * 128 + [384] * 128 + [401] * 128)
    assert exact == 0
    assert fast > 0          # the documented over-report


def test_traced_params_match_static():
    """k_contact/gravity/restitution passed as traced scalars ride the
    kernel's params vector: BITWISE equal to the static-config path on
    both backends, and actually live (different materials -> different
    physics) with zero recompiles."""
    cfg = granular.GranularConfig(
        num_particles=500, bounds=2.0, radius=0.08, restitution=0.4,
        rebuild_every=4, pallas_block=128, pallas_slab=512)
    state = granular.init_state(cfg, jax.random.PRNGKey(0))
    dt = jnp.float32(1 / 240)
    kc = jnp.float32(cfg.k_contact)
    g = jnp.float32(cfg.gravity)
    e = jnp.float32(cfg.restitution)
    for backend in ("pallas", "xla"):
        a = granular.multi_step(state, cfg, dt, 6, backend=backend)
        b = granular.multi_step(state, cfg, dt, 6, backend=backend,
                                k_contact=kc, gravity=g, restitution=e)
        np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos),
                                      err_msg=backend)
        np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel),
                                      err_msg=backend)
    n0 = granular.multi_step._cache_size()
    c = granular.multi_step(state, cfg, dt, 6, backend="pallas",
                            k_contact=2.0 * kc, gravity=0.5 * g,
                            restitution=e)
    assert granular.multi_step._cache_size() == n0  # material = operand
    assert not np.array_equal(np.asarray(c.pos),
                              np.asarray(granular.multi_step(
                                  state, cfg, dt, 6, backend="pallas").pos))
