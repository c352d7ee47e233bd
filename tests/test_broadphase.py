"""Uniform-grid broad-phase, granular sim, and cloth self-collision tests
(BASELINE configs[2]/[3])."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.core.state import ClothParams, ParticleState, init_cloth_state
from wgpu_physics_engine_tpu.models import broadphase, cloth, granular


def brute_force_pair_forces(pos, radius, k):
    """O(N²) reference narrow phase."""
    n = pos.shape[1]
    f = np.zeros_like(pos)
    md = 2 * radius
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = pos[:, i] - pos[:, j]
            dist = np.sqrt((d * d).sum())
            if 1e-6 < dist < md:
                f[:, i] += k * (md - dist) / dist * d
    return f


def test_table_contains_all_particles():
    key = jax.random.key(0)
    pos = jax.random.uniform(key, (3, 100), jnp.float32, minval=-5, maxval=5)
    spec = broadphase.GridSpec(origin=(-6, -6, -6), cell_size=1.0,
                               dims=(12, 12, 12), capacity=16)
    table = np.asarray(broadphase.build_table(pos, spec))
    found = table[table >= 0]
    assert len(found) == 100
    assert sorted(found.tolist()) == list(range(100))


def test_pair_forces_match_brute_force():
    key = jax.random.key(1)
    pos = jax.random.uniform(key, (3, 60), jnp.float32, minval=-2, maxval=2)
    vel = jnp.zeros_like(pos)
    radius, k = 0.3, 100.0
    spec = broadphase.GridSpec(origin=(-3, -3, -3), cell_size=0.6,
                               dims=(10, 10, 10), capacity=32)
    table = broadphase.build_table(pos, spec)
    got = np.asarray(broadphase.pair_forces(pos, vel, table, spec, radius, k))
    ref = brute_force_pair_forces(np.asarray(pos), radius, k)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)


def test_pair_forces_sorted_matches_brute_force():
    """The scatter-free sorted-window path gives the same forces."""
    key = jax.random.key(2)
    pos = jax.random.uniform(key, (3, 80), jnp.float32, minval=-2, maxval=2)
    vel = jnp.zeros_like(pos)
    radius, k = 0.3, 100.0
    spec = broadphase.GridSpec(origin=(-3, -3, -3), cell_size=0.6,
                               dims=(10, 10, 10), capacity=32)
    grid = broadphase.build_sorted_grid(pos, vel, spec)
    got = np.asarray(broadphase.pair_forces_sorted(grid, spec, radius, k,
                                                   window=96))
    ref = brute_force_pair_forces(np.asarray(pos), radius, k)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)


def test_capacity_overflow_is_dropped_not_corrupt():
    # 20 coincident-cell particles with capacity 4: table stays well-formed
    pos = jnp.zeros((3, 20), jnp.float32) + 0.5
    spec = broadphase.GridSpec(origin=(0, 0, 0), cell_size=1.0,
                               dims=(2, 2, 2), capacity=4)
    table = np.asarray(broadphase.build_table(pos, spec))
    assert (table >= -1).all() and (table < 20).all()
    assert (table >= 0).sum() == 4


def test_granular_two_particle_bounce():
    """Two overlapping particles repel along their axis."""
    config = granular.GranularConfig(num_particles=2, radius=0.5,
                                     bounds=5.0, gravity=0.0, k_contact=100.0)
    pos = jnp.array([[-0.4, 0.4], [0.0, 0.0], [0.0, 0.0]], jnp.float32)
    state = ParticleState(pos=pos, vel=jnp.zeros_like(pos))
    out = granular.multi_step(state, config, jnp.float32(0.01), 10)
    p = np.asarray(out.pos)
    assert p[0, 0] < -0.4 and p[0, 1] > 0.4        # pushed apart
    np.testing.assert_allclose(p[1:], 0.0, atol=1e-5)


def test_granular_settles_on_ground():
    config = granular.GranularConfig(num_particles=512, radius=0.1,
                                     bounds=4.0, restitution=0.3)
    state = granular.init_state(config, jax.random.key(0))
    out = granular.multi_step(state, config, jnp.float32(1 / 240), 600)
    p = np.asarray(out.pos)
    assert np.isfinite(p).all()
    limit = config.bounds - config.radius
    assert (np.abs(p) <= limit + 1e-4).all()
    # everything has fallen into the lower half
    assert p[1].mean() < 0.0


def test_build_candidates_complete_vs_brute_force():
    """Every pair within r_query appears in the frozen candidate list (and
    dropped == 0) when window/max_neighbors are sized generously."""
    key = jax.random.key(3)
    pos = jax.random.uniform(key, (3, 90), jnp.float32, minval=-2, maxval=2)
    vel = jnp.zeros_like(pos)
    r_query = 0.7
    spec = broadphase.GridSpec(origin=(-3, -3, -3), cell_size=0.7,
                               dims=(9, 9, 9), capacity=32)
    grid = broadphase.build_sorted_grid(pos, vel, spec)
    idx, mask, dropped = broadphase.build_candidates(
        grid, spec, r_query, window=96, max_neighbors=64)
    assert int(dropped) == 0
    sp = np.asarray(grid.sorted_pos)
    idx, mask = np.asarray(idx), np.asarray(mask)
    n = sp.shape[1]
    got = [set(idx[i][mask[i]].tolist()) for i in range(n)]
    for i in range(n):
        d = np.linalg.norm(sp - sp[:, i:i + 1], axis=0)
        want = {j for j in range(n) if j != i and d[j] < r_query}
        assert want <= got[i], f"slot {i} missing {want - got[i]}"
        # nothing outside r_query sneaks in
        assert all(d[j] < r_query + 1e-6 for j in got[i])


def test_candidate_overflow_telemetry_fires():
    """Undersized max_neighbors reports dropped > 0 instead of failing
    silently (VERDICT round-1 weak spot #5)."""
    pos = jnp.asarray(np.random.default_rng(0).uniform(-0.2, 0.2, (3, 40)),
                      jnp.float32)
    vel = jnp.zeros_like(pos)
    spec = broadphase.GridSpec(origin=(-1, -1, -1), cell_size=1.0,
                               dims=(2, 2, 2), capacity=64)
    grid = broadphase.build_sorted_grid(pos, vel, spec)
    _, _, dropped = broadphase.build_candidates(
        grid, spec, 1.0, window=64, max_neighbors=4)
    assert int(dropped) > 0
    # and the per-step windowed path reports its own window overflow
    _, dropped_w = broadphase.pair_forces_sorted(
        grid, spec, 0.5, 10.0, window=8, return_stats=True)
    assert int(dropped_w) > 0


def test_granular_frozen_matches_per_step_rebuild_dense():
    """Frozen Verlet lists (rebuild_every=8) track per-step rebuilds on a
    dense settling cluster — the piling regime where silent candidate
    dropping would show up (VERDICT round-1 item #2)."""
    base = dict(num_particles=343, radius=0.1, bounds=2.0, restitution=0.3,
                k_contact=500.0, window=64, max_neighbors=64)
    cfg_frozen = granular.GranularConfig(rebuild_every=8, **base)
    cfg_step = granular.GranularConfig(rebuild_every=1, **base)
    # dense 7^3 lattice at 2.2r spacing, dropped from rest
    side = 7
    g = jnp.stack(jnp.meshgrid(*[jnp.arange(side, dtype=jnp.float32)] * 3,
                               indexing="ij")).reshape(3, -1)
    pos = (g - (side - 1) / 2) * (2.2 * base["radius"])
    state = ParticleState(pos=pos, vel=jnp.zeros_like(pos))
    dt = jnp.float32(1 / 480)
    out_f, dropped = granular.multi_step(state, cfg_frozen, dt, 48,
                                         return_stats=True)
    out_s = granular.multi_step(state, cfg_step, dt, 48)
    assert int(dropped) == 0, "frozen list undersized for the dense pile"
    assert np.isfinite(np.asarray(out_f.pos)).all()
    np.testing.assert_allclose(np.asarray(out_f.pos), np.asarray(out_s.pos),
                               atol=2e-3, rtol=0)


def test_granular_frozen_settles_on_ground():
    """Default (frozen-list) granular config stays inside the box and
    settles — long-horizon stability of the rebuild-every-K schedule."""
    config = granular.GranularConfig(num_particles=512, radius=0.1,
                                     bounds=4.0, restitution=0.3)
    assert config.rebuild_every > 1
    state = granular.init_state(config, jax.random.key(0))
    out = granular.multi_step(state, config, jnp.float32(1 / 240), 600)
    p = np.asarray(out.pos)
    assert np.isfinite(p).all()
    limit = config.bounds - config.radius
    assert (np.abs(p) <= limit + 1e-4).all()
    assert p[1].mean() < 0.0


def test_cloth_self_collision_repels():
    """Two halves of a folded cloth cannot interpenetrate: with self-
    collision the minimum pairwise distance stays near 2r; without it the
    halves pass through each other."""
    c = cfg.ClothConfig(height=8, width=8, cloth_size=2.0,
                        center=(0.0, 40.0, 0.0), particle_radius=0.12)
    params = ClothParams.from_config(c)._replace(gravity=jnp.float32(0.0))
    state = init_cloth_state(c)
    # two flat sheets approaching: shift rows 4-7 up by 1 and give them
    # downward velocity (rest: upward) — emulated by stacking along y
    pos = np.asarray(state.pos).copy()
    pos[0, 4:, :] = pos[0, :4, :]      # sheet B directly above sheet A
    pos[2, 4:, :] = pos[2, :4, :]
    pos[1, 4:, :] += 1.0
    vel = np.zeros_like(pos)
    vel[1, 4:, :] = -4.0
    vel[1, :4, :] = 4.0
    # rebuild as two disconnected halves is not possible with grid springs;
    # instead disable springs to isolate the contact behavior
    params = params._replace(k_struct=jnp.float32(0.0),
                             k_shear=jnp.float32(0.0),
                             k_bend=jnp.float32(0.0),
                             c_struct=jnp.float32(0.0),
                             c_shear=jnp.float32(0.0),
                             c_bend=jnp.float32(0.0))
    st = state._replace(pos=jnp.asarray(pos), vel=jnp.asarray(vel))
    grid = cloth.default_self_collision_grid(c)

    out = cloth.multi_step_self_collide(st, params, jnp.float32(1 / 480), 60,
                                        grid)
    p = np.asarray(out.pos).reshape(3, -1)
    d = np.linalg.norm(p.T[:, None] - p.T[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    # penalty contact bounds penetration at the stiffness equilibrium
    # overlap ≈ v_rel/2 · sqrt(m/k) ≈ 0.09, so min distance stays near
    # 2r − overlap ≈ 0.15; deep interpenetration would be ≪ r.
    assert d.min() > 0.8 * c.particle_radius

    out2 = cloth.multi_step(st, params, jnp.float32(1 / 480), 60)
    p2 = np.asarray(out2.pos).reshape(3, -1)
    d2 = np.linalg.norm(p2.T[:, None] - p2.T[None], axis=-1)
    np.fill_diagonal(d2, np.inf)
    assert d2.min() < 0.01                     # without contact: pass-through
    assert d.min() > 10 * d2.min()


def test_self_collide_block_slab_invariance():
    """pallas_block / pallas_slab are pure tiling choices: the frozen
    path's physics must not depend on them. Candidate sets are identical
    (slabs are supersets pruned by the same CIV + distance tests) and
    per-particle window order is block-independent, so results agree to
    at most A/B-pass reassociation (different blockings split a window
    across the two slab passes at different points). b512 > n exercises
    the single-padded-block edge the bench's b512 probe config relies on."""
    c = cfg.ClothConfig(height=16, width=16, cloth_size=2.0,
                        center=(0.0, 40.0, 0.0), particle_radius=0.12)
    params = ClothParams.from_config(c)
    state = cloth.multi_step(init_cloth_state(c), params,
                             jnp.float32(1 / 480), 40)
    grid = cloth.default_self_collision_grid(c, skin=2 * c.particle_radius)
    dt = jnp.float32(1 / 480)
    ref = cloth.multi_step_self_collide(state, params, dt, 6, grid,
                                        rebuild_every=3)
    for blk, slab in ((128, 384), (512, 1280)):
        out, dropped = cloth.multi_step_self_collide(
            state, params, dt, 6, grid, rebuild_every=3,
            pallas_block=blk, pallas_slab=slab, return_stats=True)
        assert int(dropped) == 0, (blk, slab)
        np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                                   atol=1e-6, rtol=0, err_msg=f"{blk}/{slab}")


def test_self_collide_frozen_matches_exact():
    """rebuild_every=K (frozen windows + slab-DMA kernel) matches the
    exact per-substep path: with a skin-sized grid the candidate sets are
    supersets of the true contacts, so results differ only by the
    kernel's rsqrt formulation (~1 ulp per pair)."""
    c = cfg.ClothConfig(height=12, width=12, cloth_size=2.0,
                        center=(0.0, 40.0, 0.0), particle_radius=0.12)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    # drop it on the globe briefly so contacts actually form
    state = cloth.multi_step(state, params, jnp.float32(1 / 480), 40)
    # capacity 32 -> the exact path's window (3*capacity) is wide enough
    # that it drops nothing as the cloth compresses (at the default 8 it
    # silently loses contacts mid-rollout and the EXACT path is the one
    # that diverges)
    grid = dataclasses.replace(
        cloth.default_self_collision_grid(c, skin=2 * c.particle_radius),
        capacity=32)
    dt = jnp.float32(1 / 480)
    exact = cloth.multi_step_self_collide(state, params, dt, 12, grid)
    frozen, dropped = cloth.multi_step_self_collide(
        state, params, dt, 12, grid, rebuild_every=4, return_stats=True)
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(frozen.pos), np.asarray(exact.pos),
                               atol=1e-5, rtol=0)


def test_self_collide_spring_kernel_matches_xla():
    """The fused spring+contact+integrate kernel (use_spring_kernel=True,
    round-3 path) matches the XLA spring path on the same frozen windows
    to stencil-order fp32 tolerance, pins included."""
    c = cfg.ClothConfig(height=12, width=12, cloth_size=2.0,
                        center=(0.0, 40.0, 0.0), particle_radius=0.12)
    params = ClothParams.from_config(c)
    state = cloth.multi_step(init_cloth_state(c), params,
                             jnp.float32(1 / 480), 40)
    mask = np.zeros((12, 12), bool)
    mask[0, :3] = True
    state = state._replace(pin_mask=jnp.asarray(mask), pin_pos=state.pos)
    grid = cloth.default_self_collision_grid(c, skin=2 * c.particle_radius)
    dt = jnp.float32(1 / 480)
    a = cloth.multi_step_self_collide(state, params, dt, 12, grid,
                                      rebuild_every=4,
                                      use_spring_kernel=True)
    b = cloth.multi_step_self_collide(state, params, dt, 12, grid,
                                      rebuild_every=4,
                                      use_spring_kernel=False)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                               atol=1e-5, rtol=0)
    np.testing.assert_array_equal(np.asarray(a.pos)[:, mask],
                                  np.asarray(state.pos)[:, mask])


def test_self_collide_frozen_repels_and_pins():
    """Frozen-path physics: folded sheets repel, pinned rows hold."""
    c = cfg.ClothConfig(height=8, width=8, cloth_size=2.0,
                        center=(0.0, 40.0, 0.0), particle_radius=0.12)
    params = ClothParams.from_config(c)._replace(
        gravity=jnp.float32(0.0), k_struct=jnp.float32(0.0),
        k_shear=jnp.float32(0.0), k_bend=jnp.float32(0.0),
        c_struct=jnp.float32(0.0), c_shear=jnp.float32(0.0),
        c_bend=jnp.float32(0.0))
    state = init_cloth_state(c)
    pos = np.asarray(state.pos).copy()
    pos[0, 4:, :] = pos[0, :4, :]
    pos[2, 4:, :] = pos[2, :4, :]
    pos[1, 4:, :] += 1.0
    vel = np.zeros_like(pos)
    vel[1, 4:, :] = -4.0
    vel[1, :4, :] = 4.0
    mask = np.zeros(pos.shape[1:], bool)
    mask[0, 0] = True
    st = state._replace(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                        pin_mask=jnp.asarray(mask), pin_pos=jnp.asarray(pos))
    grid = cloth.default_self_collision_grid(c, skin=2 * c.particle_radius)
    out = cloth.multi_step_self_collide(st, params, jnp.float32(1 / 480), 60,
                                        grid, rebuild_every=6)
    p = np.asarray(out.pos).reshape(3, -1)
    d = np.linalg.norm(p.T[:, None] - p.T[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 0.8 * c.particle_radius          # no interpenetration
    np.testing.assert_array_equal(np.asarray(out.pos)[:, 0, 0],
                                  pos[:, 0, 0])       # pin held bitwise
