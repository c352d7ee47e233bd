"""Differentiable fused-kernel path (ops/cloth_pallas_grad.py).

Two gradient oracles, by design:

* an **XLA mirror** that steps with the grad module's own pure functions
  (`_family_force` + `_integrate_planes`, identical expressions and
  family-contribution accumulation order) — `jax.grad` of this isolates
  the hand-built transpose machinery (the `_droll` rule, the per-family
  re-linearization, the SMEM parameter accumulators) from fp32 op-order
  noise. Tolerance is tight (1e-5) even with contact/friction active.
* the **production XLA path** (`models.cloth.multi_step`) in a smooth
  regime (springs stretched, no contact) — pins the whole composition
  (segment scan, `_pack_params` chain rule for speed_damp**dt, pin
  handling) against an independent implementation. Near the contact
  threshold the two paths' ~1-ulp primal differences flip friction
  branches, so gradients there legitimately diverge (same phenomenon as
  the documented trajectory contract in test_cloth_vs_oracle.py) — the
  smooth regime is the honest comparison.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state
from wgpu_physics_engine_tpu.models import cloth
from wgpu_physics_engine_tpu.ops import cloth_pallas as cp
from wgpu_physics_engine_tpu.ops import cloth_pallas_grad as cpg

H, W = 12, 16
DT = jnp.float32(1.0 / 480.0)


@pytest.fixture(scope="module")
def setup():
    c = cfg.ClothConfig(height=H, width=W)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    # drop to impact: contact/friction/projection branches all active
    contact = cloth.multi_step(state, params, DT, 1500)
    # smooth regime: mid-fall, springs stretched by noise, no contact
    noisy = state._replace(
        pos=state.pos + 0.2 * jax.random.normal(jax.random.PRNGKey(0),
                                                state.pos.shape))
    smooth = cloth.multi_step(noisy, params, DT, 50)
    wp = jax.random.normal(jax.random.PRNGKey(1), state.pos.shape)
    wv = jax.random.normal(jax.random.PRNGKey(2), state.vel.shape)
    return params, contact, smooth, wp, wv


def _mirror_multi(pos, vel, pvec, n, pinm=None, pinpos=None):
    """XLA stepper with the grad module's exact expressions/order."""
    masks = [cp._family_masks(H, W, dr, dc) for dr, dc, _ in cp._FAMILIES]
    k = (pvec[0], pvec[1], pvec[2])
    c = (pvec[3], pvec[4], pvec[5])
    rest = (pvec[6], pvec[7], pvec[8])
    pin = None if pinm is None else (pinm != 0.0)

    def sub(carry, _):
        x, y, z, vx, vy, vz = carry
        fx = jnp.zeros((H, W), jnp.float32)
        fy = jnp.zeros_like(fx)
        fz = jnp.zeros_like(fx)
        for fam_idx, (dr, dc, t) in enumerate(cp._FAMILIES):
            gx, gy, gz = cpg._family_force(
                x, y, z, vx, vy, vz, k[t], c[t], rest[t],
                dr=dr, dc=dc, ok=masks[fam_idx], h=H, w=W)
            fx, fy, fz = fx + gx, fy + gy, fz + gz
        args = (x, y, z, vx, vy, vz, fx, fy, fz, pvec[9], pvec[10],
                pvec[11], pvec[12], pvec[13], pvec[14], pvec[15])
        if pin is not None:
            args = args + (pinpos[0], pinpos[1], pinpos[2])
        return tuple(cpg._integrate_planes(*args, pin=pin)), None

    carry = (pos[0], pos[1], pos[2], vel[0], vel[1], vel[2])
    carry, _ = jax.lax.scan(sub, carry, None, length=n)
    return jnp.stack(carry[:3]), jnp.stack(carry[3:])


def _max_rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-8)


def test_primal_bitwise_vs_plain_kernel(setup):
    params, contact, _, _, _ = setup
    out_k = cp.multi_step(contact, params, DT, 24, interpret=True)
    out_d = cpg.multi_step(contact, params, DT, 24, segment=8)
    assert jnp.all(out_k.pos == out_d.pos)
    assert jnp.all(out_k.vel == out_d.vel)
    # segment size must not change the primal (same kernel math per step)
    out_d2 = cpg.multi_step(contact, params, DT, 24, segment=10)  # remainder 4
    assert jnp.all(out_d.pos == out_d2.pos)


def test_grads_vs_identical_math_mirror_with_contact(setup):
    """Transpose machinery vs jax.grad of the same expressions — tight
    tolerance even in the branch-heavy contact regime."""
    params, contact, _, wp, wv = setup
    pvec0 = cp._pack_params(params, DT)
    n = 24

    def loss_mirror(pvec, pos, vel):
        p, v = _mirror_multi(pos, vel, pvec, n)
        return jnp.sum(p * wp) + jnp.sum(v * wv)

    def loss_kernel(pvec, pos, vel):
        core = cpg._segment_core(H, W, 8, False, True)
        pinm = jnp.zeros((1, 1), jnp.float32)
        pinpos = jnp.zeros((3, 1, 1), jnp.float32)
        for _ in range(n // 8):
            pos, vel = core(pos, vel, pinm, pinpos, pvec)
        return jnp.sum(pos * wp) + jnp.sum(vel * wv)

    gm = jax.grad(loss_mirror, argnums=(0, 1, 2))(
        pvec0, contact.pos, contact.vel)
    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(
        pvec0, contact.pos, contact.vel)
    for a, b in zip(gk, gm):
        assert _max_rel(a, b) < 1e-5


def test_grads_vs_xla_path_smooth_regime(setup):
    """Full public API (params pytree, dt chain rule, segment scan) vs
    jax.grad of the production XLA stencil path."""
    params, _, smooth, wp, wv = setup
    n = 24

    def loss(fn):
        def f(pms, pos, vel, dt):
            out = fn(smooth._replace(pos=pos, vel=vel), pms, dt, n)
            return jnp.sum(out.pos * wp) + jnp.sum(out.vel * wv)
        return f

    diff_fn = lambda s, pms, dt, n_: cpg.multi_step(s, pms, dt, n_, segment=8)
    gd = jax.grad(loss(diff_fn), argnums=(0, 1, 2, 3))(
        params, smooth.pos, smooth.vel, DT)
    gx = jax.grad(loss(cloth.multi_step), argnums=(0, 1, 2, 3))(
        params, smooth.pos, smooth.vel, DT)
    leaves_d = list(gd[0]) + [gd[1], gd[2], gd[3]]
    leaves_x = list(gx[0]) + [gx[1], gx[2], gx[3]]
    names = list(params._fields) + ["pos", "vel", "dt"]
    for name, a, b in zip(names, leaves_d, leaves_x):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        if np.max(np.abs(b)) < 1e-6:
            assert np.max(np.abs(a)) < 1e-6, name
            continue
        assert _max_rel(a, b) < 2e-4, name


def test_grads_with_pins(setup):
    """Pinned path: pin_pos cotangents + pinned-particle masking, vs the
    identical-math mirror."""
    params, contact, _, wp, wv = setup
    pvec0 = cp._pack_params(params, DT)
    pin_mask = jnp.zeros((H, W), bool).at[0, :].set(True)
    pinned = contact._replace(pin_mask=pin_mask, pin_pos=contact.pos)
    pinm = pin_mask.astype(jnp.float32)
    n = 16

    def loss_mirror(pvec, pos, vel, pinpos):
        p, v = _mirror_multi(pos, vel, pvec, n, pinm=pinm, pinpos=pinpos)
        return jnp.sum(p * wp) + jnp.sum(v * wv)

    def loss_kernel(pvec, pos, vel, pinpos):
        core = cpg._segment_core(H, W, 8, True, True)
        for _ in range(n // 8):
            pos, vel = core(pos, vel, pinm, pinpos, pvec)
        return jnp.sum(pos * wp) + jnp.sum(vel * wv)

    args = (pvec0, pinned.pos, pinned.vel, pinned.pin_pos)
    gm = jax.grad(loss_mirror, argnums=(0, 1, 2, 3))(*args)
    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(gk, gm):
        assert _max_rel(a, b) < 1e-5
    # pin_pos receives cotangent (pinned targets are differentiable); note
    # the pinned row's INPUT pos ct is NOT zero — a pinned particle still
    # anchors its neighbors' springs within the substep
    assert np.max(np.abs(np.asarray(gk[3]))) > 0.0

    # public API end-to-end with pins (exercises state pin plumbing)
    def loss_pub(pms):
        out = cpg.multi_step(pinned, pms, DT, n, segment=8)
        return jnp.sum(out.pos * wp)

    g = jax.grad(loss_pub)(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in g)


def test_newton_step_recovers_gravity(setup):
    """The differentiable example's inverse problem, on the kernel path:
    the COM height after free fall is LINEAR in gravity, so one Newton
    step from the kernel-path gradient must land the target exactly —
    a sharp end-to-end gradient-correctness check (a wrong-by-1% gradient
    leaves a visible residual)."""
    params, _, _, _, _ = setup
    c = cfg.ClothConfig(height=H, width=W)
    state0 = init_cloth_state(c)
    target_y = jnp.float32(36.0)

    def rollout(gravity):
        pms = params._replace(gravity=gravity)
        out = cpg.multi_step(state0, pms, DT, 240, segment=48)
        return jnp.mean(out.pos[1])

    vg = jax.jit(jax.value_and_grad(rollout))
    g0 = jnp.float32(-9.81)
    y0, dy = vg(g0)
    g_star = g0 - (y0 - target_y) / dy
    y_star = rollout(g_star)
    assert abs(float(y_star) - 36.0) < 1e-3


def test_banded_backward_matches_whole_plane(setup):
    """The banded transpose kernel (round 4 — the 256²-capable path) must
    match the whole-plane kernel: primal bitwise (same forward), grads to
    fp32 band-reassociation noise (band vjps accumulate overlapping halo
    contributions in a different association than one whole-plane vjp).
    H=12 with band=8 exercises an uneven last band (rows 8..12) plus the
    halo overlap across the band seam; contact branches are active."""
    params, contact, _, wp, wv = setup

    def loss(fn, pos, vel):
        out = fn(contact._replace(pos=pos, vel=vel), params, DT, 12)
        return jnp.sum(out.pos * wp) + jnp.sum(out.vel * wv)

    f_whole = functools.partial(cpg.multi_step, segment=6)
    f_band = functools.partial(cpg.multi_step, segment=6, band=8)
    lw, gw = jax.value_and_grad(lambda p, v: loss(f_whole, p, v),
                                argnums=(0, 1))(contact.pos, contact.vel)
    lb, gb = jax.value_and_grad(lambda p, v: loss(f_band, p, v),
                                argnums=(0, 1))(contact.pos, contact.vel)
    assert np.array_equal(np.asarray(lw), np.asarray(lb))
    assert _max_rel(gb[0], gw[0]) < 1e-4
    assert _max_rel(gb[1], gw[1]) < 1e-4


def test_streamed_backward_matches_banded():
    """The STREAMED path (round 5 — the 1024²-capable variant: banded
    trace kernel + primal-band-from-HBM transpose) must match the
    whole-grid-carry banded kernel: primal bitwise (the tiled forward is
    bitwise-equal to the single-block kernel), grads at fp32
    reassociation tolerance. h=40 is the smallest grid the k_sub=8
    halo-widened trace fits (band 8 + 2·16 halo)."""
    h, w = 40, 16
    c = cfg.ClothConfig(height=h, width=w)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    contact = cloth.multi_step(state, params, DT, 1500)  # branches active
    wp = jax.random.normal(jax.random.PRNGKey(1), state.pos.shape)
    n = 16

    def loss(stream, pos, vel):
        out = cpg.multi_step(contact._replace(pos=pos, vel=vel), params,
                             DT, n, segment=8, stream=stream)
        return jnp.sum(out.pos * wp)

    lb, gb = jax.value_and_grad(functools.partial(loss, False),
                                argnums=(0, 1))(contact.pos, contact.vel)
    ls, gs = jax.value_and_grad(functools.partial(loss, True),
                                argnums=(0, 1))(contact.pos, contact.vel)
    assert np.array_equal(np.asarray(lb), np.asarray(ls))
    assert _max_rel(gs[0], gb[0]) < 1e-4
    assert _max_rel(gs[1], gb[1]) < 1e-4


def test_streamed_backward_pins_and_params():
    """Streamed path with pins: pin_pos cotangents, the 16 parameter
    cotangents, and the public-API params pytree all match the banded
    kernel at reassociation tolerance."""
    h, w = 40, 16
    c = cfg.ClothConfig(height=h, width=w)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    contact = cloth.multi_step(state, params, DT, 1500)
    pinm = np.zeros((h, w), bool)
    pinm[0, :] = True
    pinned = contact._replace(pin_mask=jnp.asarray(pinm),
                              pin_pos=contact.pos)
    wp = jax.random.normal(jax.random.PRNGKey(1), state.pos.shape)

    def loss(stream, pp, pms):
        out = cpg.multi_step(pinned._replace(pin_pos=pp), pms, DT, 8,
                             segment=8, stream=stream)
        return jnp.sum(out.pos * wp)

    gb = jax.grad(functools.partial(loss, False), argnums=(0, 1))(
        pinned.pin_pos, params)
    gs = jax.grad(functools.partial(loss, True), argnums=(0, 1))(
        pinned.pin_pos, params)
    assert _max_rel(gs[0], gb[0]) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(gs[1]),
                    jax.tree_util.tree_leaves(gb[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_stream_routing_and_guards():
    """Ops-level guards: grids past the streamed limit raise with a
    pointer to the XLA fallback; stream mode rejects misaligned
    horizons; models.cloth.multi_step_diff silently routes both to the
    XLA fallback (differentiable everywhere)."""
    c = cfg.ClothConfig(height=40, width=16)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    with pytest.raises(ValueError, match="XLA fallback"):
        cpg.multi_step(state, params, DT, 12, stream=True)  # 12 % 8 != 0
    big = jax.ShapeDtypeStruct((3, 2048, 1024), jnp.float32)
    fake = state._replace(pos=big, vel=big)
    with pytest.raises(ValueError, match="exceeds"):
        cpg.multi_step(fake, params, DT, 8)
    # models wrapper: misaligned horizon on a stream-size grid -> XLA
    # fallback, still differentiable (tiny grid stands in via monkeypatch)
    out = cloth.multi_step_diff(state, params, DT, 4)
    assert np.isfinite(np.asarray(out.pos)).all()


def test_banded_backward_with_pins_and_params(setup):
    """Banded path with pins: pin_pos cotangents and the 16 parameter
    cotangents must match the whole-plane kernel at reassociation
    tolerance (they accumulate per band in SMEM)."""
    params, contact, _, wp, _ = setup
    pinm = np.zeros((H, W), bool)
    pinm[0, :] = True
    pinned = contact._replace(pin_mask=jnp.asarray(pinm),
                              pin_pos=contact.pos)

    def loss(band, pp, pms):
        out = cpg.multi_step(pinned._replace(pin_pos=pp), pms, DT, 10,
                             segment=5, band=band)
        return jnp.sum(out.pos * wp)

    gw = jax.grad(loss, argnums=(1, 2))(None, pinned.pin_pos, params)
    gb = jax.grad(loss, argnums=(1, 2))(8, pinned.pin_pos, params)
    assert _max_rel(gb[0], gw[0]) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(gb[1]),
                    jax.tree_util.tree_leaves(gw[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
