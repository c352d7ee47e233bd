"""Reverse-mode differentiation THROUGH the fused cloth kernel.

``jax.grad`` cannot flow through ``pallas_call`` (kernels are opaque
primitives), so the differentiable-simulation path previously had to step
with the XLA stencil (models/cloth.py + jax.checkpoint — see
examples/differentiable_cloth.py), paying the ~10-60x kernel-vs-XLA gap in
every training iteration. This module makes the fused kernel itself
differentiable with a segment-checkpointed ``jax.custom_vjp``:

* **primal** — segments of K substeps run the UNMODIFIED fused kernel
  (``cloth_pallas._kernel``): when not differentiating you pay nothing.
* **backward, per segment (reverse order)** —
  1. a *trace kernel* re-runs the segment from its saved start state with
     the IDENTICAL substep body (``cloth_pallas._substep_planes``) and
     streams each substep's input state to HBM (``[K, 6, H, W]``), state
     resident in VMEM scratch across the grid;
  2. a *transpose kernel* walks the trajectory backwards (reverse-indexed
     BlockSpec → Pallas double-buffers the HBM loads), carrying the state
     cotangent in VMEM scratch and the 16 parameter cotangents in SMEM.

The transpose math is NOT hand-derived: inside the kernel body the substep
is rebuilt from small pure functions and differentiated with ``jax.vjp``
at trace time (tracing a kernel is ordinary JAX tracing), so the adjoint
is correct by construction. Only one rule is written by hand: the
cotangent of a cyclic roll is the inverse roll (``_droll`` — ``pltpu.roll``
itself has no AD rule). The stencil's scatter-accumulation never needs a
transpose: per spring family the substep's force CONTRIBUTION is an
independent function of the full state planes (shift → edge force → minus
shifted-back reaction), and contributions add, so each family is vjp'd
whole against the same force cotangent. Families are re-linearized one at
a time so only a single family's residuals are ever live in VMEM.

Gradients match ``jax.grad`` of the XLA path to fp32 accumulation noise
(the linearization points differ by the documented ~1 ulp between the two
force-accumulation orders); see tests/test_cloth_grad.py. Branchy physics
(contact, friction, projection, the Coulomb ``min``) differentiates in the
where-guarded a.e. sense — the same semantics the XLA path has.

Memory: checkpointing is two-level — ``lax.scan`` over segments saves one
state per K substeps; each segment's backward materializes K states in HBM
(K·6·H·W·4 B ≈ 100 MB at 256² / K=64), never in VMEM.

Reference capability mapping: the reference (wgpu/WGSL) has no gradient
story at all — this is TPU-native surplus, same class as the parallel and
datagen layers (SURVEY §5).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.state import ClothState
from . import cloth_pallas as cp

_EPS = cp._EPS
_NP = cp._NP

# The WHOLE-PLANE reverse-walk kernel's live set of [h, w] temporaries
# (per-family re-linearization per substep) OOMs the 16M scoped-VMEM
# limit at 256² on v5e (40.9M measured — tools/probes/probe_grad.py);
# 128² fits and runs at 2.2e8 particle-steps/s. Grids above this limit
# route to the BANDED transpose kernel (round 4, VERDICT r3 item 4):
# same reverse walk, but each substep's re-linearization runs over row
# bands with an 8-row halo, so the temporary live set scales with
# band·w instead of h·w while the cotangent carry (cheap: 6 planes)
# stays whole-grid in VMEM.
_GRAD_VMEM_PARTICLE_LIMIT = 16_384
# Banded path cap: the whole-grid carries (padded state + two padded
# cotangent buffers + the substep's traj block) are ~8 MB at 256²; 512²
# doubles that past scoped VMEM -> XLA + jax.checkpoint fallback.
_GRAD_BANDED_PARTICLE_LIMIT = 65_536
_BAND_PAD = 8    # sublane-aligned halo: bands slice [jB-8, jB+B+8) of a
# zero-padded [h + 16, w] plane; the stencil needs only ±2 rows, the
# other 6 keep every slice 8-row aligned for Mosaic


# ---------------------------------------------------------------------------
# AD-able building blocks (traced inside kernel bodies)
# ---------------------------------------------------------------------------

def _droll(x, shift, axis):
    """``pltpu.roll`` with a reverse-mode rule: a cyclic roll is a
    permutation, so its vjp is the inverse roll."""
    size = x.shape[axis]
    s = shift % size
    if s == 0:
        return x

    @jax.custom_vjp
    def roll(v):
        return pltpu.roll(v, s, axis)

    def fwd(v):
        return roll(v), None

    def bwd(_, ct):
        return (pltpu.roll(ct, size - s, axis),)

    roll.defvjp(fwd, bwd)
    return roll(x)


def _dshift(a, dr, dc, h, w):
    """AD-able twin of ``cloth_pallas._shift``:
    ``result[r, c] = a[(r+dr) % h, (c+dc) % w]``."""
    if dr:
        a = _droll(a, -dr, 0)
    if dc:
        a = _droll(a, -dc, 1)
    return a


def _gradsafe_dist_inv(d2):
    """Primal-identical to ``cloth_pallas._exact_dist_inv`` (sqrt(0) = 0,
    guarded inverse) but safe under reverse-mode: the sqrt never sees 0 on
    the backward pass (d sqrt/dx at 0 is inf, and inf · 0-mask = NaN — the
    standard JAX gotcha; same guard as ``models.cloth._safe_norm``)."""
    positive = d2 > 0
    dist = jnp.where(positive, jnp.sqrt(jnp.where(positive, d2, 1.0)), 0.0)
    safe = dist >= _EPS
    inv = jnp.where(safe, 1.0 / jnp.where(safe, dist, 1.0), 0.0)
    return dist, inv


def _family_force(x, y, z, vx, vy, vz, kk, cc, rr, *, dr, dc, ok, h, w):
    """ONE spring family's force contribution planes (anchor + reaction),
    an independent additive term of the total spring force — the unit the
    backward pass re-linearizes with ``jax.vjp``. Expressions mirror
    ``cloth_pallas._substep_planes`` (forces.wgsl:143-313)."""
    p1x, p1y, p1z = (_dshift(a, dr, dc, h, w) for a in (x, y, z))
    v1x, v1y, v1z = (_dshift(a, dr, dc, h, w) for a in (vx, vy, vz))
    dxv, dyv, dzv = p1x - x, p1y - y, p1z - z
    dist, inv = _gradsafe_dist_inv(dxv * dxv + dyv * dyv + dzv * dzv)
    safe = dist >= _EPS
    ux, uy, uz = dxv * inv, dyv * inv, dzv * inv
    stretch = dist - rr
    v_along = (v1x - vx) * ux + (v1y - vy) * uy + (v1z - vz) * uz
    s = kk * stretch + cc * v_along
    keep = ok & safe
    ex = jnp.where(keep, s * ux, 0.0)
    ey = jnp.where(keep, s * uy, 0.0)
    ez = jnp.where(keep, s * uz, 0.0)
    return (ex - _dshift(ex, -dr, -dc, h, w),
            ey - _dshift(ey, -dr, -dc, h, w),
            ez - _dshift(ez, -dr, -dc, h, w))


def _integrate_planes(x, y, z, vx, vy, vz, fx, fy, fz, k_contact, mu, mass,
                      gravity, damp_factor, min_dist, dt, *pin_pos, pin):
    """Gravity → contact → friction → Euler+damp → projection → pins, on
    planes (compute_movement.wgsl:70-174). Expressions mirror
    ``cloth_pallas._substep_planes`` with gradient-safe norms. ``pin_pos``
    is ``(px, py, pz)`` when ``pin`` is a mask plane, else empty."""
    fy = fy + mass * gravity

    dist, inv_d = _gradsafe_dist_inv(x * x + y * y + z * z)
    in_contact = (dist < min_dist) & (dist > _EPS)
    nx, ny, nz = x * inv_d, y * inv_d, z * inv_d
    pen = k_contact * (min_dist - dist)
    fx = jnp.where(in_contact, fx + pen * nx, fx)
    fy = jnp.where(in_contact, fy + pen * ny, fy)
    fz = jnp.where(in_contact, fz + pen * nz, fz)

    ro_n = fx * nx + fy * ny + fz * nz
    tx, ty, tz = fx - ro_n * nx, fy - ro_n * ny, fz - ro_n * nz
    tmag, inv_t = _gradsafe_dist_inv(tx * tx + ty * ty + tz * tz)
    fric = in_contact & (tmag > _EPS)
    fmag = -jnp.minimum(tmag, mu * jnp.abs(ro_n))
    fx = jnp.where(fric, fx + fmag * tx * inv_t, fx)
    fy = jnp.where(fric, fy + fmag * ty * inv_t, fy)
    fz = jnp.where(fric, fz + fmag * tz * inv_t, fz)

    inv_m = 1.0 / mass
    vx = (vx + fx * inv_m * dt) * damp_factor
    vy = (vy + fy * inv_m * dt) * damp_factor
    vz = (vz + fz * inv_m * dt) * damp_factor
    x = x + vx * dt
    y = y + vy * dt
    z = z + vz * dt

    fdist, inv_f = _gradsafe_dist_inv(x * x + y * y + z * z)
    pen2 = fdist < min_dist
    pen_safe = pen2 & (fdist > _EPS)
    pen_center = pen2 & jnp.logical_not(pen_safe)
    x = jnp.where(pen_safe, x * inv_f * min_dist, jnp.where(pen_center, 0.0, x))
    y = jnp.where(pen_safe, y * inv_f * min_dist,
                  jnp.where(pen_center, min_dist, y))
    z = jnp.where(pen_safe, z * inv_f * min_dist, jnp.where(pen_center, 0.0, z))
    vx = jnp.where(pen2, 0.0, vx)
    vy = jnp.where(pen2, 0.0, vy)
    vz = jnp.where(pen2, 0.0, vz)

    if pin is not None:
        px, py, pz = pin_pos
        x = jnp.where(pin, px, x)
        y = jnp.where(pin, py, y)
        z = jnp.where(pin, pz, z)
        vx = jnp.where(pin, 0.0, vx)
        vy = jnp.where(pin, 0.0, vy)
        vz = jnp.where(pin, 0.0, vz)
    return x, y, z, vx, vy, vz


def _unpack_scal(params_ref):
    prm = lambda j: params_ref[j]
    k = (prm(0), prm(1), prm(2))
    c = (prm(3), prm(4), prm(5))
    rest = (prm(6), prm(7), prm(8))
    return (k, c, rest, prm(9), prm(10), prm(11), prm(12), prm(13), prm(14),
            prm(15))


# ---------------------------------------------------------------------------
# Trace kernel: re-run a segment, streaming each substep's INPUT state to HBM
# ---------------------------------------------------------------------------

def _trace_kernel(params_ref, pos_ref, vel_ref, pinm_ref, pinpos_ref,
                  traj_out, state_scr, *, h, w, use_pins):
    i = pl.program_id(0)
    scal = _unpack_scal(params_ref)
    masks = [cp._family_masks(h, w, dr, dc) for dr, dc, _ in cp._FAMILIES]

    @pl.when(i == 0)
    def _():
        for j in range(3):
            state_scr[j] = pos_ref[j]
            state_scr[3 + j] = vel_ref[j]

    carry = tuple(state_scr[j] for j in range(6))
    for j in range(6):
        traj_out[0, j] = carry[j]
    pins = None
    if use_pins:
        pins = (pinm_ref[...] != 0.0, pinpos_ref[0], pinpos_ref[1],
                pinpos_ref[2])
    out = cp._substep_planes(carry, masks, scal, cp._exact_dist_inv,
                             pins=pins)
    for j in range(6):
        state_scr[j] = out[j]


# ---------------------------------------------------------------------------
# Transpose kernel: walk the trajectory backwards, carrying cotangents
# ---------------------------------------------------------------------------

def _bwd_kernel(params_ref, traj_ref, pinm_ref, pinpos_ref, ctpos_ref,
                ctvel_ref, out_ctpos, out_ctvel, out_ctpin, out_ctprm,
                *scratch, h, w, n_steps, use_pins):
    i = pl.program_id(0)
    ct_scr = scratch[0]
    pin_scr = scratch[1] if use_pins else None
    acc_ref = scratch[-1]
    scal = _unpack_scal(params_ref)
    k, c, rest = scal[0], scal[1], scal[2]
    masks = [cp._family_masks(h, w, dr, dc) for dr, dc, _ in cp._FAMILIES]

    @pl.when(i == 0)
    def _():
        for j in range(3):
            ct_scr[j] = ctpos_ref[j]
            ct_scr[3 + j] = ctvel_ref[j]
            if use_pins:
                pin_scr[j] = jnp.zeros((h, w), jnp.float32)
        for j in range(_NP):
            acc_ref[j] = 0.0

    # primal state entering substep t = n_steps-1-i (reverse BlockSpec)
    x, y, z, vx, vy, vz = (traj_ref[0, j] for j in range(6))
    pin = (pinm_ref[...] != 0.0) if use_pins else None

    fams = []
    for fam_idx, (dr, dc, t) in enumerate(cp._FAMILIES):
        fams.append((t, functools.partial(
            _family_force, dr=dr, dc=dc, ok=masks[fam_idx], h=h, w=w)))

    # pass 1 (primal): total spring force, the integrate linearization point
    fx = jnp.zeros((h, w), jnp.float32)
    fy = jnp.zeros((h, w), jnp.float32)
    fz = jnp.zeros((h, w), jnp.float32)
    for t, fam_fn in fams:
        gx, gy, gz = fam_fn(x, y, z, vx, vy, vz, k[t], c[t], rest[t])
        fx, fy, fz = fx + gx, fy + gy, fz + gz

    # incoming cotangent (w.r.t. this substep's OUTPUT)
    ct_out = tuple(ct_scr[j] for j in range(6))

    int_fn = functools.partial(_integrate_planes, pin=pin)
    int_args = (x, y, z, vx, vy, vz, fx, fy, fz) + scal[3:]
    if use_pins:
        int_args = int_args + (pinpos_ref[0], pinpos_ref[1], pinpos_ref[2])
    _, vjp_int = jax.vjp(int_fn, *int_args)
    cts = vjp_int(ct_out)
    ctx, cty, ctz, ctvx, ctvy, ctvz, ctfx, ctfy, ctfz = cts[:9]
    for j, s in enumerate(cts[9:15]):          # k_contact..min_dist → 9..14
        acc_ref[9 + j] = acc_ref[9 + j] + s
    acc_ref[15] = acc_ref[15] + cts[15]        # dt
    if use_pins:
        for j in range(3):
            pin_scr[j] = pin_scr[j] + cts[16 + j]

    # pass 2: per-family re-linearization against the force cotangent
    # (contributions are additive, so each family takes the FULL ctf)
    ctf = (ctfx, ctfy, ctfz)
    for t, fam_fn in fams:
        _, vjp_fam = jax.vjp(fam_fn, x, y, z, vx, vy, vz, k[t], c[t],
                             rest[t])
        ax, ay, az, avx, avy, avz, ck, cc_, cr = vjp_fam(ctf)
        ctx, cty, ctz = ctx + ax, cty + ay, ctz + az
        ctvx, ctvy, ctvz = ctvx + avx, ctvy + avy, ctvz + avz
        acc_ref[t] = acc_ref[t] + ck
        acc_ref[3 + t] = acc_ref[3 + t] + cc_
        acc_ref[6 + t] = acc_ref[6 + t] + cr

    for j, v in enumerate((ctx, cty, ctz, ctvx, ctvy, ctvz)):
        ct_scr[j] = v

    @pl.when(i == n_steps - 1)
    def _():
        for j in range(3):
            out_ctpos[j] = ct_scr[j]
            out_ctvel[j] = ct_scr[3 + j]
        if use_pins:
            for j in range(3):
                out_ctpin[j] = pin_scr[j]
        else:
            out_ctpin[...] = jnp.zeros((3, 1, 1), jnp.float32)
        for j in range(_NP):
            out_ctprm[j] = acc_ref[j]


def _band_masks(h, w, dr, dc, g0, hh):
    """Edge-validity mask for a row-band slice: row ``l`` of the slice is
    GLOBAL row ``g0 + l`` (negative / >= h on the zero-pad rows). Same
    conditions as ``cloth_pallas._family_masks`` plus ``rows >= 0`` —
    the full-plane kernel gets that bound for free from cyclic wraparound
    masking, a band slice must state it."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (hh, w), 0) + g0
    cols = jax.lax.broadcasted_iota(jnp.int32, (hh, w), 1)
    ok = (rows >= 0) & (rows < (h - dr))
    if dc >= 0:
        ok = ok & (cols < (w - dc))
    else:
        ok = ok & (cols >= -dc)
    return ok


def _band_family_force(x, y, z, vx, vy, vz, kk, cc, rr, *, dr, dc, ok,
                       hh, w, lo, nrows):
    """One family's force contribution restricted to a band's INTERIOR
    rows ``[lo, lo+nrows)`` of a halo slice of height ``hh`` — the unit
    the banded backward re-linearizes. Interior rows only ever read
    rows ``[lo - 2, lo + nrows + 2)`` of the slice (|dr| <= 2), so the
    8-row halo keeps every access in-slice; the cyclic-roll wraparound
    rows land outside the interior and are discarded by the slice."""
    gx, gy, gz = _family_force(x, y, z, vx, vy, vz, kk, cc, rr,
                               dr=dr, dc=dc, ok=ok, h=hh, w=w)
    return (gx[lo:lo + nrows], gy[lo:lo + nrows], gz[lo:lo + nrows])


def _bwd_kernel_banded(params_ref, traj_ref, pinm_ref, pinpos_ref,
                       ctpos_ref, ctvel_ref, out_ctpos, out_ctvel,
                       out_ctpin, out_ctprm, *scratch, h, w, n_steps,
                       use_pins, band):
    """Banded transpose kernel (round 4): identical math to
    :func:`_bwd_kernel`, but each substep's re-linearization runs over
    row bands of ``band`` rows with an ``_BAND_PAD``-row halo, so the
    live temporary set is ``O(band·w)`` instead of ``O(h·w)`` — the
    whole-plane kernel's 40.9 MB VMEM blow-up at 256². The cotangent
    carry and the substep's primal state stay whole-grid in VMEM
    (cheap: ~1.7 MB/plane-set at 256²), zero-padded by ``_BAND_PAD``
    rows top and bottom so every band's halo slice is in-range and
    8-row aligned; ``_band_masks``'s global-row bounds zero every
    pad-row contribution.

    Band accumulation: bands READ the old cotangent (``ct_scr``) and
    ACCUMULATE into a separate new-cotangent buffer (``ctn_scr``) —
    neighboring bands' family vjps overlap by up to 2 rows, and band
    j's writes must not corrupt band j+1's reads.
    """
    P = _BAND_PAD
    i = pl.program_id(0)
    st_scr, ct_scr, ctn_scr = scratch[0], scratch[1], scratch[2]
    pin_scr = scratch[3] if use_pins else None
    acc_ref = scratch[-1]
    scal = _unpack_scal(params_ref)
    k, c, rest = scal[0], scal[1], scal[2]
    zero_pad_plane = jnp.zeros((P, w), jnp.float32)

    @pl.when(i == 0)
    def _():
        for j in range(6):
            st_scr[j, 0:P] = zero_pad_plane
            st_scr[j, P + h:] = zero_pad_plane
            ct_scr[j, 0:P] = zero_pad_plane
            ct_scr[j, P + h:] = zero_pad_plane
        for j in range(3):
            ct_scr[j, P:P + h] = ctpos_ref[j]
            ct_scr[3 + j, P:P + h] = ctvel_ref[j]
            if use_pins:
                pin_scr[j] = jnp.zeros((h, w), jnp.float32)
        for j in range(_NP):
            acc_ref[j] = 0.0

    # primal state entering substep t = n_steps-1-i (reverse BlockSpec)
    for j in range(6):
        st_scr[j, P:P + h] = traj_ref[0, j]
    for j in range(6):
        ctn_scr[j] = jnp.zeros((h + 2 * P, w), jnp.float32)

    pinm = pinm_ref[...] if use_pins else None

    n_bands = -(-h // band)
    for jb in range(n_bands):
        a = jb * band
        nb = min(band, h - a)
        hh = nb + 2 * P
        # halo slice: padded rows [a, a + hh) <=> global rows
        # [a - P, a + nb + P)
        g0 = a - P
        xh, yh, zh = (st_scr[j, a:a + hh] for j in range(3))
        vxh, vyh, vzh = (st_scr[3 + j, a:a + hh] for j in range(3))
        intr = slice(P, P + nb)
        xi, yi, zi = xh[intr], yh[intr], zh[intr]
        vxi, vyi, vzi = vxh[intr], vyh[intr], vzh[intr]

        fams = []
        for dr, dc, t in cp._FAMILIES:
            fams.append((t, functools.partial(
                _band_family_force, dr=dr, dc=dc,
                ok=_band_masks(h, w, dr, dc, g0, hh), hh=hh, w=w,
                lo=P, nrows=nb)))

        # pass 1 (primal): band spring force, the integrate
        # linearization point
        fx = jnp.zeros((nb, w), jnp.float32)
        fy = jnp.zeros((nb, w), jnp.float32)
        fz = jnp.zeros((nb, w), jnp.float32)
        for t, fam_fn in fams:
            gx, gy, gz = fam_fn(xh, yh, zh, vxh, vyh, vzh, k[t], c[t],
                                rest[t])
            fx, fy, fz = fx + gx, fy + gy, fz + gz

        # incoming cotangent for this band's rows (OLD carry)
        ct_out = tuple(ct_scr[j, P + a:P + a + nb] for j in range(6))

        pin_b = (pinm[a:a + nb] != 0.0) if use_pins else None
        int_fn = functools.partial(_integrate_planes, pin=pin_b)
        int_args = (xi, yi, zi, vxi, vyi, vzi, fx, fy, fz) + scal[3:]
        if use_pins:
            int_args = int_args + (pinpos_ref[0, a:a + nb],
                                   pinpos_ref[1, a:a + nb],
                                   pinpos_ref[2, a:a + nb])
        _, vjp_int = jax.vjp(int_fn, *int_args)
        cts = vjp_int(ct_out)
        ctx, cty, ctz, ctvx, ctvy, ctvz, ctfx, ctfy, ctfz = cts[:9]
        for j, s in enumerate(cts[9:15]):      # k_contact..min_dist
            acc_ref[9 + j] = acc_ref[9 + j] + s
        acc_ref[15] = acc_ref[15] + cts[15]    # dt
        if use_pins:
            for j in range(3):
                pin_scr[j, a:a + nb] = pin_scr[j, a:a + nb] + cts[16 + j]
        for j, v in enumerate((ctx, cty, ctz, ctvx, ctvy, ctvz)):
            ctn_scr[j, P + a:P + a + nb] = (
                ctn_scr[j, P + a:P + a + nb] + v)

        # pass 2: per-family re-linearization against the band's force
        # cotangent; input cotangents land on the halo slice
        ctf = (ctfx, ctfy, ctfz)
        for t, fam_fn in fams:
            _, vjp_fam = jax.vjp(fam_fn, xh, yh, zh, vxh, vyh, vzh,
                                 k[t], c[t], rest[t])
            ax, ay, az, avx, avy, avz, ck, cc_, cr = vjp_fam(ctf)
            for j, v in enumerate((ax, ay, az, avx, avy, avz)):
                ctn_scr[j, a:a + hh] = ctn_scr[j, a:a + hh] + v
            acc_ref[t] = acc_ref[t] + ck
            acc_ref[3 + t] = acc_ref[3 + t] + cc_
            acc_ref[6 + t] = acc_ref[6 + t] + cr

    for j in range(6):
        ct_scr[j] = ctn_scr[j]

    @pl.when(i == n_steps - 1)
    def _():
        for j in range(3):
            out_ctpos[j] = ct_scr[j, P:P + h]
            out_ctvel[j] = ct_scr[3 + j, P:P + h]
        if use_pins:
            for j in range(3):
                out_ctpin[j] = pin_scr[j]
        else:
            out_ctpin[...] = jnp.zeros((3, 1, 1), jnp.float32)
        for j in range(_NP):
            out_ctprm[j] = acc_ref[j]


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _full(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape))


def _fwd_call(pos, vel, pinm, pinpos, pvec, *, h, w, n_steps, use_pins,
              interpret):
    kernel = functools.partial(cp._kernel, h=h, w=w, n_steps=n_steps,
                               use_pins=use_pins)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((3, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((3, h, w), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(pvec, pos, vel, pinm, pinpos)


def _trace_call(pos, vel, pinm, pinpos, pvec, *, h, w, n_steps, use_pins,
                interpret):
    kernel = functools.partial(_trace_kernel, h=h, w=w, use_pins=use_pins)
    pm, pp = pinm.shape, pinpos.shape
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        out_shape=jax.ShapeDtypeStruct((n_steps, 6, h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _full((3, h, w)), _full((3, h, w)), _full(pm), _full(pp)],
        out_specs=pl.BlockSpec((1, 6, h, w), lambda i: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((6, h, w), jnp.float32)],
        interpret=interpret,
    )(pvec, pos, vel, pinm, pinpos)


def _bwd_call(traj, pinm, pinpos, ct_pos, ct_vel, pvec, *, h, w, n_steps,
              use_pins, interpret, band=None):
    if band:
        kernel = functools.partial(_bwd_kernel_banded, h=h, w=w,
                                   n_steps=n_steps, use_pins=use_pins,
                                   band=band)
        hp = h + 2 * _BAND_PAD
        scratch = [pltpu.VMEM((6, hp, w), jnp.float32),   # padded primal
                   pltpu.VMEM((6, hp, w), jnp.float32),   # ct carry
                   pltpu.VMEM((6, hp, w), jnp.float32)]   # ct accumulator
    else:
        kernel = functools.partial(_bwd_kernel, h=h, w=w, n_steps=n_steps,
                                   use_pins=use_pins)
        scratch = [pltpu.VMEM((6, h, w), jnp.float32)]
    if use_pins:
        scratch.append(pltpu.VMEM((3, h, w), jnp.float32))
    scratch.append(pltpu.SMEM((_NP,), jnp.float32))
    pm, pp = pinm.shape, pinpos.shape
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        out_shape=(jax.ShapeDtypeStruct((3, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((3, h, w), jnp.float32),
                   jax.ShapeDtypeStruct(pp, jnp.float32),
                   jax.ShapeDtypeStruct((_NP,), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 6, h, w),
                               lambda i: (n_steps - 1 - i, 0, 0, 0)),
                  _full(pm), _full(pp), _full((3, h, w)), _full((3, h, w))],
        out_specs=(_full((3, h, w)), _full((3, h, w)), _full(pp),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(pvec, traj, pinm, pinpos, ct_pos, ct_vel)


# ---------------------------------------------------------------------------
# custom_vjp segment + public API
# ---------------------------------------------------------------------------

def _default_band(h, w):
    """Band rows for the banded transpose kernel: ~8k particles per band
    (live temporary set ≈ 620 B/particle — tools/probes/probe_grad.py —
    so ~5 MB/band next to the ~8 MB of whole-grid carries), 8-row
    aligned, at least 8."""
    return max(8, min(h, (8192 // w) // 8 * 8))


@functools.lru_cache(maxsize=None)
def _segment_core(h, w, n_steps, use_pins, interpret, band=None):
    fwd = functools.partial(_fwd_call, h=h, w=w, n_steps=n_steps,
                            use_pins=use_pins, interpret=interpret)

    @jax.custom_vjp
    def seg(pos, vel, pinm, pinpos, pvec):
        return fwd(pos, vel, pinm, pinpos, pvec)

    def seg_fwd(pos, vel, pinm, pinpos, pvec):
        return fwd(pos, vel, pinm, pinpos, pvec), (pos, vel, pinm, pinpos,
                                                   pvec)

    def seg_bwd(res, ct):
        pos, vel, pinm, pinpos, pvec = res
        ct_pos, ct_vel = ct
        traj = _trace_call(pos, vel, pinm, pinpos, pvec, h=h, w=w,
                           n_steps=n_steps, use_pins=use_pins,
                           interpret=interpret)
        ctp, ctv, ctpin, ctprm = _bwd_call(
            traj, pinm, pinpos, ct_pos, ct_vel, pvec, h=h, w=w,
            n_steps=n_steps, use_pins=use_pins, interpret=interpret,
            band=band)
        return ctp, ctv, jnp.zeros_like(pinm), ctpin, ctprm

    seg.defvjp(seg_fwd, seg_bwd)
    return seg


def multi_step(state: ClothState, params, dt, n_steps: int,
               segment: Optional[int] = None,
               interpret: Optional[bool] = None,
               band: Optional[int] = None) -> ClothState:
    """Differentiable ``n_steps`` fused substeps (drop-in for
    :func:`cloth_pallas.multi_step`, exact mode).

    Primal output is bit-identical to the plain fused kernel (it IS the
    plain fused kernel, called per ``segment``). Under ``jax.grad``/
    ``jax.vjp``, each segment's backward re-runs the segment through the
    trace kernel and transposes it with the reverse-walk kernel — see the
    module docstring. Differentiable inputs: ``state.pos``, ``state.vel``,
    ``state.pin_pos``, every ``ClothParams`` leaf, and ``dt`` (the caller
    differentiates through ``_pack_params``, which carries the
    ``speed_damp**dt`` chain). ``pin_mask`` is boolean/structural.

    ``segment`` trades residual memory for recompute: ``lax.scan`` saves
    one state per segment; the backward materializes ``segment`` substep
    states in HBM (``segment·6·H·W·4`` bytes). Default 64 ≈ 100 MB at
    256².

    ``band``: row-band height for the BANDED transpose kernel (round 4).
    ``None`` = auto: whole-plane transpose up to
    ``_GRAD_VMEM_PARTICLE_LIMIT`` (128²), banded above it (~8k-particle
    bands). Pass explicitly to force banding on small grids (tests).
    """
    if interpret is None:
        interpret = cp._default_interpret()
    if n_steps == 0:
        return state
    h, w = state.pos.shape[-2:]
    if segment is None:
        segment = min(n_steps, 64)
    segment = min(segment, n_steps)
    if band is None and h * w > _GRAD_VMEM_PARTICLE_LIMIT:
        band = _default_band(h, w)
    use_pins = state.pin_mask is not None
    pvec = cp._pack_params(params, dt)
    if use_pins:
        pinm = state.pin_mask.astype(jnp.float32)
        pinpos = state.pin_pos
    else:
        pinm = jnp.zeros((1, 1), jnp.float32)
        pinpos = jnp.zeros((3, 1, 1), jnp.float32)
    n_seg, rem = divmod(n_steps, segment)
    pos, vel = state.pos, state.vel
    if n_seg:
        core = _segment_core(h, w, segment, use_pins, interpret, band)

        def body(c, _):
            return core(c[0], c[1], pinm, pinpos, pvec), None

        (pos, vel), _ = jax.lax.scan(body, (pos, vel), None, length=n_seg)
    if rem:
        core_r = _segment_core(h, w, rem, use_pins, interpret, band)
        pos, vel = core_r(pos, vel, pinm, pinpos, pvec)
    return state._replace(pos=pos, vel=vel)
