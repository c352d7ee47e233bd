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
# cotangent buffers + the substep's traj block) are ~8 MB at 256² —
# inside the DEFAULT ~16 MB scoped-VMEM window. At 512² they total
# ~50 MB, which still fits v5e's 128 MB physical VMEM once the scoped
# limit is raised per-kernel (``_vmem_params`` below), so 512² also
# runs the banded kernel (round 5). 1024² needs ~150 MB > physical ->
# XLA + jax.checkpoint fallback.
_GRAD_BANDED_PARTICLE_LIMIT = 262_144
# Above the default scoped-VMEM window the kernels ask Mosaic for a
# bigger allocation (v5e has 128 MB physical VMEM; the 16 MB default is
# a compiler-conservatism, not hardware). Raised for every banded-path
# grid (>128²): the window pays for itself in wider bands — the 512²
# sweep measured 8.08e8 (band 16) → 9.51e8 (band 64) p-steps/s.
_VMEM_RAISE_PARTICLE_LIMIT = 16_384
_VMEM_LIMIT_BYTES = 100 * 2**20


def _vmem_params(h, w):
    if h * w > _VMEM_RAISE_PARTICLE_LIMIT:
        return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)
    return None
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


def _band_passes(band_state, ct_out, scal, fams, pin_b, pinpos_b,
                 add_interior, add_halo, add_scal, add_fam, add_pin):
    """The two re-linearization passes for ONE row band — the shared core
    of the banded transpose kernels (:func:`_bwd_kernel_banded` keeps
    whole-grid carries in VMEM; :func:`_bwd_kernel_stream` streams the
    primal band from HBM). Accumulation happens through the ``add_*``
    callbacks (ref writes in the calling kernel) so the floating-point
    accumulation ORDER is identical in both kernels — and identical to
    the pre-refactor round-4 kernel.

    ``band_state``: 6 halo-slice planes ``[hh, w]`` (interior rows at
    ``[P, P+nb)``); ``ct_out``: 6 interior planes (the OLD cotangent for
    this band's rows); ``fams``: ``(t, fam_fn)`` with the band's masks
    baked in; ``pin_b``/``pinpos_b``: interior pin mask + position
    planes, or None.

    Callbacks: ``add_interior(j, plane)`` — integrate-vjp state
    cotangents (6 interior planes); ``add_halo(j, plane)`` — family-vjp
    state cotangents (6 halo-slice planes, called per family);
    ``add_scal(j, s)`` — the 7 scalar cotangents k_contact..min_dist,
    dt (j = 0..6); ``add_fam(t, ck, cc, cr)`` — per-family spring-param
    cotangents; ``add_pin(j, plane)`` — pin-position cotangents."""
    xh, yh, zh, vxh, vyh, vzh = band_state
    k, c, rest = scal[0], scal[1], scal[2]
    nb = ct_out[0].shape[0]
    w_ = xh.shape[1]
    intr = slice(_BAND_PAD, _BAND_PAD + nb)
    xi, yi, zi = xh[intr], yh[intr], zh[intr]
    vxi, vyi, vzi = vxh[intr], vyh[intr], vzh[intr]

    # pass 1 (primal): band spring force, the integrate linearization
    # point
    fx = jnp.zeros((nb, w_), jnp.float32)
    fy = jnp.zeros((nb, w_), jnp.float32)
    fz = jnp.zeros((nb, w_), jnp.float32)
    for t, fam_fn in fams:
        gx, gy, gz = fam_fn(xh, yh, zh, vxh, vyh, vzh, k[t], c[t],
                            rest[t])
        fx, fy, fz = fx + gx, fy + gy, fz + gz

    int_fn = functools.partial(_integrate_planes, pin=pin_b)
    int_args = (xi, yi, zi, vxi, vyi, vzi, fx, fy, fz) + scal[3:]
    if pinpos_b is not None:
        int_args = int_args + pinpos_b
    _, vjp_int = jax.vjp(int_fn, *int_args)
    cts = vjp_int(ct_out)
    for j, s in enumerate(cts[9:16]):      # k_contact..min_dist, dt
        add_scal(j, s)
    if pinpos_b is not None:
        for j in range(3):
            add_pin(j, cts[16 + j])
    for j in range(6):
        add_interior(j, cts[j])

    # pass 2: per-family re-linearization against the band's force
    # cotangent; input cotangents land on the halo slice
    ctf = tuple(cts[6:9])
    for t, fam_fn in fams:
        _, vjp_fam = jax.vjp(fam_fn, xh, yh, zh, vxh, vyh, vzh,
                             k[t], c[t], rest[t])
        out = vjp_fam(ctf)
        for j in range(6):
            add_halo(j, out[j])
        add_fam(t, out[6], out[7], out[8])


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

    def add_scal(j, s):
        acc_ref[9 + j] = acc_ref[9 + j] + s

    def add_fam(t, ck, cc_, cr):
        acc_ref[t] = acc_ref[t] + ck
        acc_ref[3 + t] = acc_ref[3 + t] + cc_
        acc_ref[6 + t] = acc_ref[6 + t] + cr

    n_bands = -(-h // band)
    for jb in range(n_bands):
        a = jb * band
        nb = min(band, h - a)
        hh = nb + 2 * P
        # halo slice: padded rows [a, a + hh) <=> global rows
        # [a - P, a + nb + P)
        g0 = a - P
        band_state = tuple(st_scr[j, a:a + hh] for j in range(6))

        fams = []
        for dr, dc, t in cp._FAMILIES:
            fams.append((t, functools.partial(
                _band_family_force, dr=dr, dc=dc,
                ok=_band_masks(h, w, dr, dc, g0, hh), hh=hh, w=w,
                lo=P, nrows=nb)))

        # incoming cotangent for this band's rows (OLD carry)
        ct_out = tuple(ct_scr[j, P + a:P + a + nb] for j in range(6))

        pin_b = (pinm[a:a + nb] != 0.0) if use_pins else None
        pinpos_b = (pinpos_ref[0, a:a + nb], pinpos_ref[1, a:a + nb],
                    pinpos_ref[2, a:a + nb]) if use_pins else None

        def add_interior(j, v, a=a, nb=nb):
            ctn_scr[j, P + a:P + a + nb] = (
                ctn_scr[j, P + a:P + a + nb] + v)

        def add_halo(j, v, a=a, hh=hh):
            ctn_scr[j, a:a + hh] = ctn_scr[j, a:a + hh] + v

        def add_pin(j, v, a=a, nb=nb):
            pin_scr[j, a:a + nb] = pin_scr[j, a:a + nb] + v

        _band_passes(band_state, ct_out, scal, fams, pin_b, pinpos_b,
                     add_interior, add_halo, add_scal, add_fam, add_pin)

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
# Streamed variant (round 5): grids whose whole-grid VMEM carries outgrow
# even the raised window (1024² needs ~150 MB > the 128 MB physical VMEM).
# Three changes vs the banded kernel, same math:
#   * primal  — the production banded forward (cloth_pallas_tiled) driven
#     with the packed param vector, instead of the whole-plane kernel;
#   * trace   — a halo-widened banded kernel (same window logic as the
#     tiled forward) that ALSO streams each substep's entering center
#     rows to HBM;
#   * backward — the banded transpose with the whole-grid PRIMAL carry
#     replaced by a per-band DMA from the HBM trajectory (the two
#     cotangent carries stay whole-grid in VMEM: ~51 MB at 1024²).
# ---------------------------------------------------------------------------

_STREAM_K_SUB = 8     # substeps per trace/forward launch (halo = 16 rows)
# The streamed backward still keeps the two padded cotangent carries
# whole-grid in VMEM (≈ 2·6·(h+16)·w·4 B): at 1024² that is 51 MB inside
# the raised window; 2048² would need 204 MB > physical -> XLA fallback.
_GRAD_STREAM_PARTICLE_LIMIT = 1_048_576


def _tiled_specs(h, w, band_ext, use_pins, interpret, kernel, extra_outs=(),
                 extra_scratch=(), n_sems=6):
    """pallas_call plumbing shared by the streamed forward and trace
    launches (mirrors cloth_pallas_tiled.multi_step's launch)."""
    return pl.pallas_call(
        kernel,
        grid=(h // (band_ext[0]),),
        out_shape=(jax.ShapeDtypeStruct((3, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((3, h, w), jnp.float32)) +
        tuple(extra_outs),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)) +
        tuple(pl.BlockSpec(memory_space=pl.ANY) for _ in extra_outs),
        scratch_shapes=[
            pltpu.VMEM((3, band_ext[1], w), jnp.float32),
            pltpu.VMEM((3, band_ext[1], w), jnp.float32),
            pltpu.VMEM((3, band_ext[1], w), jnp.float32),
            pltpu.VMEM((3, band_ext[1], w), jnp.float32),
            pltpu.VMEM((band_ext[1], w), jnp.float32),
            pltpu.VMEM((3, band_ext[1], w), jnp.float32),
        ] + list(extra_scratch) + [pltpu.SemaphoreType.DMA((n_sems,))],
        compiler_params=_vmem_params(h, w),
        interpret=interpret,
    )


def _fwd_call_stream(pos, vel, pinm, pinpos, pvec, *, h, w, n_steps,
                     use_pins, interpret):
    """Segment primal for the streamed path: the PRODUCTION banded
    forward (cloth_pallas_tiled._kernel — halo widening, k_sub substeps
    per launch) driven with the already-packed param vector, so the
    primal is bit-identical to what cloth_pallas.multi_step runs at
    these sizes."""
    from . import cloth_pallas_tiled as cpt

    k_sub = _STREAM_K_SUB
    assert n_steps % k_sub == 0
    band_h = cpt._pick_band(h, w, k_sub, use_pins)
    halo = 2 * k_sub
    kernel = functools.partial(cpt._kernel, h=h, w=w, band_h=band_h,
                               halo=halo, k_sub=k_sub, use_pins=use_pins)
    launch = _tiled_specs(h, w, (band_h, band_h + 2 * halo), use_pins,
                          interpret, kernel)

    def body(c, _):
        p, v = launch(pvec, c[0], c[1], pinm, pinpos)
        return (p, v), None

    (p, v), _ = jax.lax.scan(body, (pos, vel), None,
                             length=n_steps // k_sub)
    return p, v


def _trace_kernel_stream(params_ref, pos_hbm, vel_hbm, pinm_hbm,
                         pinpos_hbm, pos_out, vel_out, traj_out,
                         sp, sv, so_p, so_v, spinm, spinpos, stage, sems,
                         *, h, w, band_h, halo, k_sub, use_pins):
    """Banded trace: the tiled forward's window walk (DMA band + 2·k_sub
    halo rows in, run k_sub substeps, DMA center rows out), additionally
    streaming each substep's ENTERING state (center rows) to the HBM
    trajectory the transpose kernel walks backwards. Substep math is
    ``cloth_pallas._substep_planes`` — identical expressions to the
    whole-plane trace kernel and the forward."""
    band = pl.program_id(0)
    band_ext = band_h + 2 * halo
    window_start = jnp.clip(band * band_h - halo, 0, h - band_ext)
    window_start = pl.multiple_of(window_start, 8)
    center_off = pl.multiple_of(band * band_h - window_start, 8)
    band_start = pl.multiple_of(band * band_h, 8)

    cp_in_p = pltpu.make_async_copy(
        pos_hbm.at[:, pl.ds(window_start, band_ext), :], sp, sems.at[0])
    cp_in_v = pltpu.make_async_copy(
        vel_hbm.at[:, pl.ds(window_start, band_ext), :], sv, sems.at[1])
    cp_in_p.start()
    cp_in_v.start()
    if use_pins:
        cp_in_m = pltpu.make_async_copy(
            pinm_hbm.at[pl.ds(window_start, band_ext), :], spinm,
            sems.at[4])
        cp_in_pp = pltpu.make_async_copy(
            pinpos_hbm.at[:, pl.ds(window_start, band_ext), :], spinpos,
            sems.at[5])
        cp_in_m.start()
        cp_in_pp.start()
        cp_in_m.wait()
        cp_in_pp.wait()
    cp_in_p.wait()
    cp_in_v.wait()

    scal = _unpack_scal(params_ref)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (band_ext, w), 0)
    grow = lrow + window_start
    cols = jax.lax.broadcasted_iota(jnp.int32, (band_ext, w), 1)
    masks = []
    for dr, dc, _ in cp._FAMILIES:
        # global validity AND local no-wrap (cloth_pallas_tiled._kernel)
        ok = (grow < (h - dr)) & (lrow < (band_ext - dr))
        if dc >= 0:
            ok = ok & (cols < (w - dc))
        else:
            ok = ok & (cols >= -dc)
        masks.append(ok)
    pins = None
    if use_pins:
        pins = (spinm[...] != 0.0, spinpos[0], spinpos[1], spinpos[2])

    def body(t, carry):
        for j in range(6):
            stage[j] = carry[j]
        cp_tr = pltpu.make_async_copy(
            stage.at[:, pl.ds(center_off, band_h), :],
            traj_out.at[t, :, pl.ds(band_start, band_h), :], sems.at[2])
        cp_tr.start()
        out = cp._substep_planes(carry, masks, scal, cp._exact_dist_inv,
                                 pins=pins)
        cp_tr.wait()
        return out

    x, y, z, vx, vy, vz = jax.lax.fori_loop(
        0, k_sub, body, (sp[0], sp[1], sp[2], sv[0], sv[1], sv[2]))

    so_p[0], so_p[1], so_p[2] = x, y, z
    so_v[0], so_v[1], so_v[2] = vx, vy, vz
    cp_out_p = pltpu.make_async_copy(
        so_p.at[:, pl.ds(center_off, band_h), :],
        pos_out.at[:, pl.ds(band_start, band_h), :], sems.at[0])
    cp_out_v = pltpu.make_async_copy(
        so_v.at[:, pl.ds(center_off, band_h), :],
        vel_out.at[:, pl.ds(band_start, band_h), :], sems.at[1])
    cp_out_p.start()
    cp_out_v.start()
    cp_out_p.wait()
    cp_out_v.wait()


def _trace_call_stream(pos, vel, pinm, pinpos, pvec, *, h, w, n_steps,
                       use_pins, interpret):
    """Segment trajectory for the streamed path: scan of banded trace
    launches; returns ``[n_steps, 6, h, w]`` (entering state per
    substep), assembled in HBM."""
    from . import cloth_pallas_tiled as cpt

    k_sub = _STREAM_K_SUB
    assert n_steps % k_sub == 0
    band_h = cpt._pick_band(h, w, k_sub, use_pins)
    halo = 2 * k_sub
    band_ext = band_h + 2 * halo
    kernel = functools.partial(_trace_kernel_stream, h=h, w=w,
                               band_h=band_h, halo=halo, k_sub=k_sub,
                               use_pins=use_pins)
    launch = _tiled_specs(
        h, w, (band_h, band_ext), use_pins, interpret, kernel,
        extra_outs=[jax.ShapeDtypeStruct((k_sub, 6, h, w), jnp.float32)],
        extra_scratch=[pltpu.VMEM((6, band_ext, w), jnp.float32)])

    def body(c, _):
        p, v, traj = launch(pvec, c[0], c[1], pinm, pinpos)
        return (p, v), traj

    _, trajs = jax.lax.scan(body, (pos, vel), None,
                            length=n_steps // k_sub)
    return trajs.reshape(n_steps, 6, h, w)


def _bwd_kernel_stream(params_ref, traj_ref, pinm_ref, pinpos_ref,
                       ctpos_ref, ctvel_ref, out_ctpos, out_ctvel,
                       out_ctpin, out_ctprm, *scratch, h, w, n_steps,
                       use_pins, band):
    """Streamed banded transpose: identical math and accumulation order
    to :func:`_bwd_kernel_banded` (both call :func:`_band_passes`), but
    the whole-grid padded PRIMAL carry is replaced by a per-band DMA
    from the HBM trajectory, and the incoming/outgoing cotangents move
    by DMA at the first/last grid step. VMEM high-water: the two padded
    cotangent carries (2·6·(h+16)·w·4 B) + one primal band slice +
    re-linearization temporaries."""
    P = _BAND_PAD
    i = pl.program_id(0)
    ct_scr, ctn_scr, st_band = scratch[0], scratch[1], scratch[2]
    pin_scr = scratch[3] if use_pins else None
    acc_ref = scratch[-2]
    sems = scratch[-1]
    scal = _unpack_scal(params_ref)
    zero_pad_plane = jnp.zeros((P, w), jnp.float32)

    @pl.when(i == 0)
    def _():
        for j in range(6):
            ct_scr[j, 0:P] = zero_pad_plane
            ct_scr[j, P + h:] = zero_pad_plane
        cp_p = pltpu.make_async_copy(ctpos_ref, ct_scr.at[0:3, P:P + h, :],
                                     sems.at[1])
        cp_v = pltpu.make_async_copy(ctvel_ref, ct_scr.at[3:6, P:P + h, :],
                                     sems.at[2])
        cp_p.start()
        cp_v.start()
        if use_pins:
            for j in range(3):
                pin_scr[j] = jnp.zeros((h, w), jnp.float32)
        for j in range(_NP):
            acc_ref[j] = 0.0
        cp_p.wait()
        cp_v.wait()

    i_rev = n_steps - 1 - i
    for j in range(6):
        ctn_scr[j] = jnp.zeros((h + 2 * P, w), jnp.float32)
    pinm = pinm_ref[...] if use_pins else None

    def add_scal(j, s):
        acc_ref[9 + j] = acc_ref[9 + j] + s

    def add_fam(t, ck, cc_, cr):
        acc_ref[t] = acc_ref[t] + ck
        acc_ref[3 + t] = acc_ref[3 + t] + cc_
        acc_ref[6 + t] = acc_ref[6 + t] + cr

    n_bands = -(-h // band)

    def start_band_dma(jb):
        """Prefetch band jb's primal rows: DMA global rows [lo, hi) of
        this substep's trajectory entry into slot jb%2 at offset dst;
        out-of-range halo rows are zeroed VMEM (garbage would NaN-poison
        the vjps even under the masks). Rows disjoint from the DMA
        target, so zeroing overlaps the copy."""
        a = jb * band
        nb = min(band, h - a)
        hh = nb + 2 * P
        lo = max(0, a - P)
        hi = min(h, a + nb + P)
        dst = lo - (a - P)
        slot = jb % 2
        cp_tr = pltpu.make_async_copy(
            traj_ref.at[i_rev, :, lo:hi, :],
            st_band.at[slot, :, dst:dst + (hi - lo), :], sems.at[slot])
        cp_tr.start()
        if dst:
            st_band[slot, :, 0:dst] = jnp.zeros((6, dst, w), jnp.float32)
        if dst + (hi - lo) < hh:
            st_band[slot, :, dst + (hi - lo):hh] = jnp.zeros(
                (6, hh - dst - (hi - lo), w), jnp.float32)
        return cp_tr

    pending = start_band_dma(0)
    for jb in range(n_bands):
        a = jb * band
        nb = min(band, h - a)
        hh = nb + 2 * P
        g0 = a - P
        pending.wait()
        if jb + 1 < n_bands:
            # double-buffered prefetch: band jb+1's rows ride the DMA
            # engine while band jb's re-linearization runs (slot jb+1%2
            # was last read by band jb-1, already complete)
            pending = start_band_dma(jb + 1)
        slot = jb % 2
        band_state = tuple(st_band[slot, j, 0:hh] for j in range(6))

        fams = []
        for dr, dc, t in cp._FAMILIES:
            fams.append((t, functools.partial(
                _band_family_force, dr=dr, dc=dc,
                ok=_band_masks(h, w, dr, dc, g0, hh), hh=hh, w=w,
                lo=P, nrows=nb)))

        ct_out = tuple(ct_scr[j, P + a:P + a + nb] for j in range(6))
        pin_b = (pinm[a:a + nb] != 0.0) if use_pins else None
        pinpos_b = (pinpos_ref[0, a:a + nb], pinpos_ref[1, a:a + nb],
                    pinpos_ref[2, a:a + nb]) if use_pins else None

        def add_interior(j, v, a=a, nb=nb):
            ctn_scr[j, P + a:P + a + nb] = (
                ctn_scr[j, P + a:P + a + nb] + v)

        def add_halo(j, v, a=a, hh=hh):
            ctn_scr[j, a:a + hh] = ctn_scr[j, a:a + hh] + v

        def add_pin(j, v, a=a, nb=nb):
            pin_scr[j, a:a + nb] = pin_scr[j, a:a + nb] + v

        _band_passes(band_state, ct_out, scal, fams, pin_b, pinpos_b,
                     add_interior, add_halo, add_scal, add_fam, add_pin)

    for j in range(6):
        ct_scr[j] = ctn_scr[j]

    @pl.when(i == n_steps - 1)
    def _():
        cp_p = pltpu.make_async_copy(ct_scr.at[0:3, P:P + h, :], out_ctpos,
                                     sems.at[1])
        cp_v = pltpu.make_async_copy(ct_scr.at[3:6, P:P + h, :], out_ctvel,
                                     sems.at[2])
        cp_p.start()
        cp_v.start()
        if use_pins:
            cp_pin = pltpu.make_async_copy(pin_scr, out_ctpin, sems.at[3])
            cp_pin.start()
            cp_pin.wait()
        else:
            out_ctpin[...] = jnp.zeros((3, 1, 1), jnp.float32)
        for j in range(_NP):
            out_ctprm[j] = acc_ref[j]
        cp_p.wait()
        cp_v.wait()


def _bwd_call_stream(traj, pinm, pinpos, ct_pos, ct_vel, pvec, *, h, w,
                     n_steps, use_pins, interpret, band):
    kernel = functools.partial(_bwd_kernel_stream, h=h, w=w,
                               n_steps=n_steps, use_pins=use_pins,
                               band=band)
    hp = h + 2 * _BAND_PAD
    scratch = [pltpu.VMEM((6, hp, w), jnp.float32),          # ct carry
               pltpu.VMEM((6, hp, w), jnp.float32),          # ct accum
               # primal band slices, double-buffered for DMA prefetch
               pltpu.VMEM((2, 6, band + 2 * _BAND_PAD, w), jnp.float32)]
    if use_pins:
        scratch.append(pltpu.VMEM((3, h, w), jnp.float32))
    scratch.append(pltpu.SMEM((_NP,), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((4,)))
    pm, pp = pinm.shape, pinpos.shape
    if use_pins:
        pin_out_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        pin_out_spec = _full(pp)
    bwd = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        out_shape=(jax.ShapeDtypeStruct((3, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((3, h, w), jnp.float32),
                   jax.ShapeDtypeStruct(pp, jnp.float32),
                   jax.ShapeDtypeStruct((_NP,), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  _full(pm), _full(pp),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pin_out_spec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=scratch,
        compiler_params=_vmem_params(h, w),
        interpret=interpret,
    )
    return bwd(pvec, traj, pinm, pinpos, ct_pos, ct_vel)


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
        compiler_params=_vmem_params(h, w),
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
        compiler_params=_vmem_params(h, w),
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
        compiler_params=_vmem_params(h, w),
        interpret=interpret,
    )(pvec, traj, pinm, pinpos, ct_pos, ct_vel)


# ---------------------------------------------------------------------------
# custom_vjp segment + public API
# ---------------------------------------------------------------------------

def _default_band(h, w):
    """Band rows for the banded transpose kernels: ~64k particles per
    band (live temporary set ≈ 620 B/particle —
    tools/probes/probe_grad.py — so ~40 MB/band inside the raised VMEM
    window), 8-row aligned, at least 8. Round-5 sweep
    (tools/probes/probe_band512.py): wider bands win monotonically but
    flatten — 512²: band 16/32/64/128 = 8.08/8.93/9.51/9.62e8
    p-steps/s; 256²: band 32/128/whole = 6.09/6.39/6.42e8 (banding
    overhead is noise-level by ~32k particles/band); streamed 1024²:
    band 32/64 = 6.75/7.10e8."""
    return max(8, min(h, (65_536 // w) // 8 * 8))


@functools.lru_cache(maxsize=None)
def _segment_core(h, w, n_steps, use_pins, interpret, band=None,
                  stream=False):
    fwd = functools.partial(
        _fwd_call_stream if stream else _fwd_call, h=h, w=w,
        n_steps=n_steps, use_pins=use_pins, interpret=interpret)
    trace = functools.partial(
        _trace_call_stream if stream else _trace_call, h=h, w=w,
        n_steps=n_steps, use_pins=use_pins, interpret=interpret)
    if stream:
        bwd_call = functools.partial(_bwd_call_stream, h=h, w=w,
                                     n_steps=n_steps, use_pins=use_pins,
                                     interpret=interpret, band=band)
    else:
        bwd_call = functools.partial(_bwd_call, h=h, w=w, n_steps=n_steps,
                                     use_pins=use_pins, interpret=interpret,
                                     band=band)

    @jax.custom_vjp
    def seg(pos, vel, pinm, pinpos, pvec):
        return fwd(pos, vel, pinm, pinpos, pvec)

    def seg_fwd(pos, vel, pinm, pinpos, pvec):
        return fwd(pos, vel, pinm, pinpos, pvec), (pos, vel, pinm, pinpos,
                                                   pvec)

    def seg_bwd(res, ct):
        pos, vel, pinm, pinpos, pvec = res
        ct_pos, ct_vel = ct
        traj = trace(pos, vel, pinm, pinpos, pvec)
        ctp, ctv, ctpin, ctprm = bwd_call(traj, pinm, pinpos, ct_pos,
                                          ct_vel, pvec)
        return ctp, ctv, jnp.zeros_like(pinm), ctpin, ctprm

    seg.defvjp(seg_fwd, seg_bwd)
    return seg


def multi_step(state: ClothState, params, dt, n_steps: int,
               segment: Optional[int] = None,
               interpret: Optional[bool] = None,
               band: Optional[int] = None,
               stream: Optional[bool] = None) -> ClothState:
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
    ``_GRAD_VMEM_PARTICLE_LIMIT`` (128²), banded above it (~32k-particle
    bands). Pass explicitly to force banding on small grids (tests).

    ``stream``: force the STREAMED path (round 5 — primal via the
    production banded forward, trace via the halo-widened banded trace
    kernel, transpose with the primal band DMA'd from HBM per band).
    ``None`` = auto: streamed above ``_GRAD_BANDED_PARTICLE_LIMIT``
    (512²). The streamed path needs ``n_steps`` and ``segment``
    divisible by ``_STREAM_K_SUB`` (8).
    """
    if interpret is None:
        interpret = cp._default_interpret()
    if n_steps == 0:
        return state
    h, w = state.pos.shape[-2:]
    if stream is None:
        stream = h * w > _GRAD_BANDED_PARTICLE_LIMIT
    if h * w > _GRAD_STREAM_PARTICLE_LIMIT:
        # enforce the limit at the API that owns the kernels (the
        # streamed transpose's whole-grid cotangent carries outgrow the
        # raised VMEM window past 1024²) — callers wanting larger grids
        # use models/cloth.multi_step_diff, which routes them to the XLA
        # stencil + jax.checkpoint fallback
        raise ValueError(
            f"grid {h}x{w} exceeds the backward kernel's VMEM budget "
            f"({_GRAD_STREAM_PARTICLE_LIMIT} particles); use "
            "models.cloth.multi_step_diff for the XLA fallback")
    if stream:
        if n_steps % _STREAM_K_SUB:
            raise ValueError(
                f"streamed backward needs n_steps % {_STREAM_K_SUB} == 0 "
                f"(got {n_steps}); pad the horizon or use "
                "models.cloth.multi_step_diff's XLA fallback")
        if h % 8:
            raise ValueError(
                "streamed backward needs h % 8 == 0 (DMA row alignment); "
                "use models.cloth.multi_step_diff's XLA fallback")
    if segment is None:
        segment = min(n_steps, 32 if stream else 64)
    segment = min(segment, n_steps)
    if stream:
        segment = max(_STREAM_K_SUB,
                      segment - segment % _STREAM_K_SUB)
    if band is None and (stream or h * w > _GRAD_VMEM_PARTICLE_LIMIT):
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
        core = _segment_core(h, w, segment, use_pins, interpret, band,
                             stream)

        def body(c, _):
            return core(c[0], c[1], pinm, pinpos, pvec), None

        (pos, vel), _ = jax.lax.scan(body, (pos, vel), None, length=n_seg)
    if rem:
        core_r = _segment_core(h, w, rem, use_pins, interpret, band,
                               stream)
        pos, vel = core_r(pos, vel, pinm, pinpos, pvec)
    return state._replace(pos=pos, vel=vel)
