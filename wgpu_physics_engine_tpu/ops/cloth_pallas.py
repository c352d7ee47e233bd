"""Fused multi-substep cloth kernel (Pallas / Mosaic TPU).

The XLA scan path (models/cloth.py) round-trips pos/vel through HBM every
substep plus ~a dozen stencil intermediates (~150 µs/substep at 256×256).
This kernel runs ALL substeps of a launch inside one ``pallas_call`` with
the six state planes (x,y,z,vx,vy,vz — fp32 [H,W]) resident in VMEM, so
HBM is touched exactly twice: initial load and final store. The stencil
is computed with cyclic lane/sublane rotates (``pltpu.roll``) plus
validity masks instead of the XLA path's slice/pad scatter-adds.

Semantics are identical to models/cloth.py (the WGSL contract,
forces.wgsl:143-313 + compute_movement.wgsl:70-174): same edge-force
expressions, same stencil accumulation order, same integrate/contact/
friction/projection order, same fixed-pin extension.

Reference workload mapping: this one kernel replaces the reference's three
chained compute passes per substep (dispatch_compute, cloth.rs:1283-1327)
AND the per-substep host uniform write (cloth.rs:1488) — the host submits
one launch per frame (or per checkpoint interval), not per substep.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.state import ClothParams, ClothState

_EPS = 1e-6

# Spring families: (dr, dc, k-index) — identical order to models/cloth.py.
_FAMILIES = (
    (0, 1, 0), (1, 0, 0),     # structural right, down
    (1, 1, 1), (1, -1, 1),    # shear down-right, down-left
    (0, 2, 2), (2, 0, 2),     # bend 2-right, 2-down
)

# Param vector layout (SMEM), all float32:
# 0:k_struct 1:k_shear 2:k_bend 3:c_struct 4:c_shear 5:c_bend
# 6:rest_struct 7:rest_shear 8:rest_bend 9:k_contact 10:mu 11:mass
# 12:gravity 13:damp_factor(=speed_damp**dt) 14:min_dist(globe_r+particle_r)
# 15:dt
_NP = 16


def _shift(x, dr, dc, h, w):
    """result[r, c] = x[(r+dr) % h, (c+dc) % w] via cyclic rotates."""
    if dr:
        x = pltpu.roll(x, (-dr) % h, axis=0)
    if dc:
        x = pltpu.roll(x, (-dc) % w, axis=1)
    return x


def _family_masks(h, w, dr, dc, dtype=jnp.float32):
    """Validity mask [h, w] for edges anchored at p0=(r,c): both endpoints
    must be real grid cells (no wraparound)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ok = rows < (h - dr)
    if dc >= 0:
        ok = ok & (cols < (w - dc))
    else:
        ok = ok & (cols >= -dc)
    return ok


def _substep_planes(carry, masks, scal, dist_inv, pins=None, fext=None):
    """One physics substep on six ``[h, w]`` planes (x, y, z, vx, vy, vz).

    The body of the fused kernel's loop, factored out so the grad-path
    trace kernel (ops/cloth_pallas_grad.py) steps with the IDENTICAL
    expressions — the backward pass recomputes the forward trajectory and
    must reproduce it exactly.

    ``masks``: per-family validity planes (order = ``_FAMILIES``);
    ``scal``: ``(k3, c3, rest3, k_contact, mu, mass, gravity, damp_factor,
    min_dist, dt)``; ``pins``: ``(pin_bool, px, py, pz)`` or None;
    ``fext``: ``(fx, fy, fz)`` external force planes or None.
    """
    x, y, z, vx, vy, vz = carry
    h, w = x.shape
    k, c, rest, k_contact, mu, mass, gravity, damp_factor, min_dist, dt = scal

    # ---- spring stencil (forces.wgsl:143-313) ----
    fx = jnp.zeros((h, w), jnp.float32)
    fy = jnp.zeros((h, w), jnp.float32)
    fz = jnp.zeros((h, w), jnp.float32)
    # rows-shifted planes shared by the (1,0), (1,1), (1,-1) families
    row1 = [pltpu.roll(a, (-1) % h, axis=0) for a in (x, y, z, vx, vy, vz)]
    for fam_idx, (dr, dc, t) in enumerate(_FAMILIES):
        ok = masks[fam_idx]
        if dr == 1:
            planes = row1
            if dc:
                planes = [pltpu.roll(a, (-dc) % w, axis=1) for a in planes]
            p1x, p1y, p1z, v1x, v1y, v1z = planes
        else:
            p1x, p1y, p1z = (_shift(a, dr, dc, h, w) for a in (x, y, z))
            v1x, v1y, v1z = (_shift(a, dr, dc, h, w) for a in (vx, vy, vz))
        dxv, dyv, dzv = p1x - x, p1y - y, p1z - z
        dist, inv = dist_inv(dxv * dxv + dyv * dyv + dzv * dzv)
        safe = dist >= _EPS
        ux, uy, uz = dxv * inv, dyv * inv, dzv * inv
        stretch = dist - rest[t]
        v_along = (v1x - vx) * ux + (v1y - vy) * uy + (v1z - vz) * uz
        s = k[t] * stretch + c[t] * v_along
        keep = ok & safe
        ex = jnp.where(keep, s * ux, 0.0)
        ey = jnp.where(keep, s * uy, 0.0)
        ez = jnp.where(keep, s * uz, 0.0)
        fx = fx + ex
        fy = fy + ey
        fz = fz + ez
        # reaction on p1: shift E back by (+dr, +dc); masked zeros wrap
        fx = fx - _shift(ex, -dr, -dc, h, w)
        fy = fy - _shift(ey, -dr, -dc, h, w)
        fz = fz - _shift(ez, -dr, -dc, h, w)

    # ---- external force (self-contact narrow phase), then
    # ---- integrate (compute_movement.wgsl:70-174) ----
    if fext is not None:
        fx = fx + fext[0]
        fy = fy + fext[1]
        fz = fz + fext[2]
    fy = fy + mass * gravity

    dist, inv_d = dist_inv(x * x + y * y + z * z)
    in_contact = (dist < min_dist) & (dist > _EPS)
    nx, ny, nz = x * inv_d, y * inv_d, z * inv_d
    pen = k_contact * (min_dist - dist)
    fx = jnp.where(in_contact, fx + pen * nx, fx)
    fy = jnp.where(in_contact, fy + pen * ny, fy)
    fz = jnp.where(in_contact, fz + pen * nz, fz)

    ro_n = fx * nx + fy * ny + fz * nz
    tx, ty, tz = fx - ro_n * nx, fy - ro_n * ny, fz - ro_n * nz
    tmag, inv_t = dist_inv(tx * tx + ty * ty + tz * tz)
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

    fdist, inv_f = dist_inv(x * x + y * y + z * z)
    pen2 = fdist < min_dist
    pen_safe = pen2 & (fdist > _EPS)
    pen_center = pen2 & jnp.logical_not(pen_safe)
    x = jnp.where(pen_safe, x * inv_f * min_dist, jnp.where(pen_center, 0.0, x))
    y = jnp.where(pen_safe, y * inv_f * min_dist, jnp.where(pen_center, min_dist, y))
    z = jnp.where(pen_safe, z * inv_f * min_dist, jnp.where(pen_center, 0.0, z))
    vx = jnp.where(pen2, 0.0, vx)
    vy = jnp.where(pen2, 0.0, vy)
    vz = jnp.where(pen2, 0.0, vz)

    if pins is not None:
        pin, px_pin, py_pin, pz_pin = pins
        x = jnp.where(pin, px_pin, x)
        y = jnp.where(pin, py_pin, y)
        z = jnp.where(pin, pz_pin, z)
        vx = jnp.where(pin, 0.0, vx)
        vy = jnp.where(pin, 0.0, vy)
        vz = jnp.where(pin, 0.0, vz)
    return x, y, z, vx, vy, vz


def _exact_dist_inv(d2):
    """(dist, 1/dist) with the zero guard; d2 = squared distance."""
    dist = jnp.sqrt(d2)
    safe = dist >= _EPS
    inv = jnp.where(safe, 1.0 / jnp.where(safe, dist, 1.0), 0.0)
    return dist, inv


def _fast_dist_inv(d2):
    """rsqrt formulation (≈1 ulp vs sqrt+divide; ~10% kernel speedup)."""
    pos_d2 = d2 > _EPS * _EPS
    inv = jax.lax.rsqrt(jnp.where(pos_d2, d2, 1.0))
    return jnp.where(pos_d2, d2 * inv, 0.0), jnp.where(pos_d2, inv, 0.0)


def _kernel(params_ref, *refs, h, w, n_steps, use_pins, fast_math=False,
            window=False, extra_force=False):
    """Fused multi-substep body. With ``window=True`` an extra leading
    ``window_ref`` (SMEM int32 [2] = (row0, h_global)) precedes the state
    refs: the block is a halo-extended window of a larger grid whose row 0
    sits at GLOBAL row ``row0`` (may be negative on the top boundary
    shard), and spring masks use global row validity — the shard-local
    body of the distributed path (parallel/mesh.py).

    With ``extra_force=True`` a trailing ``fext_ref`` ([3, h, w] VMEM)
    follows ``pinpos_ref``: a per-particle external force added to the
    spring accumulation each substep (the cloth self-collision narrow
    phase feeds its pair forces in here — models/cloth docstrings)."""
    fext_ref = None
    if window:
        if extra_force:
            (window_ref, pos_ref, vel_ref, pinm_ref, pinpos_ref, fext_ref,
             pos_out, vel_out) = refs
        else:
            (window_ref, pos_ref, vel_ref, pinm_ref, pinpos_ref,
             pos_out, vel_out) = refs
    elif extra_force:
        (pos_ref, vel_ref, pinm_ref, pinpos_ref, fext_ref,
         pos_out, vel_out) = refs
    else:
        pos_ref, vel_ref, pinm_ref, pinpos_ref, pos_out, vel_out = refs
    prm = lambda i: params_ref[i]
    k = (prm(0), prm(1), prm(2))
    c = (prm(3), prm(4), prm(5))
    rest = (prm(6), prm(7), prm(8))
    k_contact, mu, mass = prm(9), prm(10), prm(11)
    gravity, damp_factor, min_dist, dt = prm(12), prm(13), prm(14), prm(15)

    x, y, z = pos_ref[0], pos_ref[1], pos_ref[2]
    vx, vy, vz = vel_ref[0], vel_ref[1], vel_ref[2]
    if use_pins:
        pin = pinm_ref[...] != 0.0
        px_pin, py_pin, pz_pin = pinpos_ref[0], pinpos_ref[1], pinpos_ref[2]

    if window:
        # masks from GLOBAL row ids: an edge is real iff both endpoints are
        # inside the global grid (halo rows past the boundary are dead) AND
        # it does not wrap the local window
        row0 = window_ref[0]
        h_global = window_ref[1]
        lrow = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        grow = lrow + row0
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        masks = []
        for dr, dc, _ in _FAMILIES:
            ok = (grow >= 0) & (grow < h_global - dr) & (lrow < h - dr)
            if dc >= 0:
                ok = ok & (cols < (w - dc))
            else:
                ok = ok & (cols >= -dc)
            masks.append(ok)
    else:
        masks = [_family_masks(h, w, dr, dc) for dr, dc, _ in _FAMILIES]

    dist_inv = _fast_dist_inv if fast_math else _exact_dist_inv
    scal = (k, c, rest, k_contact, mu, mass, gravity, damp_factor, min_dist,
            dt)
    pins = (pin, px_pin, py_pin, pz_pin) if use_pins else None
    fext = ((fext_ref[0], fext_ref[1], fext_ref[2]) if extra_force
            else None)

    def substep(_, carry):
        return _substep_planes(carry, masks, scal, dist_inv, pins=pins,
                               fext=fext)

    x, y, z, vx, vy, vz = jax.lax.fori_loop(
        0, n_steps, substep, (x, y, z, vx, vy, vz))

    pos_out[0], pos_out[1], pos_out[2] = x, y, z
    vel_out[0], vel_out[1], vel_out[2] = vx, vy, vz


def _pack_params(p: ClothParams, dt: jnp.ndarray) -> jnp.ndarray:
    dt = jnp.float32(dt)
    return jnp.stack([
        p.k_struct, p.k_shear, p.k_bend,
        p.c_struct, p.c_shear, p.c_bend,
        p.rest_struct, p.rest_shear, p.rest_bend,
        p.k_contact, p.mu, p.mass, p.gravity,
        jnp.power(p.speed_damp, dt),          # damp factor, constant per launch
        p.globe_radius + p.particle_radius,   # min_dist
        dt,
    ]).astype(jnp.float32)


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


# The fused kernel keeps 6 state planes + stencil temporaries VMEM-resident;
# beyond ~100k particles (256x256 = 65,536 is the flagship) Mosaic can't fit
# the working set and compilation fails — fall back to the XLA stencil path
# (or shard spatially across chips, parallel/mesh.py).
_VMEM_PARTICLE_LIMIT = 100_000

# Per-program budget for the grid=(B,) batched-worlds kernel: smaller than
# the single-world limit because Mosaic double-buffers the (1, 3, h, w)
# in/out blocks across programs. 128x128 fits; the 60x60 datagen scene is
# the target workload.
_BATCHED_VMEM_PARTICLE_LIMIT = 32_768


def _batched_kernel(params_ref, pos_ref, vel_ref, pinm_ref, pinpos_ref,
                    pos_out, vel_out, *, h, w, n_steps, use_pins,
                    fast_math=False):
    """grid=(B,) variant of :func:`_kernel`: one program per WORLD, each
    stepping its own (1, 3, h, w) state block ``n_steps`` substeps with
    its own row of the full [B, _NP] SMEM params table, indexed by
    program id (Mosaic rejects BLOCKED SMEM specs whose second-to-last
    dim is neither 8-divisible nor full — so the whole table rides in
    SMEM; at f32 it stays tiny, ~64 B/world). Per world this runs the IDENTICAL
    ``_substep_planes`` expressions as the single-world kernel — bitwise
    equal — while amortizing one kernel launch over the whole batch
    (the per-world ``lax.map`` it replaces measured ~2.6 ms/world at
    60x60x24 substeps on v5e: all launch+dispatch, ~100x the compute)."""
    world = pl.program_id(0)
    prm = lambda i: params_ref[world, i]
    k = (prm(0), prm(1), prm(2))
    c = (prm(3), prm(4), prm(5))
    rest = (prm(6), prm(7), prm(8))
    k_contact, mu, mass = prm(9), prm(10), prm(11)
    gravity, damp_factor, min_dist, dt = prm(12), prm(13), prm(14), prm(15)

    x, y, z = pos_ref[0, 0], pos_ref[0, 1], pos_ref[0, 2]
    vx, vy, vz = vel_ref[0, 0], vel_ref[0, 1], vel_ref[0, 2]
    pins = None
    if use_pins:
        pins = (pinm_ref[0] != 0.0, pinpos_ref[0, 0], pinpos_ref[0, 1],
                pinpos_ref[0, 2])

    masks = [_family_masks(h, w, dr, dc) for dr, dc, _ in _FAMILIES]
    dist_inv = _fast_dist_inv if fast_math else _exact_dist_inv
    scal = (k, c, rest, k_contact, mu, mass, gravity, damp_factor, min_dist,
            dt)

    def substep(_, carry):
        return _substep_planes(carry, masks, scal, dist_inv, pins=pins)

    x, y, z, vx, vy, vz = jax.lax.fori_loop(
        0, n_steps, substep, (x, y, z, vx, vy, vz))

    pos_out[0, 0], pos_out[0, 1], pos_out[0, 2] = x, y, z
    vel_out[0, 0], vel_out[0, 1], vel_out[0, 2] = vx, vy, vz


def _lanes_kernel(params_ref, pos_ref, vel_ref, pinm_ref, pinpos_ref,
                  pos_out, vel_out, *, h, w, real_h, real_w, g, n_steps,
                  use_pins, fast_math=False):
    """Lane-folded batched-worlds body: each program steps ``g`` worlds
    packed side by side along the LANE axis as six [h, g*w] planes, where
    ``(h, w)`` are the per-world dims PADDED to register-tile alignment
    (rows to a multiple of 8, total lanes g*w to a multiple of 128) and
    ``(real_h, real_w)`` are the live grid dims.

    Why: the grid=(B,) kernel (:func:`_batched_kernel`) rolls its planes
    modulo the RAW grid extents — at the 60x60 datagen scene neither 60
    rows (not 8-divisible) nor 60 lanes (not 128-divisible) is
    tile-aligned, so Mosaic lowers every stencil roll through its
    unaligned slow path. Folding g padded worlds into the lanes makes
    every roll an aligned tile rotate over a [8k, 128m] block AND
    amortizes per-op issue cost g-fold. Measured on v5e at the BASELINE
    datagen scene (512 worlds x 60x60, 24 substeps, scalar-sync timing —
    tools/probes/probe_lanes.py, Aug 19): grid=(B,) 5.8 us/substep/world
    vs lane-folded 2.9 — a 2.1x end-to-end win (1.26e9 p-steps/s; at
    this size the launch is near dispatch-bound, so the per-roll gap is
    larger than the end-to-end ratio shows).

    Correctness: rolls along the lane axis wrap from one world's padding
    into its neighbor, but the spring validity masks use the LOCAL column
    ``col % w`` against ``real_w`` (and rows against ``real_h``) —
    cross-world and into-padding edges are masked off exactly like the
    single-world kernel masks its own wraparound columns, and the
    reaction back-shift only ever moves masked zeros across world/pad
    boundaries. Pad cells evolve under gravity alone (zero-initialised,
    spring-decoupled; they settle onto the globe contact surface, always
    finite) and are sliced away on unfold. Per-world scalar params ride
    as [1, g*w] planes (column-constant within each world); every
    expression in :func:`_substep_planes` is elementwise in the lane
    axis, so a broadcast multiply by the plane is bitwise identical to
    the scalar multiply of the per-world kernel. Pinned to
    test_lanes_kernel_bitwise_matches_per_world.
    """
    gw = g * w
    prm = lambda i: params_ref[0, i].reshape(1, gw)
    k = (prm(0), prm(1), prm(2))
    c = (prm(3), prm(4), prm(5))
    rest = (prm(6), prm(7), prm(8))
    k_contact, mu, mass = prm(9), prm(10), prm(11)
    gravity, damp_factor, min_dist, dt = prm(12), prm(13), prm(14), prm(15)

    x, y, z = pos_ref[0, 0], pos_ref[0, 1], pos_ref[0, 2]
    vx, vy, vz = vel_ref[0, 0], vel_ref[0, 1], vel_ref[0, 2]
    pins = None
    if use_pins:
        pins = (pinm_ref[0] != 0.0, pinpos_ref[0, 0], pinpos_ref[0, 1],
                pinpos_ref[0, 2])

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, gw), 0)
    lcol = jax.lax.broadcasted_iota(jnp.int32, (h, gw), 1) % w
    masks = []
    for dr, dc, _ in _FAMILIES:
        ok = rows < (real_h - dr)
        if dc >= 0:
            ok = ok & (lcol < (real_w - dc))
        else:
            ok = ok & (lcol >= -dc) & (lcol < real_w)
        masks.append(ok)

    dist_inv = _fast_dist_inv if fast_math else _exact_dist_inv
    scal = (k, c, rest, k_contact, mu, mass, gravity, damp_factor, min_dist,
            dt)

    def substep(_, carry):
        return _substep_planes(carry, masks, scal, dist_inv, pins=pins)

    x, y, z, vx, vy, vz = jax.lax.fori_loop(
        0, n_steps, substep, (x, y, z, vx, vy, vz))

    pos_out[0, 0], pos_out[0, 1], pos_out[0, 2] = x, y, z
    vel_out[0, 0], vel_out[0, 1], vel_out[0, 2] = vx, vy, vz


# Lane-folded batched kernel sizing: cap the folded plane at the
# flagship's footprint (256^2 = 64k f32 per plane fits in VMEM with all
# stencil temporaries) and the lane extent at 4096.
# 57,344 (56 KiB of lanes × 8 rows), NOT the flagship 65,536: at the
# 60×60 datagen scene a 64×1024 folded plane (g=16) measured 16.12M of
# scoped VMEM at 4096 worlds — 124 KB over the 16M limit (the identical
# per-program shapes compiled fine at 512 worlds; Mosaic's buffering
# differs with grid length). One group step down (g=14, 64×896) fits
# with margin at every batch size, costing ~7% lane amortization on a
# phase that is a small share of the datagen frame.
_LANES_PLANE_LIMIT = 57_344
_LANES_MAX_LANES = 4096


def _pick_lane_group(b: int, hp: int, wp: int) -> int:
    """World count per program: the largest multiple of the lane-alignment
    quantum m = 128/gcd(wp, 128) (so g*wp is a 128-multiple and every
    lane roll stays tile-aligned) that fits the plane budget. Falls back
    to the largest unaligned count (>= 1, correct but slow rolls) when
    even one aligned group is over budget."""
    import math

    m = 128 // math.gcd(wp, 128)
    budget = min(_LANES_PLANE_LIMIT // (hp * wp),
                 _LANES_MAX_LANES // wp)
    if budget >= m:
        g = (budget // m) * m
    else:
        g = max(budget, 1)
    # no point padding past the batch: shrink to cover b, keeping alignment
    need = -(b // -m) * m
    return max(min(g, need), 1)


def _multi_step_lanes(state: ClothState, params: ClothParams,
                      dt: jnp.ndarray, n_steps: int, interpret: bool,
                      fast_math: bool, group: Optional[int] = None
                      ) -> ClothState:
    """Batched-worlds stepping via the lane-folded kernel
    (:func:`_lanes_kernel`): each world is zero-padded to tile-aligned
    dims (rows to 8, columns to 8 with the group chosen so total lanes
    are a 128-multiple), then ``group`` worlds are packed per program
    along the lane axis, grid = ceil(B / group). ``state.pos`` is
    [B, 3, h, w]; params leaves are [B] or scalar; pins, if present,
    batched alongside. Bitwise equal per world to the single-world
    kernel."""
    b = state.pos.shape[0]
    h, w = state.pos.shape[-2:]
    hp = -(h // -8) * 8
    wp = -(w // -8) * 8
    use_pins = state.pin_mask is not None
    g = _pick_lane_group(b, hp, wp) if group is None else group
    nb = -(b // -g)
    pad = nb * g - b
    gw = g * wp

    bparams = jax.tree.map(
        lambda leaf: jnp.broadcast_to(jnp.asarray(leaf, jnp.float32), (b,)),
        params)
    pvec = jax.vmap(lambda p: _pack_params(p, dt))(bparams)   # [B, _NP]

    def fold(a, lead):
        # [B, *lead, h, w] -> [nb, *lead, hp, g*wp]
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0)
        widths = [(0, 0)] * (1 + lead) + [(0, hp - h), (0, wp - w)]
        a = jnp.pad(a, widths)
        a = a.reshape((nb, g) + a.shape[1:])
        perm = (0,) + tuple(range(2, 2 + lead)) + (2 + lead, 1, 3 + lead)
        a = a.transpose(perm)
        return a.reshape(a.shape[:-2] + (gw,))

    def unfold(a, lead):
        # [nb, *lead, hp, g*wp] -> [B, *lead, h, w]
        a = a.reshape(a.shape[:-1] + (g, wp))
        inv = (0, 2 + lead) + tuple(range(1, 1 + lead)) + (1 + lead, 3 + lead)
        a = a.transpose(inv)
        return a.reshape((nb * g,) + a.shape[2:])[:b, ..., :h, :w]

    # params: [B, _NP] -> [nb, _NP, g*wp] (column-constant per world)
    pv = pvec
    if pad:
        pv = jnp.concatenate(
            [pv, jnp.broadcast_to(pv[:1], (pad, _NP))], axis=0)
    pv = pv.reshape(nb, g, _NP).transpose(0, 2, 1)            # [nb, _NP, g]
    pv = jnp.broadcast_to(pv[..., None], (nb, _NP, g, wp))
    pv = pv.reshape(nb, _NP, gw)

    fpos = fold(state.pos, 1)
    fvel = fold(state.vel, 1)
    if use_pins:
        pinm = fold(state.pin_mask.astype(jnp.float32), 0)    # [nb, hp, gw]
        pinpos = fold(state.pin_pos, 1)                       # [nb, 3, hp, gw]
        pin_specs = [pl.BlockSpec((1, hp, gw), lambda i: (i, 0, 0)),
                     pl.BlockSpec((1, 3, hp, gw), lambda i: (i, 0, 0, 0))]
    else:
        pinm = jnp.zeros((1, 1, 1), jnp.float32)
        pinpos = jnp.zeros((1, 3, 1, 1), jnp.float32)
        pin_specs = [pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0)),
                     pl.BlockSpec((1, 3, 1, 1), lambda i: (0, 0, 0, 0))]

    kernel = functools.partial(
        _lanes_kernel, h=hp, w=wp, real_h=h, real_w=w, g=g, n_steps=n_steps,
        use_pins=use_pins, fast_math=fast_math)
    state_spec = pl.BlockSpec((1, 3, hp, gw), lambda i: (i, 0, 0, 0))
    out_pos, out_vel = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 3, hp, gw), jnp.float32),
            jax.ShapeDtypeStruct((nb, 3, hp, gw), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, _NP, gw), lambda i: (i, 0, 0)),
            state_spec,
            state_spec,
        ] + pin_specs,
        out_specs=(state_spec, state_spec),
        interpret=interpret,
    )(pv, fpos, fvel, pinm, pinpos)
    return state._replace(pos=unfold(out_pos, 1), vel=unfold(out_vel, 1))


def _multi_step_batched(state: ClothState, params: ClothParams,
                        dt: jnp.ndarray, n_steps: int, interpret: bool,
                        fast_math: bool) -> ClothState:
    """Batched-worlds fused stepping: ONE kernel launch for all B worlds
    (see :func:`_batched_kernel`). ``state.pos`` is [B, 3, h, w]; params
    leaves are [B] or scalar; pins, if present, are batched alongside."""
    b = state.pos.shape[0]
    h, w = state.pos.shape[-2:]
    use_pins = state.pin_mask is not None

    bparams = jax.tree.map(
        lambda leaf: jnp.broadcast_to(jnp.asarray(leaf, jnp.float32), (b,)),
        params)
    pvec = jax.vmap(lambda p: _pack_params(p, dt))(bparams)   # [B, _NP]

    if use_pins:
        pinm = state.pin_mask.astype(jnp.float32)             # [B, h, w]
        pinpos = state.pin_pos                                # [B, 3, h, w]
        pin_specs = [pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                     pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0))]
    else:
        pinm = jnp.zeros((1, 1, 1), jnp.float32)
        pinpos = jnp.zeros((1, 3, 1, 1), jnp.float32)
        pin_specs = [pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0)),
                     pl.BlockSpec((1, 3, 1, 1), lambda i: (0, 0, 0, 0))]

    kernel = functools.partial(
        _batched_kernel, h=h, w=w, n_steps=n_steps, use_pins=use_pins,
        fast_math=fast_math)
    state_spec = pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0))
    out_pos, out_vel = pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=(
            jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            state_spec,
            state_spec,
        ] + pin_specs,
        out_specs=(state_spec, state_spec),
        interpret=interpret,
    )(pvec, state.pos, state.vel, pinm, pinpos)
    return state._replace(pos=out_pos, vel=out_vel)


@functools.partial(jax.jit, static_argnames=("n_steps", "interpret", "fast_math"))
def multi_step(state: ClothState, params: ClothParams, dt: jnp.ndarray,
               n_steps: int, interpret: Optional[bool] = None,
               fast_math: bool = False) -> ClothState:
    """Run ``n_steps`` substeps in ONE fused kernel launch. Drop-in
    equivalent of :func:`models.cloth.multi_step`.

    ``fast_math=True`` computes distances with rsqrt instead of
    sqrt+divide (~10% faster, deviates from the exact path by ≈1 ulp per
    step — fine for datagen, off for fidelity-critical runs).

    Batched states (``pos`` [B, 3, H, W]) run as ONE grid=(B,) kernel
    launch — one program per world with a per-world SMEM params row
    (:func:`_batched_kernel`; bitwise equal per world to the single-world
    kernel). Grids past the per-program budget fall back to a per-world
    ``lax.map`` of the single-world dispatch. Batched states require
    batched params (leaves [B]) or shared scalars; pins must be batched
    alongside if present.
    """
    if interpret is None:
        interpret = _default_interpret()
    if state.pos.ndim == 4:
        hb, wb = state.pos.shape[-2:]
        if hb * wb <= _BATCHED_VMEM_PARTICLE_LIMIT:
            return _multi_step_lanes(state, params, dt, n_steps,
                                     interpret, fast_math)
        if jnp.ndim(params.k_struct) >= 1:
            return jax.lax.map(
                lambda x: multi_step(x[0], x[1], dt, n_steps, interpret,
                                     fast_math), (state, params))
        return jax.lax.map(
            lambda s: multi_step(s, params, dt, n_steps, interpret, fast_math),
            state)
    h, w = state.pos.shape[-2:]
    if h * w > _VMEM_PARTICLE_LIMIT:
        # banded kernel with in-chip halo widening (bitwise-equal at sizes
        # where both run; 512x512 measures ~2e9 p-steps/s vs ~8e7 for XLA)
        if h % 8 == 0:
            from . import cloth_pallas_tiled

            sched = cloth_pallas_tiled.pick_schedule(
                h, w, n_steps, use_pins=state.pin_mask is not None)
            if sched is not None:
                return cloth_pallas_tiled.multi_step(
                    state, params, dt, n_steps, k_sub=sched[0],
                    interpret=interpret)
        from ..models import cloth
        from ..utils.metrics import get_logger

        get_logger().warning(
            "grid %dx%d exceeds the fused-kernel VMEM budget and no banded "
            "schedule fits (h %% 8 != 0 or n_steps indivisible); stepping "
            "with the ~10-60x slower XLA stencil path", h, w)
        return cloth.multi_step(state, params, dt, n_steps)
    use_pins = state.pin_mask is not None
    pvec = _pack_params(params, dt)
    if use_pins:
        pinm = state.pin_mask.astype(jnp.float32)
        pinpos = state.pin_pos
    else:
        pinm = jnp.zeros((1, 1), jnp.float32)
        pinpos = jnp.zeros((3, 1, 1), jnp.float32)

    kernel = functools.partial(
        _kernel, h=h, w=w, n_steps=n_steps, use_pins=use_pins,
        fast_math=fast_math)
    out_pos, out_vel = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((3, h, w), jnp.float32),
            jax.ShapeDtypeStruct((3, h, w), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pvec, state.pos, state.vel, pinm, pinpos)
    return state._replace(pos=out_pos, vel=out_vel)


def substep_with_force(state: ClothState, params: ClothParams,
                       dt: jnp.ndarray, f_extra: jnp.ndarray,
                       interpret: Optional[bool] = None,
                       fast_math: bool = False) -> ClothState:
    """ONE fused substep with an external per-particle force added to the
    spring accumulation — springs + f_extra + contact/friction/integrate/
    projection/pins in a single kernel launch. The cloth self-collision
    loop uses this so only the pair narrow phase (the slab kernel) runs
    outside; everything else stays VMEM-resident instead of the ~1 ms XLA
    stencil pass per substep. fp32-identical op order to
    ``cloth.substep_self_collide``'s spring+f_self accumulation."""
    if interpret is None:
        interpret = _default_interpret()
    h, w = state.pos.shape[-2:]
    use_pins = state.pin_mask is not None
    pvec = _pack_params(params, dt)
    if use_pins:
        pinm = state.pin_mask.astype(jnp.float32)
        pinpos = state.pin_pos
    else:
        pinm = jnp.zeros((1, 1), jnp.float32)
        pinpos = jnp.zeros((3, 1, 1), jnp.float32)

    kernel = functools.partial(
        _kernel, h=h, w=w, n_steps=1, use_pins=use_pins,
        fast_math=fast_math, extra_force=True)
    out_pos, out_vel = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((3, h, w), jnp.float32),
            jax.ShapeDtypeStruct((3, h, w), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pvec, state.pos, state.vel, pinm, pinpos, f_extra)
    return state._replace(pos=out_pos, vel=out_vel)


def multi_step_window(pos, vel, pin_mask, pin_pos, params, dt, n_steps: int,
                      row0, h_global: int, interpret: Optional[bool] = None,
                      fast_math: bool = False):
    """``n_steps`` fused substeps on a halo-extended WINDOW of a larger
    grid — the shard-local body of the spatially-sharded multi-chip path
    (parallel/mesh.py calls this inside ``shard_map``).

    ``pos``/``vel``: local ``[3, h_ext, W]`` including halo rows already
    exchanged by the caller; ``row0``: GLOBAL row index of local row 0
    (traced int32; negative on the top shard where halo rows are dead);
    ``h_global``: global grid height. Spring masks use global row
    validity, so boundary semantics match the unsharded kernel exactly;
    halo staleness is the caller's business (halo widening: 2 rows per
    substep). Returns ``(pos, vel)`` including the (stale) halo rows —
    the caller slices the center.
    """
    if interpret is None:
        interpret = _default_interpret()
    h, w = pos.shape[-2:]
    use_pins = pin_mask is not None
    pvec = _pack_params(params, dt)
    wvec = jnp.stack([jnp.int32(row0), jnp.int32(h_global)])
    if use_pins:
        pinm = pin_mask.astype(jnp.float32)
        pinpos = pin_pos
    else:
        pinm = jnp.zeros((1, 1), jnp.float32)
        pinpos = jnp.zeros((3, 1, 1), jnp.float32)

    kernel = functools.partial(
        _kernel, h=h, w=w, n_steps=n_steps, use_pins=use_pins,
        fast_math=fast_math, window=True)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((3, h, w), jnp.float32),
            jax.ShapeDtypeStruct((3, h, w), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pvec, wvec, pos, vel, pinm, pinpos)
