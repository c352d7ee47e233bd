"""Tiled fused cloth kernel for grids beyond the single-block VMEM budget.

The flagship kernel (cloth_pallas.py) keeps the WHOLE grid in VMEM, which
caps it at ~100k particles. This kernel lifts the cap with row *bands*:

* grid = (n_bands,); each band DMAs its rows plus a 2K-row halo from HBM
  into VMEM scratch, runs K substeps locally, and DMAs the center rows back,
* correctness by halo widening (same argument as the distributed path,
  parallel/mesh.py): the stencil reaches 2 rows/substep, so a 2K halo from
  the launch-entry snapshot stays valid for K substeps; the stale margin is
  never written back,
* near the global top/bottom the window shifts inward and the spring masks
  switch to GLOBAL row indices, so boundary semantics are exact.

HBM traffic ≈ state moved once per K substeps (vs once per substep for the
XLA path): at 512×512 with K=8 that is ~0.9 MB/substep against ~25+ MB of
XLA-path intermediates.

Semantics identical to models/cloth.py (forces.wgsl + compute_movement.wgsl
order), including fixed pins (window-sliced pin arrays, like the
distributed path's halo pins).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.state import ClothParams, ClothState
from .cloth_pallas import _FAMILIES, _pack_params, _shift

_EPS = 1e-6


def _kernel(params_ref, pos_hbm, vel_hbm, pinm_hbm, pinpos_hbm,
            pos_out, vel_out,
            sp, sv, so_p, so_v, spinm, spinpos, sems, *,
            h, w, band_h, halo, k_sub, use_pins):
    band = pl.program_id(0)
    band_ext = band_h + 2 * halo
    window_start = jnp.clip(band * band_h - halo, 0, h - band_ext)
    # all offsets are multiples of 8 by construction (band_h, halo are);
    # Mosaic needs the hint to allow sublane-tiled dynamic DMA slices
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
            pinm_hbm.at[pl.ds(window_start, band_ext), :], spinm, sems.at[4])
        cp_in_pp = pltpu.make_async_copy(
            pinpos_hbm.at[:, pl.ds(window_start, band_ext), :], spinpos,
            sems.at[5])
        cp_in_m.start()
        cp_in_pp.start()
        cp_in_m.wait()
        cp_in_pp.wait()
    cp_in_p.wait()
    cp_in_v.wait()

    prm = lambda i: params_ref[i]
    k = (prm(0), prm(1), prm(2))
    c = (prm(3), prm(4), prm(5))
    rest = (prm(6), prm(7), prm(8))
    k_contact, mu, mass = prm(9), prm(10), prm(11)
    gravity, damp_factor, min_dist, dt = prm(12), prm(13), prm(14), prm(15)

    x, y, z = sp[0], sp[1], sp[2]
    vx, vy, vz = sv[0], sv[1], sv[2]
    if use_pins:
        pin = spinm[...] != 0.0
        px_pin, py_pin, pz_pin = spinpos[0], spinpos[1], spinpos[2]

    # masks from GLOBAL row ids (exact boundary semantics); column masks as
    # in the single-block kernel
    lrow = jax.lax.broadcasted_iota(jnp.int32, (band_ext, w), 0)
    grow = lrow + window_start
    cols = jax.lax.broadcasted_iota(jnp.int32, (band_ext, w), 1)
    masks = []
    for dr, dc, _ in _FAMILIES:
        # global validity AND local no-wrap: edges whose p1 would wrap around
        # the window bottom must be zeroed, otherwise their reaction terms
        # wrap into the window's TOP rows (real center rows for band 0)
        ok = (grow < (h - dr)) & (lrow < (band_ext - dr))
        if dc >= 0:
            ok = ok & (cols < (w - dc))
        else:
            ok = ok & (cols >= -dc)
        masks.append(ok)

    def substep(_, carry):
        x, y, z, vx, vy, vz = carry
        fx = jnp.zeros((band_ext, w), jnp.float32)
        fy = jnp.zeros((band_ext, w), jnp.float32)
        fz = jnp.zeros((band_ext, w), jnp.float32)
        row1 = [pltpu.roll(a, (-1) % band_ext, axis=0)
                for a in (x, y, z, vx, vy, vz)]
        for fam_idx, (dr, dc, t) in enumerate(_FAMILIES):
            ok = masks[fam_idx]
            if dr == 1:
                planes = row1
                if dc:
                    planes = [pltpu.roll(a, (-dc) % w, axis=1) for a in planes]
                p1x, p1y, p1z, v1x, v1y, v1z = planes
            else:
                p1x, p1y, p1z = (_shift(a, dr, dc, band_ext, w)
                                 for a in (x, y, z))
                v1x, v1y, v1z = (_shift(a, dr, dc, band_ext, w)
                                 for a in (vx, vy, vz))
            dxv, dyv, dzv = p1x - x, p1y - y, p1z - z
            dist = jnp.sqrt(dxv * dxv + dyv * dyv + dzv * dzv)
            safe = dist >= _EPS
            inv = jnp.where(safe, 1.0 / jnp.where(safe, dist, 1.0), 0.0)
            ux, uy, uz = dxv * inv, dyv * inv, dzv * inv
            s = k[t] * (dist - rest[t]) + c[t] * (
                (v1x - vx) * ux + (v1y - vy) * uy + (v1z - vz) * uz)
            keep = ok & safe
            ex = jnp.where(keep, s * ux, 0.0)
            ey = jnp.where(keep, s * uy, 0.0)
            ez = jnp.where(keep, s * uz, 0.0)
            fx = fx + ex
            fy = fy + ey
            fz = fz + ez
            fx = fx - _shift(ex, -dr, -dc, band_ext, w)
            fy = fy - _shift(ey, -dr, -dc, band_ext, w)
            fz = fz - _shift(ez, -dr, -dc, band_ext, w)

        fy = fy + mass * gravity
        dist = jnp.sqrt(x * x + y * y + z * z)
        in_contact = (dist < min_dist) & (dist > _EPS)
        inv_d = 1.0 / jnp.where(dist > _EPS, dist, 1.0)
        nx, ny, nz = x * inv_d, y * inv_d, z * inv_d
        pen = k_contact * (min_dist - dist)
        fx = jnp.where(in_contact, fx + pen * nx, fx)
        fy = jnp.where(in_contact, fy + pen * ny, fy)
        fz = jnp.where(in_contact, fz + pen * nz, fz)
        ro_n = fx * nx + fy * ny + fz * nz
        tx, ty, tz = fx - ro_n * nx, fy - ro_n * ny, fz - ro_n * nz
        tmag = jnp.sqrt(tx * tx + ty * ty + tz * tz)
        fric = in_contact & (tmag > _EPS)
        inv_t = 1.0 / jnp.where(tmag > _EPS, tmag, 1.0)
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
        fdist = jnp.sqrt(x * x + y * y + z * z)
        pen2 = fdist < min_dist
        pen_safe = pen2 & (fdist > _EPS)
        pen_center = pen2 & jnp.logical_not(pen_safe)
        inv_f = 1.0 / jnp.where(fdist > _EPS, fdist, 1.0)
        x = jnp.where(pen_safe, x * inv_f * min_dist,
                      jnp.where(pen_center, 0.0, x))
        y = jnp.where(pen_safe, y * inv_f * min_dist,
                      jnp.where(pen_center, min_dist, y))
        z = jnp.where(pen_safe, z * inv_f * min_dist,
                      jnp.where(pen_center, 0.0, z))
        vx = jnp.where(pen2, 0.0, vx)
        vy = jnp.where(pen2, 0.0, vy)
        vz = jnp.where(pen2, 0.0, vz)
        if use_pins:
            x = jnp.where(pin, px_pin, x)
            y = jnp.where(pin, py_pin, y)
            z = jnp.where(pin, pz_pin, z)
            vx = jnp.where(pin, 0.0, vx)
            vy = jnp.where(pin, 0.0, vy)
            vz = jnp.where(pin, 0.0, vz)
        return x, y, z, vx, vy, vz

    x, y, z, vx, vy, vz = jax.lax.fori_loop(
        0, k_sub, substep, (x, y, z, vx, vy, vz))

    so_p[0], so_p[1], so_p[2] = x, y, z
    so_v[0], so_v[1], so_v[2] = vx, vy, vz
    cp_out_p = pltpu.make_async_copy(
        so_p.at[:, pl.ds(center_off, band_h), :],
        pos_out.at[:, pl.ds(band_start, band_h), :], sems.at[2])
    cp_out_v = pltpu.make_async_copy(
        so_v.at[:, pl.ds(center_off, band_h), :],
        vel_out.at[:, pl.ds(band_start, band_h), :], sems.at[3])
    cp_out_p.start()
    cp_out_v.start()
    cp_out_p.wait()
    cp_out_v.wait()


def _pick_band(h: int, w: int, k_sub: int, use_pins: bool = False):
    """Largest band height dividing h whose extended window fits the VMEM
    budget (within the 16 MB scoped-vmem limit once substep temporaries are
    added): 12 scratch planes without pins (4 MB budget, measured OK), 16
    with pins (3 MB — pins add a mask plane + 3 pin-pos planes)."""
    if use_pins:
        budget_rows = max(8, (3 * 1024 * 1024) // (16 * w * 4))
    else:
        budget_rows = max(8, (4 * 1024 * 1024) // (12 * w * 4))
    halo = 2 * k_sub
    for band_h in (256, 128, 64, 32, 16, 8):
        if h % band_h == 0 and band_h + 2 * halo <= budget_rows \
                and band_h + 2 * halo <= h:
            return band_h
    raise ValueError(f"no band size fits h={h}, w={w}, k_sub={k_sub}")


def pick_schedule(h: int, w: int, n_steps: int, use_pins: bool = False):
    """Choose (k_sub, band_h). Measured on v5e, per-launch costs (kernel
    dispatch + serialized per-band DMA round-trips) dominate over redundant
    halo compute, so more substeps per launch wins even at 2× band overhead:
    512² → k=8 1.7-2.0e9 vs k=4 0.4e9; 1024² → k=8 0.84e9 beats k=4/k=16.
    Rule: k=8 if it fits, else 16, else 4. Returns None if nothing fits."""
    for k_sub in (8, 16, 4):
        if n_steps % k_sub or (2 * k_sub) % 8:
            continue
        try:
            return k_sub, _pick_band(h, w, k_sub, use_pins)
        except ValueError:
            continue
    return None


@functools.partial(jax.jit, static_argnames=("n_steps", "k_sub", "interpret"))
def multi_step(state: ClothState, params: ClothParams, dt: jnp.ndarray,
               n_steps: int, k_sub: int = 8,
               interpret: Optional[bool] = None) -> ClothState:
    """``n_steps`` substeps via banded launches of ``k_sub`` substeps each.
    ``n_steps`` must be divisible by ``k_sub``."""
    assert n_steps % k_sub == 0
    assert (2 * k_sub) % 8 == 0, "k_sub must be a multiple of 4 (DMA tiling)"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = state.pos.shape[-2:]
    use_pins = state.pin_mask is not None
    band_h = _pick_band(h, w, k_sub, use_pins)
    halo = 2 * k_sub
    band_ext = band_h + 2 * halo
    n_bands = h // band_h

    kernel = functools.partial(_kernel, h=h, w=w, band_h=band_h, halo=halo,
                               k_sub=k_sub, use_pins=use_pins)
    pvec = _pack_params(params, dt)
    if use_pins:
        pinm = state.pin_mask.astype(jnp.float32)
        pinpos = state.pin_pos
    else:
        pinm = jnp.zeros((h, w), jnp.float32)
        pinpos = jnp.zeros((3, h, w), jnp.float32)

    launch = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        out_shape=(
            jax.ShapeDtypeStruct((3, h, w), jnp.float32),
            jax.ShapeDtypeStruct((3, h, w), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, band_ext, w), jnp.float32),
            pltpu.VMEM((3, band_ext, w), jnp.float32),
            pltpu.VMEM((3, band_ext, w), jnp.float32),
            pltpu.VMEM((3, band_ext, w), jnp.float32),
            pltpu.VMEM((band_ext, w), jnp.float32),
            pltpu.VMEM((3, band_ext, w), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )

    def body(carry, _):
        pos, vel = carry
        new_pos, new_vel = launch(pvec, pos, vel, pinm, pinpos)
        return (new_pos, new_vel), None

    (pos, vel), _ = jax.lax.scan(body, (state.pos, state.vel), None,
                                 length=n_steps // k_sub)
    return state._replace(pos=pos, vel=vel)
