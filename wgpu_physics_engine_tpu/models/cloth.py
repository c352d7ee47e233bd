"""TPU-native mass-spring cloth: stencil formulation (pure XLA path).

The reference stores 21,002 springs as explicit edge lists and burns an
O(N·S) brute-force scan to accumulate forces without atomics
(``forces.wgsl:272-313``). On TPU we exploit the grid structure instead:
the six spring families (structural right/down, shear down-right/down-left,
bend 2-right/2-down — ``cloth.rs:945-957``) are *shifted-array differences*
over the ``[H, W]`` grid. Twelve stencil taps replace the edge list; the
accumulation is O(N), deterministic, and fuses into one XLA computation
per substep.

Semantics match ``forces.wgsl`` (``compute_springs``) +
``compute_movement.wgsl`` (``main``) exactly — see
:mod:`wgpu_physics_engine_tpu.models.oracle` for the op-order contract;
golden-trajectory tests pin this path to the oracle at 1e-4.

Layout: channels-first ``[3, H, W]`` so the trailing grid axes map onto the
VPU (sublane, lane) tiling; vector math is a reduction over axis 0.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.state import ClothParams, ClothState

_EPS = 1e-6


def _safe_norm(sq: jnp.ndarray) -> jnp.ndarray:
    """sqrt(sq) with a gradient-safe zero: primal is bit-identical to
    jnp.sqrt (sqrt(0) = 0), but the sqrt never sees 0 on the backward pass
    (d sqrt/dx at 0 is inf, and inf * where-mask-0 = NaN — the standard JAX
    gotcha; needed for jax.grad through the simulator)."""
    positive = sq > 0
    return jnp.where(positive, jnp.sqrt(jnp.where(positive, sq, 1.0)), 0.0)

# (dr, dc) offsets for the six spring families, grouped by type.
STRUCT_OFFSETS = ((0, 1), (1, 0))
SHEAR_OFFSETS = ((1, 1), (1, -1))
BEND_OFFSETS = ((0, 2), (2, 0))


def _edge_slices(h: int, w: int, dr: int, dc: int):
    """Index slices selecting p0 and p1 grids for edge family (dr, dc)."""
    if dc >= 0:
        c0 = slice(0, w - dc)
        c1 = slice(dc, w)
    else:
        c0 = slice(-dc, w)
        c1 = slice(0, w + dc)
    r0 = slice(0, h - dr)
    r1 = slice(dr, h)
    return (r0, c0), (r1, c1)


def _edge_force(p0, p1, v0, v1, k, c, rest):
    """Spring force on p0 for one edge family (forces.wgsl:158-186).

    Inputs ``[3, h', w']``; Hooke with uniform rest length + velocity
    projection damping; zero where ``dist < 1e-6``.
    """
    delta = p1 - p0
    dist = _safe_norm(jnp.sum(delta * delta, axis=0))
    safe = dist >= _EPS
    inv = jnp.where(safe, 1.0 / jnp.where(safe, dist, 1.0), 0.0)
    dirv = delta * inv[None]
    stretch = dist - rest
    hooke = (k * stretch)[None] * dirv
    v_along = jnp.sum((v1 - v0) * dirv, axis=0)
    damp = (c * v_along)[None] * dirv
    return jnp.where(safe[None], hooke + damp, 0.0)


def spring_forces(pos: jnp.ndarray, vel: jnp.ndarray, p: ClothParams,
                  row_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Accumulated spring force per particle, ``[3, H, W]``.

    Equivalent to compute_springs + accumulate_forces
    (forces.wgsl:143-313): each edge contributes ``+F`` to its p0 and
    ``-F`` to its p1.

    ``row_valid`` (optional ``[H]`` bool): marks rows that exist in the
    global grid. Used by the spatially-sharded path, where each shard's
    local array carries ghost/halo rows; edges touching an invalid row
    contribute nothing. None means all rows are real.
    """
    h, w = pos.shape[-2:]
    force = jnp.zeros_like(pos)
    families = (
        (STRUCT_OFFSETS, p.k_struct, p.c_struct, p.rest_struct),
        (SHEAR_OFFSETS, p.k_shear, p.c_shear, p.rest_shear),
        (BEND_OFFSETS, p.k_bend, p.c_bend, p.rest_bend),
    )
    for offsets, k, c, rest in families:
        for dr, dc in offsets:
            (r0, c0), (r1, c1) = _edge_slices(h, w, dr, dc)
            e = _edge_force(
                pos[:, r0, c0], pos[:, r1, c1],
                vel[:, r0, c0], vel[:, r1, c1],
                k, c, rest,
            )
            if row_valid is not None:
                edge_ok = row_valid[r0.start:r0.stop] & row_valid[r1.start:r1.stop]
                e = jnp.where(edge_ok[None, :, None], e, 0.0)
            force = force.at[:, r0, c0].add(e)
            force = force.at[:, r1, c1].add(-e)
    return force


def integrate(
    pos: jnp.ndarray,
    vel: jnp.ndarray,
    spring_force: jnp.ndarray,
    p: ClothParams,
    dt: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Movement kernel (compute_movement.wgsl:70-174) on ``[3, H, W]``.

    gravity → sphere penalty contact → Coulomb friction on the post-contact
    resultant → semi-implicit Euler with exponential speed damping → hard
    surface projection (zeroing velocity).
    """
    total = spring_force
    # Gravity on y only (compute_movement.wgsl:86)
    g = jnp.stack([jnp.zeros_like(p.mass), p.mass * p.gravity, jnp.zeros_like(p.mass)])
    total = total + g[:, None, None]

    # Sphere contact (compute_movement.wgsl:107-117)
    dist = _safe_norm(jnp.sum(pos * pos, axis=0))
    min_dist = p.globe_radius + p.particle_radius
    in_contact = (dist < min_dist) & (dist > _EPS)
    n = pos / jnp.where(dist > _EPS, dist, 1.0)[None]
    f_contact = (p.k_contact * (min_dist - dist))[None] * n
    total = jnp.where(in_contact[None], total + f_contact, total)

    # Friction on the total resultant incl. contact (compute_movement.wgsl:119-131)
    ro_n_mag = jnp.sum(total * n, axis=0)
    ro_t = total - ro_n_mag[None] * n
    ro_t_mag = _safe_norm(jnp.sum(ro_t * ro_t, axis=0))
    fric_active = in_contact & (ro_t_mag > _EPS)
    tangent = ro_t / jnp.where(ro_t_mag > _EPS, ro_t_mag, 1.0)[None]
    f_fric = (-jnp.minimum(ro_t_mag, p.mu * jnp.abs(ro_n_mag)))[None] * tangent
    total = jnp.where(fric_active[None], total + f_fric, total)

    # Semi-implicit Euler + damping (compute_movement.wgsl:137-140)
    vel = vel + (total / p.mass) * dt
    vel = vel * jnp.power(p.speed_damp, dt)
    pos = pos + vel * dt

    # Hard projection (compute_movement.wgsl:143-158)
    final_dist = _safe_norm(jnp.sum(pos * pos, axis=0))
    pen = final_dist < min_dist
    pen_safe = pen & (final_dist > _EPS)
    pen_center = pen & jnp.logical_not(pen_safe)
    nf = pos / jnp.where(final_dist > _EPS, final_dist, 1.0)[None]
    center_pos = jnp.array([0.0, 1.0, 0.0], pos.dtype) * min_dist
    pos = jnp.where(pen_safe[None], nf * min_dist, pos)
    pos = jnp.where(pen_center[None], center_pos[:, None, None], pos)
    vel = jnp.where(pen[None], 0.0, vel)
    return pos, vel


def substep(state: ClothState, params: ClothParams, dt: jnp.ndarray) -> ClothState:
    """One physics substep: the three compute passes of
    ``dispatch_compute`` (cloth.rs:1283-1327) fused into one XLA program,
    plus optional fixed-pin constraints (extension; BASELINE configs[1])."""
    force = spring_forces(state.pos, state.vel, params)
    pos, vel = integrate(state.pos, state.vel, force, params, dt)
    if state.pin_mask is not None:
        pin = state.pin_mask[None]
        pos = jnp.where(pin, state.pin_pos, pos)
        vel = jnp.where(pin, 0.0, vel)
    return state._replace(pos=pos, vel=vel)


def self_collision_forces(pos: jnp.ndarray, vel: jnp.ndarray, p: ClothParams,
                          grid_spec, k_self=None) -> jnp.ndarray:
    """Cloth self-collision (BASELINE configs[3]): spatial-hash broad-phase
    over the cloth's own particles + pairwise sphere penalty narrow-phase.

    An extension over the reference (which has no self-collision); the
    narrow-phase force is the same elastic penalty law as its sphere contact
    (compute_movement.wgsl:107-117) applied between particle pairs closer
    than ``2 · particle_radius``. Directly-linked grid neighbors sit at
    ~rest_struct ≫ 2r by default and are naturally excluded by distance.

    NOTE the candidate window is capped at ``3 · grid_spec.capacity`` per
    neighbor group — in a tightly compressed fold that can silently drop
    contacts (raise ``capacity``, or use
    ``multi_step_self_collide(rebuild_every=K)``, whose slab kernel has
    no per-window cap and reports slab overflow via ``return_stats``).
    """
    from . import broadphase

    h, w = pos.shape[-2:]
    flat_pos = pos.reshape(3, h * w)
    flat_vel = vel.reshape(3, h * w)
    # grid origin follows the cloth bounding box (static dims/cell size);
    # scatter-free sorted-window query (TPU scatters serialize)
    origin = jnp.min(flat_pos, axis=1) - grid_spec.cell_size
    grid = broadphase.build_sorted_grid(flat_pos, flat_vel, grid_spec, origin)
    k = p.k_contact if k_self is None else k_self
    f = broadphase.pair_forces_sorted(grid, grid_spec, p.particle_radius, k,
                                      window=3 * grid_spec.capacity,
                                      origin=origin)
    return f.reshape(3, h, w)


def substep_self_collide(state: ClothState, params: ClothParams,
                         dt: jnp.ndarray, grid_spec) -> ClothState:
    """Substep with cloth self-collision folded into the force accumulation
    (springs + self-contact → integrate)."""
    force = spring_forces(state.pos, state.vel, params)
    force = force + self_collision_forces(state.pos, state.vel, params, grid_spec)
    pos, vel = integrate(state.pos, state.vel, force, params, dt)
    if state.pin_mask is not None:
        pin = state.pin_mask[None]
        pos = jnp.where(pin, state.pin_pos, pos)
        vel = jnp.where(pin, 0.0, vel)
    return state._replace(pos=pos, vel=vel)


def _self_collide_block(state: ClothState, params: ClothParams,
                        dt: jnp.ndarray, length: int, grid_spec,
                        block: int, slab: int, interpret: bool,
                        use_kernel: bool = True, stats: bool = False):
    """Frozen-window self-collision: one broad-phase rebuild + ``length``
    substeps against it. The sort ORDER is frozen for the block;
    positions are re-gathered into it each substep (two [N] permutation
    gathers/substep — cheap next to the per-substep grid rebuild + window
    gathers it replaces).

    Per substep (round-3 layout; VERDICT-r2 item #1):

    1. permute grid-layout positions into the frozen sorted order,
    2. pair narrow phase via the slab-DMA kernel in THIN 3-group mode
       (``granular_pallas.build_windows(thin=True)`` — the cloth is a
       surface, so merged y/z column ranges hold ~a dozen candidates and
       the dense [B, S] passes drop from 9 to 3, which was ~⅔ of the
       whole substep). Refuted round-3 variants (merged single-slab,
       MXU pair math, rpb wide slabs) were measured losses here and
       removed in round 4 — findings in docs/kernels.md,
    3. permute pair forces back and run springs + f_self + integrate +
       pins as ONE fused VMEM-resident kernel
       (``cloth_pallas.substep_with_force``) instead of the ~1 ms XLA
       stencil pass (``use_kernel=False`` keeps the XLA spring path —
       the fp32 reference for tests).

    Valid while displacement between rebuilds stays under
    ``(cell_size - 2·particle_radius)/2`` (Verlet skin invariant — size
    the grid with ``default_self_collision_grid(..., skin=...)``).
    """
    from . import broadphase
    from ..ops import cloth_pallas, granular_pallas

    h, w = state.pos.shape[-2:]
    n = h * w
    flat_pos = state.pos.reshape(3, n)
    flat_vel = state.vel.reshape(3, n)
    origin = jnp.min(flat_pos, axis=1) - grid_spec.cell_size
    grid = broadphase.build_sorted_grid(flat_pos, flat_vel, grid_spec, origin)
    n_pad = -(-max(n, slab) // block) * block
    civ = granular_pallas.civ_bounds(grid_spec, thin=True)
    cidf, off, dropped = granular_pallas.build_offsets_civ(
        grid, grid_spec, block, slab, n_pad, thin=True, stats=stats)
    cidc = cidf[:, None]
    cid_row = cidf[None, :]
    order = grid.order
    inv = jnp.argsort(order, stable=True)
    pad = n_pad - n
    min_dist = 2.0 * params.particle_radius

    def inner(s, _):
        sp = s.pos.reshape(3, n)[:, order]            # frozen sort order
        posc = jnp.pad(sp.T, ((0, pad), (0, 0)), constant_values=1e6)
        # DMA source straight from sp (cids ride the same slab DMA) —
        # routing it through posc.T would add a second [N, 3] <-> [3, N]
        # relayout per substep
        pos4 = jnp.concatenate(
            [jnp.pad(sp, ((0, 0), (0, pad)), constant_values=1e6),
             cid_row])
        f_sorted = granular_pallas.contact_forces_sorted(
            pos4, posc, cidc, off, min_dist, params.k_contact,
            block=block, slab=slab, n_real=n, interpret=interpret,
            thin=True, civ=civ)
        f_self = f_sorted[:n].T[:, inv].reshape(3, h, w)
        if use_kernel:
            return cloth_pallas.substep_with_force(
                s, params, dt, f_self, interpret=interpret), None
        force = spring_forces(s.pos, s.vel, params) + f_self
        pos, vel = integrate(s.pos, s.vel, force, params, dt)
        if s.pin_mask is not None:
            pin = s.pin_mask[None]
            pos = jnp.where(pin, s.pin_pos, pos)
            vel = jnp.where(pin, 0.0, vel)
        return s._replace(pos=pos, vel=vel), None

    out, _ = jax.lax.scan(inner, state, None, length=length)
    return out, dropped


@functools.partial(jax.jit, static_argnames=("n_steps", "grid_spec",
                                             "rebuild_every", "pallas_block",
                                             "pallas_slab", "interpret",
                                             "return_stats",
                                             "use_spring_kernel"))
def multi_step_self_collide(state: ClothState, params: ClothParams,
                            dt: jnp.ndarray, n_steps: int, grid_spec,
                            rebuild_every: int = 1,
                            pallas_block: int = 256,
                            pallas_slab: Optional[int] = None,
                            interpret: Optional[bool] = None,
                            return_stats: bool = False,
                            use_spring_kernel: Optional[bool] = None):
    """``n_steps`` self-colliding substeps (BASELINE configs[3]).

    ``rebuild_every=1`` (default) rebuilds the spatial hash every substep
    (exact, XLA sorted-window path). ``rebuild_every=K>1`` freezes the
    broad-phase for K substeps: the contact narrow-phase runs through the
    slab-DMA Pallas kernel in thin 3-group mode (``pallas_slab=None``
    auto-sizes the per-dx slab), and springs + contact + integrate +
    pins fuse into one VMEM-resident kernel per substep.
    Size the grid with a skin (``default_self_collision_grid(...,
    skin=...)``) so the Verlet invariant holds between rebuilds.

    ``use_spring_kernel=False`` keeps the springs/integration on the XLA
    stencil path (the fp32 reference used by the equivalence tests);
    None = auto (on when the grid fits the fused kernel's VMEM budget).

    ``return_stats`` additionally returns the worst per-rebuild
    dropped-candidate count (frozen path only; 0 means the slabs covered
    every window).
    """
    if rebuild_every <= 1:
        def body(s, _):
            return substep_self_collide(s, params, dt, grid_spec), None

        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return (out, jnp.int32(0)) if return_stats else out

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if use_spring_kernel is None:
        from ..ops import cloth_pallas

        h, w = state.pos.shape[-2:]
        use_spring_kernel = h * w <= cloth_pallas._VMEM_PARTICLE_LIMIT
    if pallas_slab is None:
        # per-dx slab: must span one dx-group's window hull ≈ the
        # block's own span + ~3 y-columns, with headroom for draped
        # states where columns compress (s512 at b256 is fastest on a
        # flat cloth but drops ~150k window entries per rebuild once
        # draped; s640 measured zero drops over the 512-substep bench
        # trajectory — verify with return_stats when changing regimes).
        pallas_slab = max(640, (5 * pallas_block // 2 + 127) // 128 * 128)
    k = rebuild_every
    n_outer, rem = divmod(n_steps, k)

    def outer(carry, _):
        s, dmax = carry
        s, d = _self_collide_block(s, params, dt, k, grid_spec,
                                   pallas_block, pallas_slab, interpret,
                                   use_kernel=use_spring_kernel,
                                   stats=return_stats)
        return (s, jnp.maximum(dmax, d)), None

    dmax = jnp.int32(0)
    if n_outer:
        (state, dmax), _ = jax.lax.scan(outer, (state, dmax), None,
                                        length=n_outer)
    if rem:
        state, d = _self_collide_block(state, params, dt, rem, grid_spec,
                                       pallas_block, pallas_slab, interpret,
                                       use_kernel=use_spring_kernel,
                                       stats=return_stats)
        dmax = jnp.maximum(dmax, d)
    return (state, dmax) if return_stats else state


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _frozen_self_contact(meta, posc, cidf, off, md, kc):
    """Pair contact forces on padded SORTED positions with a FROZEN
    broad-phase structure — the production slab-DMA kernel
    (``granular_pallas.contact_forces_sorted``, thin CIV mode) wrapped in
    a ``custom_vjp`` so the self-collision path differentiates.

    Backward: the pair force field is the negative gradient of a pair
    potential and the CIV candidate relation is symmetric, so the
    Jacobian w.r.t. positions is symmetric and ``Jᵀf̄`` is the JVP kernel
    (``contact_force_jvp_sorted``) applied with ``u = f̄``. Parameter
    cotangents come for free:

    - ``kc``: the force is linear in it — ``k̄c = ⟨f̄, f⟩ / kc``;
    - ``md``: ``f`` is jointly homogeneous of degree 1 in (positions,
      min_dist) (``w = kc·(md/‖d‖ − 1)`` is degree 0, the direction ``d``
      degree 1), so Euler's identity gives ``md·∂f/∂md = f − J·p`` and
      ``m̄d = (⟨f̄, f⟩ − ⟨Jᵀf̄, p⟩) / md`` — no extra kernel launch.

    Structure inputs (``cidf``, ``off``) are discrete: zero cotangents.
    Requires zero dropped slab entries (asymmetric drops break the
    ``Jᵀ = J`` pairing) — assert via the production path's
    ``return_stats`` before training.
    """
    f, _ = _frozen_self_contact_fwd(meta, posc, cidf, off, md, kc)
    return f


def _frozen_self_contact_fwd(meta, posc, cidf, off, md, kc):
    from ..ops import granular_pallas

    block, slab, n, interpret, civ = meta
    pos4 = jnp.concatenate([posc.T, cidf[None, :]])
    f = granular_pallas.contact_forces_sorted(
        pos4, posc, cidf[:, None], off, md, kc, block=block, slab=slab,
        n_real=n, interpret=interpret, thin=True, civ=civ)
    return f, (posc, cidf, off, f, md, kc)


def _frozen_self_contact_bwd(meta, res, fbar):
    from ..ops import granular_pallas

    block, slab, n, interpret, civ = meta
    posc, cidf, off, f, md, kc = res
    n_pad = posc.shape[0]
    pos8 = jnp.concatenate([posc.T, fbar.T, cidf[None, :],
                            jnp.zeros((1, n_pad), jnp.float32)])
    pu = jnp.concatenate([posc, fbar], axis=1)
    ft = granular_pallas.contact_force_jvp_sorted(
        pos8, pu, cidf[:, None], off, md, kc, block=block, slab=slab,
        n_real=n, interpret=interpret, civ=civ)
    posbar = ft[:, 3:]
    # pad rows: fbar is zero there and pads touch nothing, so restrict
    # the scalar reductions to real rows (pad positions sit at 1e6)
    ff = jnp.sum(fbar[:n] * f[:n])
    fjp = jnp.sum(posbar[:n] * posc[:n])
    kcbar = jnp.where(kc != 0.0, ff / jnp.where(kc != 0.0, kc, 1.0), 0.0)
    mdbar = jnp.where(md != 0.0, (ff - fjp) / jnp.where(md != 0.0, md, 1.0),
                      0.0)
    import numpy as np
    off_bar = np.zeros(off.shape, dtype=jax.dtypes.float0)  # int32 primal
    return posbar, jnp.zeros_like(cidf), off_bar, mdbar, kcbar


_frozen_self_contact.defvjp(_frozen_self_contact_fwd,
                            _frozen_self_contact_bwd)


def _sc_diff_segment(state: ClothState, params: ClothParams,
                     dt: jnp.ndarray, length: int, grid_spec,
                     block: int, slab: int, interpret: bool) -> ClothState:
    """One frozen rebuild segment of the differentiable self-collision
    path: broad-phase structures from ``stop_gradient`` (discrete,
    locally constant), then ``length`` substeps of (kernel contact force
    via :func:`_frozen_self_contact` → XLA springs + integrate + pins).
    Each substep is ``jax.checkpoint``-ed so backward memory is one
    substep's activations."""
    from . import broadphase
    from ..ops import granular_pallas

    h, w = state.pos.shape[-2:]
    n = h * w
    frozen = jax.lax.stop_gradient(state.pos.reshape(3, n))
    origin = jnp.min(frozen, axis=1) - grid_spec.cell_size
    grid = broadphase.build_sorted_grid(
        frozen, jnp.zeros_like(frozen), grid_spec, origin)
    n_pad = -(-max(n, slab) // block) * block
    civ = granular_pallas.civ_bounds(grid_spec, thin=True)
    cidf, off, _ = granular_pallas.build_offsets_civ(
        grid, grid_spec, block, slab, n_pad, thin=True)
    order = grid.order
    inv = jnp.argsort(order, stable=True)
    pad = n_pad - n
    meta = (block, slab, n, interpret, civ)

    @jax.checkpoint
    def sub(s, md, kc):
        sp = s.pos.reshape(3, n)[:, order]
        posc = jnp.pad(sp.T, ((0, pad), (0, 0)), constant_values=1e6)
        f_sorted = _frozen_self_contact(meta, posc, cidf, off, md, kc)
        f_self = f_sorted[:n].T[:, inv].reshape(3, h, w)
        force = spring_forces(s.pos, s.vel, params) + f_self
        pos, vel = integrate(s.pos, s.vel, force, params, dt)
        if s.pin_mask is not None:
            pin = s.pin_mask[None]
            pos = jnp.where(pin, s.pin_pos, pos)
            vel = jnp.where(pin, 0.0, vel)
        return s._replace(pos=pos, vel=vel)

    md = 2.0 * params.particle_radius
    kc = params.k_contact
    out, _ = jax.lax.scan(lambda s, _: (sub(s, md, kc), None), state,
                          None, length=length)
    return out


def multi_step_self_collide_diff(state: ClothState, params: ClothParams,
                                 dt: jnp.ndarray, n_steps: int, grid_spec,
                                 rebuild_every: int = 8,
                                 pallas_block: int = 256,
                                 pallas_slab: Optional[int] = None,
                                 interpret: Optional[bool] = None
                                 ) -> ClothState:
    """Differentiable :func:`multi_step_self_collide` (frozen-window
    schedule, contact narrow-phase on the slab-DMA kernel).

    ``jax.grad`` flows w.r.t. ``state.pos/vel/pin_pos``, every
    ``ClothParams`` leaf (including ``k_contact`` and ``particle_radius``
    THROUGH the self-contact kernel — see :func:`_frozen_self_contact`
    for the linearity/homogeneity identities the backward uses), and
    ``dt``. Springs + integrate stay on the differentiable XLA stencil
    path (the ``use_spring_kernel=False`` production variant); the
    contact force and its transpose run as slab-DMA Pallas kernels.

    Same contracts as the production path: the Verlet skin invariant
    between rebuilds, zero dropped slab entries (verify with the
    production path's ``return_stats`` — drops break the symmetric-
    Jacobian pairing the backward relies on), and piecewise (almost-
    everywhere) differentiability across contact activations.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pallas_slab is None:
        pallas_slab = max(640, (5 * pallas_block // 2 + 127) // 128 * 128)
    k = max(1, rebuild_every)
    n_full, rem = divmod(n_steps, k)

    def seg(s, _):
        return _sc_diff_segment(s, params, dt, k, grid_spec, pallas_block,
                                pallas_slab, interpret), None

    if n_full:
        state, _ = jax.lax.scan(seg, state, None, length=n_full)
    if rem:
        state = _sc_diff_segment(state, params, dt, rem, grid_spec,
                                 pallas_block, pallas_slab, interpret)
    return state


def default_self_collision_grid(config, pad: float = 1.5,
                                skin: float = 0.0):
    """GridSpec for cloth self-collision: cell ≈ the contact diameter
    plus ``skin`` (for the frozen rebuild-every-K schedule: displacement
    between rebuilds must stay under ``skin/2``), dims sized to the
    cloth's possible span; the grid ORIGIN is dynamic (follows the cloth
    bbox — see :func:`self_collision_forces`), so the domain stays
    tight."""
    from . import broadphase

    r = config.particle_radius
    cell = 2.05 * r + skin
    span = pad * max(config.cloth_size, 2.2 * config.globe_radius)
    # cap below 2^24 total cells: CIV validity carries cids exactly in f32
    dims = min(int(span / cell) + 2, 255)
    return broadphase.GridSpec(origin=(0.0, 0.0, 0.0),
                               cell_size=cell, dims=(dims, dims, dims),
                               capacity=8)


@functools.partial(jax.jit, static_argnames=("n_steps",))
def multi_step(state: ClothState, params: ClothParams, dt: jnp.ndarray, n_steps: int) -> ClothState:
    """``n_steps`` substeps under one jit via ``lax.scan`` — the TPU
    equivalent of the reference's per-frame substep loop (cloth.rs:1474-1493),
    with zero host round-trips between substeps."""

    def body(s, _):
        return substep(s, params, dt), None

    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out


def multi_step_diff(state: ClothState, params: ClothParams, dt: jnp.ndarray,
                    n_steps: int, segment: Optional[int] = None,
                    interpret: Optional[bool] = None) -> ClothState:
    """Differentiable ``multi_step`` at fused-kernel speed.

    ``jax.grad``/``jax.vjp`` flow through this (w.r.t. ``state.pos/vel/
    pin_pos``, every ``ClothParams`` leaf, and ``dt``) while the forward
    AND backward passes run as Pallas kernels — see
    :mod:`wgpu_physics_engine_tpu.ops.cloth_pallas_grad` for the
    segment-checkpointed custom_vjp design. Primal output is bit-identical
    to :func:`ops.cloth_pallas.multi_step` (exact mode).

    Grids beyond the BACKWARD kernel's VMEM budget fall back to the XLA
    stencil path under ``jax.checkpoint`` segments (differentiable
    everywhere, at XLA rates). A capability the reference cannot express
    (its WGSL pipeline has no gradient story) — same surplus class as the
    parallel/datagen layers, SURVEY §5.

    Backward routing by grid size (rounds 4-5):
    up to 128² the whole-plane reverse-walk kernel; up to 512² the
    BANDED transpose kernel — per-substep re-linearization over
    ~32k-particle row bands with an 8-row halo inside the raised
    (100 MB) scoped-VMEM window (round 5: 9.5e8 p-steps/s
    value_and_grad at 512², 3.3× the XLA fallback —
    tools/probes/probe_band512.py); up to 1024² the STREAMED banded
    path — primal and trace run the production halo-widened banded
    forward and the transpose DMAs each primal band from the HBM
    trajectory, only the cotangent carries staying whole-grid in VMEM;
    beyond 1024² (or when the streamed path's alignment constraints
    fail: ``n_steps % 8`` or ``h % 8``) the XLA stencil +
    ``jax.checkpoint`` fallback takes over.
    """
    from ..ops import cloth_pallas, cloth_pallas_grad

    h, w = state.pos.shape[-2:]
    g = cloth_pallas_grad
    needs_stream = h * w > g._GRAD_BANDED_PARTICLE_LIMIT
    if (h * w > g._GRAD_STREAM_PARTICLE_LIMIT
            or (needs_stream and (n_steps % g._STREAM_K_SUB or h % 8))):
        seg_step = jax.checkpoint(lambda s: substep(s, params, dt))
        out, _ = jax.lax.scan(lambda s, _: (seg_step(s), None), state, None,
                              length=n_steps)
        return out
    return cloth_pallas_grad.multi_step(state, params, dt, n_steps,
                                        segment=segment, interpret=interpret)


def frame_substeps(delta_time: float, time_scale: float, hz: float = 480.0,
                   max_substeps: int = 8) -> Tuple[int, float]:
    """Host-side substep schedule (cloth.rs:1461-1471):
    ``n = clamp(ceil(time_scale*dt*hz), 1, max)``; ``sub_dt = scaled/n``."""
    import math

    scaled = time_scale * delta_time
    n = max(1, min(max_substeps, math.ceil(scaled * hz)))
    return n, scaled / n


def frame_update(state: ClothState, params: ClothParams, delta_time: float,
                 time_scale: float = 1.0, hz: float = 480.0,
                 max_substeps: int = 8) -> ClothState:
    """One render-frame's worth of physics (App::update, cloth.rs:1458-1493)."""
    n, sub_dt = frame_substeps(delta_time, time_scale, hz, max_substeps)
    return multi_step(state, params, jnp.float32(sub_dt), n)
