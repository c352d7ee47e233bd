"""Granular sim: up to millions of free particles with gravity, ground-plane
bounce, box walls, and uniform-grid pairwise contact (BASELINE configs[2]:
"1M free particles: gravity + ground-plane bounce + uniform-grid neighbor
broad-phase").

Extends the reference's free-particle integrator (C8/C9: gravity + wall
reflect, 10 particles, no interactions — see
/root/reference/simulations/4_instances_imgui/compute_movement.wgsl:36-105)
with real particle-particle contact via
:mod:`wgpu_physics_engine_tpu.models.broadphase`.

Two broad-phase schedules:

* ``rebuild_every=1`` — rebuild the sorted grid and re-derive candidate
  windows every substep (round-1 path; gather-index generation dominates,
  ~2 ns per index on v5e).
* ``rebuild_every=K>1`` (default) — **frozen Verlet lists**: build a
  ``[N, max_neighbors]`` candidate matrix once with query radius
  ``2·radius + skin``, then reuse it for K substeps. The gather indices
  become loop-invariant across the inner scan, which removes the dominant
  per-step cost, and the per-step candidate count shrinks from
  ``9·window`` to ``max_neighbors``. Correct while relative displacement
  between rebuilds stays under ``skin/2`` (Verlet-list invariant).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import broadphase
from ..core.state import ParticleState


@dataclasses.dataclass(frozen=True)
class GranularConfig:
    """Static granular-scene config. Box spans [-bounds, bounds]^3 with a
    solid floor at y = -bounds (ground plane)."""

    num_particles: int = 1_000_000
    bounds: float = 10.0
    radius: float = 0.04
    k_contact: float = 2000.0
    gravity: float = -9.81
    restitution: float = 0.5         # ground/wall bounce energy retention
    grid_capacity: int = 8
    window: int = 32                 # candidates per z-triple window
    skin: Optional[float] = None     # Verlet skin; default 2·radius
    max_neighbors: int = 48          # frozen-list width
    rebuild_every: int = 8           # substeps per neighbor-list rebuild
    pallas_block: int = 128          # sorted particles per kernel block
    pallas_slab: int = 384           # slab width (candidates per group)
    pipeline: bool = True            # cross-block slab-DMA double
    # buffering: block b prefetches block b+1's slabs before its math —
    # hides the DMA latency that is ~40% of the dense kernel's time
    civ: bool = True                 # cid-interval validity (round 3):
    # the kernel tests candidate validity on cid DIFFERENCES (the cid
    # plane rides in the slab DMA) instead of per-particle window
    # ranges — identical candidate sets bit-for-bit, but the rebuild
    # loses its 2·9 cell_start gathers PER PARTICLE (~6.6 ns each,
    # irreducible — the dominant rebuild cost at 1M). With
    # return_stats=True the exact dropped-entry count is still computed
    # (paying those gathers); the fast path reports a nonzero-iff-real
    # indicator.
    thin: bool = False               # 3-group CIV (round 3): one cid
    # interval dx·D ± (d2+1) per dx instead of 9 per-(dx,dy) intervals —
    # a superset whose extras fail the distance test (exact +0.0
    # contributions; same candidate SET, but summed in one reduction per
    # dx instead of three, so forces differ from full CIV only by fp
    # reassociation ~1e-7). 3 slab-DMA groups instead of 9 (1/3 the DMA
    # issues) at the cost of slabs sized to ~3 y-columns + block span;
    # wins when columns are shallow, loses in deep piles. Size
    # pallas_slab accordingly and watch dropped. CIV only.
    # NOTE refuted round-3 experiments (sub_block views, merged slabs,
    # MXU pair math, rpb multi-block wide slabs) were removed in round 4
    # — measured losses/washes on both production workloads; findings
    # preserved in docs/kernels.md "Refuted kernel experiments".

    @property
    def skin_value(self) -> float:
        return 2.0 * self.radius if self.skin is None else self.skin

    @property
    def query_radius(self) -> float:
        return 2.0 * self.radius + (
            self.skin_value if self.rebuild_every > 1 else 0.0)

    def grid_spec(self) -> broadphase.GridSpec:
        # cap grid dims at 128^3: cell_start construction is a searchsorted
        # over num_cells queries (~140 ms/Mcell on v5e), the main fixed cost
        cell = max(self.query_radius, 2.0 * self.bounds / 128)
        dims = int(2.0 * self.bounds / cell) + 1
        return broadphase.GridSpec(
            origin=(-self.bounds, -self.bounds, -self.bounds),
            cell_size=cell,
            dims=(dims, dims, dims),
            capacity=self.grid_capacity,
        )


def init_state(config: GranularConfig, key: jax.Array) -> ParticleState:
    """Particles jittered on a lattice in the upper half of the box."""
    n = config.num_particles
    side = int(jnp.ceil(n ** (1.0 / 3.0)))
    i = jnp.arange(side ** 3, dtype=jnp.int32)[:n]
    x = (i % side).astype(jnp.float32)
    y = ((i // side) % side).astype(jnp.float32)
    z = (i // (side * side)).astype(jnp.float32)
    span = 1.6 * config.bounds
    scale = span / side
    base = jnp.stack([
        x * scale - 0.8 * config.bounds,
        y * scale * 0.5 + 0.0,                   # upper half
        z * scale - 0.8 * config.bounds,
    ])
    jitter = 0.2 * scale * jax.random.uniform(key, (3, n), jnp.float32,
                                              minval=-1.0, maxval=1.0)
    return ParticleState(pos=(base + jitter).astype(jnp.float32),
                         vel=jnp.zeros((3, n), jnp.float32))


def _wall_response(pos: jnp.ndarray, vel: jnp.ndarray,
                   config: GranularConfig, e=None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ground plane + walls: clamp & reflect with restitution."""
    limit = jnp.float32(config.bounds - config.radius)
    e = jnp.float32(config.restitution) if e is None else e
    hit_low = (pos < -limit) & (vel < 0.0)
    hit_high = (pos > limit) & (vel > 0.0)
    vel = jnp.where(hit_low | hit_high, -e * vel, vel)
    pos = jnp.clip(pos, -limit, limit)
    return pos, vel


def substep(state: ParticleState, config: GranularConfig,
            dt: jnp.ndarray, return_stats: bool = False,
            kc=None, grav=None, e=None):
    """One step with per-step grid rebuild: grid → pair contact forces →
    gravity → integrate → ground/wall response with restitution.

    With ``return_stats=True`` also returns the dropped-candidate count
    from the windowed broad-phase (telemetry for silent contact loss).
    ``kc``/``grav``/``e`` optionally override the config constants as
    traced scalars (see :func:`multi_step`)."""
    spec = config.grid_spec()
    # scatter-free sorted-window broad-phase (TPU scatters serialize; see
    # broadphase.SortedGrid)
    grid = broadphase.build_sorted_grid(state.pos, state.vel, spec)
    force, dropped = broadphase.pair_forces_sorted(
        grid, spec, config.radius,
        config.k_contact if kc is None else kc,
        window=config.window, return_stats=True)
    force = force.at[1].add(jnp.float32(config.gravity) if grav is None
                            else grav)                     # unit mass

    vel = state.vel + force * dt
    pos = state.pos + vel * dt
    pos, vel = _wall_response(pos, vel, config, e)
    new = ParticleState(pos=pos, vel=vel)
    if return_stats:
        return new, dropped
    return new


def _frozen_substep(pos: jnp.ndarray, vel: jnp.ndarray, idx: jnp.ndarray,
                    mask: jnp.ndarray, config: GranularConfig,
                    dt: jnp.ndarray, kc=None, grav=None, e=None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One substep against a frozen candidate list (sorted order).

    ``idx``/``mask`` are loop-invariant across the inner scan — XLA hoists
    the index tensor and the gather runs at data-rate instead of paying
    per-step index generation (the round-1 bottleneck)."""
    min_dist = 2.0 * jnp.float32(config.radius)
    kc = jnp.float32(config.k_contact) if kc is None else kc
    grav = jnp.float32(config.gravity) if grav is None else grav
    cpos = pos[:, idx]                                   # [3, N, M]
    d = pos[:, :, None] - cpos
    dist = broadphase._safe_norm(jnp.sum(d * d, axis=0))
    touching = mask & (dist < min_dist) & (dist > 1e-6)
    inv = 1.0 / jnp.where(dist > 1e-6, dist, 1.0)
    f = jnp.where(touching[None],
                  (kc * (min_dist - dist) * inv)[None] * d,
                  0.0)
    force = jnp.sum(f, axis=2)
    force = force.at[1].add(grav)
    vel = vel + force * dt
    pos = pos + vel * dt
    return _wall_response(pos, vel, config, e)


def _run_block(state: ParticleState, config: GranularConfig, dt: jnp.ndarray,
               length: int, kc=None, grav=None, e=None
               ) -> Tuple[ParticleState, jnp.ndarray]:
    """Rebuild the frozen candidate list, run ``length`` substeps on it,
    return state in ORIGINAL particle order + dropped-candidate count."""
    spec = config.grid_spec()
    grid = broadphase.build_sorted_grid(state.pos, state.vel, spec)
    idx, mask, dropped = broadphase.build_candidates(
        grid, spec, config.query_radius, config.window, config.max_neighbors)

    def inner(c, _):
        return _frozen_substep(c[0], c[1], idx, mask, config, dt,
                               kc, grav, e), None

    (pos, vel), _ = jax.lax.scan(
        inner, (grid.sorted_pos, grid.sorted_vel), None, length=length)
    inv = jnp.argsort(grid.order, stable=True)
    return ParticleState(pos=pos[:, inv], vel=vel[:, inv]), dropped


def _run_block_pallas(pos: jnp.ndarray, vel: jnp.ndarray,
                      config: GranularConfig, dt: jnp.ndarray, length: int,
                      interpret: bool, stats: bool = False,
                      kc=None, grav=None, e=None):
    """Frozen-window rebuild + ``length`` substeps via the slab-DMA Pallas
    kernel (ops/granular_pallas.py). Same contract as :func:`_run_block`
    but windows are consumed as ranges (no ``[N, M]`` compaction, no
    ``window``/``max_neighbors`` caps — the only truncation is slab
    overflow, reported in the dropped count).

    Sort-carry (round 3): takes and returns state in ITS OWN sorted
    layout plus the permutation ``order_step`` (new slot -> input slot).
    The caller carries the composed permutation across blocks and
    unsorts ONCE at the end — the per-block unsort (two [3, N]
    permutation gathers) and per-block ``argsort`` both disappear, and
    the next rebuild sorts already-nearly-sorted planes.
    """
    from ..ops import granular_pallas

    spec = config.grid_spec()
    grid = broadphase.build_sorted_grid(pos, vel, spec)
    n = pos.shape[-1]
    block, slab = config.pallas_block, config.pallas_slab
    # padded size: a multiple of block that also fits one slab — the
    # slab DMA source must cover [0, slab) even for tiny n
    n_pad = -(-max(n, slab) // block) * block
    civ = None
    # CIV needs dims >= 3 on every axis (border-wrap safety in
    # civ_bounds); tiny grids fall back to the window formulation, which
    # handles them — instead of tripping civ_bounds' assert at trace time
    civ_ok = config.civ and min(spec.dims) >= 3
    # thin lives only in the CIV kernel phase — anywhere else it would
    # be silently ignored (wrong slab sizing, wrong perf, no error)
    if config.thin and not civ_ok:
        raise ValueError(
            "thin=True requires civ=True and a grid with dims >= 3 on "
            f"every axis (got {spec.dims})")
    if civ_ok:
        civ = granular_pallas.civ_bounds(spec, thin=config.thin)
        cidf, slab_start, dropped = granular_pallas.build_offsets_civ(
            grid, spec, block, slab, n_pad, thin=config.thin,
            stats=stats)
        windows = cidf[:, None]                    # [n_pad, 1] cid column
        cid_row = cidf[None, :]
    else:
        windows, slab_start, dropped = granular_pallas.build_windows(
            grid, spec, block, slab, n_pad)
    pad = n_pad - n
    # pad slots have empty windows and are never referenced by real
    # windows (ends <= n); park them outside the box and freeze them
    posc = jnp.pad(grid.sorted_pos.T, ((0, pad), (0, 0)),
                   constant_values=4.0 * config.bounds)
    velc = jnp.pad(grid.sorted_vel.T, ((0, pad), (0, 0)))
    pvec = jnp.stack([
        2.0 * jnp.float32(config.radius),
        jnp.float32(config.k_contact) if kc is None else kc,
        jnp.float32(config.gravity) if grav is None else grav,
        jnp.float32(dt),
        jnp.float32(config.restitution) if e is None else e,
        jnp.float32(config.bounds - config.radius),
    ]).astype(jnp.float32)

    def inner(c, _):
        posc, velc = c
        if civ:
            pos4 = jnp.concatenate([posc.T, cid_row])   # cids ride the DMA
        else:
            pos4 = jnp.pad(posc.T, ((0, 1), (0, 0)))    # sublane-aligned
        posc, velc = granular_pallas.substep_sorted(
            pos4, posc, velc, windows, slab_start, pvec,
            block=block, slab=slab, n_real=n, interpret=interpret,
            pipelined=config.pipeline, civ=civ)
        return (posc, velc), None

    (posc, velc), _ = jax.lax.scan(inner, (posc, velc), None, length=length)
    return posc[:n].T, velc[:n].T, grid.order, dropped


def _mirror_substep(posc, velc, f, config: GranularConfig, dt, grav, e,
                    alive):
    """XLA mirror of the integrate phase of ``granular_pallas._kernel``
    (same expression order per axis: gravity -> Euler -> wall clamp &
    reflect -> pad-row freeze), on padded SORTED [n_pad, 3] state with
    the pair force ``f`` as an input. The differentiable half of the
    substep — its ``jax.vjp`` is the transpose the backward pass uses;
    ``dt``, ``grav``, ``e`` are traced so parameter cotangents come out
    of that same vjp."""
    force = f.at[:, 1].add(grav)
    vel1 = velc + force * dt
    pos1 = posc + vel1 * dt
    lim = jnp.float32(config.bounds - config.radius)
    hit = ((pos1 < -lim) & (vel1 < 0.0)) | ((pos1 > lim) & (vel1 > 0.0))
    vel2 = jnp.where(hit, -e * vel1, vel1)
    pos2 = jnp.clip(pos1, -lim, lim)
    return jnp.where(alive, pos2, posc), jnp.where(alive, vel2, velc)


def _diff_structs(pos, vel, config: GranularConfig):
    """Rebuild for the differentiable path: sorted grid + CIV offsets +
    padded sorted state. The discrete structure (order, cids, offsets) is
    a.e. constant in the positions — gradients flow through the VALUES,
    the same contract as the frozen-window schedule itself."""
    from ..ops import granular_pallas

    spec = config.grid_spec()
    block, slab = config.pallas_block, config.pallas_slab
    n = pos.shape[-1]
    n_pad = -(-max(n, slab) // block) * block
    grid = broadphase.build_sorted_grid(pos, vel, spec)
    civ = granular_pallas.civ_bounds(spec, thin=config.thin)
    cidf, off, _ = granular_pallas.build_offsets_civ(
        grid, spec, block, slab, n_pad, thin=config.thin)
    pad = n_pad - n
    posc = jnp.pad(grid.sorted_pos.T, ((0, pad), (0, 0)),
                   constant_values=4.0 * config.bounds)
    velc = jnp.pad(grid.sorted_vel.T, ((0, pad), (0, 0)))
    return grid.order, cidf, off, posc, velc, civ, n_pad


def _diff_segment_fwd(pos, vel, config: GranularConfig, dt, kc, grav, e,
                      length: int, interpret: bool):
    """One frozen block of the differentiable path: rebuild, then
    ``length`` substeps of (force kernel -> XLA mirror integrate).
    Original order in/out. ``kc``/``grav``/``e`` are traced scalars."""
    from ..ops import granular_pallas

    n = pos.shape[-1]
    block, slab = config.pallas_block, config.pallas_slab
    order, cidf, off, posc, velc, civ, n_pad = _diff_structs(pos, vel,
                                                             config)
    cid_row = cidf[None, :]
    cidc = cidf[:, None]
    alive = (jnp.arange(n_pad) < n)[:, None]
    md = 2.0 * jnp.float32(config.radius)

    def inner(c, _):
        posc, velc = c
        pos4 = jnp.concatenate([posc.T, cid_row])
        f = granular_pallas.contact_forces_sorted(
            pos4, posc, cidc, off, md, kc,
            block=block, slab=slab, n_real=n, interpret=interpret,
            thin=config.thin, civ=civ)
        return _mirror_substep(posc, velc, f[:n_pad], config, dt, grav,
                               e, alive), None

    (posc, velc), _ = jax.lax.scan(inner, (posc, velc), None,
                                   length=length)
    inv = jnp.argsort(order, stable=True)
    return posc[:n].T[:, inv], velc[:n].T[:, inv]


def _diff_segment_bwd(pos0, vel0, config: GranularConfig, dt, kc, grav, e,
                      length: int, interpret: bool, pbar, vbar):
    """Transpose of :func:`_diff_segment_fwd` — re-runs the segment
    storing per-substep (state, force), then walks it backwards: the XLA
    mirror's ``jax.vjp`` transposes integrate/wall (and yields the
    dt/gravity/restitution cotangents), and the pair-force term
    ``Jᵀ f̄`` rides the slab-DMA JVP kernel (J is symmetric: the
    contact force is the gradient of a pair potential and the CIV
    candidate relation is symmetric — see
    ``granular_pallas.contact_force_jvp_sorted``). The ``k_contact``
    cotangent uses linearity of the penalty force in ``k``:
    ``∂⟨f̄, f⟩/∂k = ⟨f̄, f⟩/k`` with ``f`` already in the trace."""
    from ..ops import granular_pallas

    n = pos0.shape[-1]
    block, slab = config.pallas_block, config.pallas_slab
    order, cidf, off, posc0, velc0, civ, n_pad = _diff_structs(pos0, vel0,
                                                               config)
    cid_row = cidf[None, :]
    cidc = cidf[:, None]
    alive = (jnp.arange(n_pad) < n)[:, None]
    pad = n_pad - n
    md = 2.0 * jnp.float32(config.radius)

    def fw(c, _):
        posc, velc = c
        pos4 = jnp.concatenate([posc.T, cid_row])
        f = granular_pallas.contact_forces_sorted(
            pos4, posc, cidc, off, md, kc, block=block, slab=slab,
            n_real=n, interpret=interpret, thin=config.thin, civ=civ)
        out = _mirror_substep(posc, velc, f, config, dt, grav, e, alive)
        # Trace element stored as ONE [9, n_pad] plane stack: a stacked
        # [L, n_pad, 3] layout tiles T(8,128) on (n_pad, 3) and pads the
        # trailing 3 -> 128 (42.7x HBM expansion — 22.9 GB at 1M, K=16,
        # the exact OOM probe_grad2 hit); [L, 9, n_pad] pads 9 -> 16
        # only (~1.0 GB).
        return out, jnp.concatenate([posc.T, velc.T, f.T])

    _, trace = jax.lax.scan(fw, (posc0, velc0), None, length=length)

    # incoming original-order cotangents -> the sorted frame (transpose
    # of the gather sorted = orig[:, order] is a gather by order)
    pbc = jnp.pad(pbar[:, order].T, ((0, pad), (0, 0)))
    vbc = jnp.pad(vbar[:, order].T, ((0, pad), (0, 0)))
    inv_kc = jnp.where(kc == 0.0, 0.0, 1.0 / jnp.where(kc == 0.0, 1.0, kc))

    def bw(c, xs):
        pbc, vbc, dtb, kcb, gb, eb = c
        posc, velc, f = xs[0:3].T, xs[3:6].T, xs[6:9].T
        _, vjp = jax.vjp(
            lambda pc, vc, ff, dtt, gg, ee: _mirror_substep(
                pc, vc, ff, config, dtt, gg, ee, alive),
            posc, velc, f, dt, grav, e)
        pb1, vb1, fbar, d, g, ev = vjp((pbc, vbc))
        pos8 = jnp.concatenate([posc.T, fbar.T, cid_row,
                                jnp.zeros((1, n_pad), jnp.float32)])
        pu = jnp.concatenate([posc, fbar], axis=1)
        ft = granular_pallas.contact_force_jvp_sorted(
            pos8, pu, cidc, off, md, kc, block=block, slab=slab,
            n_real=n, interpret=interpret, civ=civ)
        kcb = kcb + jnp.vdot(fbar, f) * inv_kc
        return (pb1 + ft[:, 3:], vb1, dtb + d, kcb, gb + g, eb + ev), None

    zero = jnp.float32(0.0)
    (pbc, vbc, dtb, kcb, gb, eb), _ = jax.lax.scan(
        bw, (pbc, vbc, zero, zero, zero, zero), trace, reverse=True)
    inv = jnp.argsort(order, stable=True)
    return pbc[inv].T, vbc[inv].T, dtb, kcb, gb, eb


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _diff_core(pos, vel, dt, kc, grav, e, config, n_steps, interpret):
    k = max(1, config.rebuild_every)
    n_full, rem = divmod(n_steps, k)

    def seg(c, _):
        p, v = c
        return _diff_segment_fwd(p, v, config, dt, kc, grav, e, k,
                                 interpret), None

    c = (pos, vel)
    if n_full:
        c, _ = jax.lax.scan(seg, c, None, length=n_full)
    if rem:
        c = _diff_segment_fwd(c[0], c[1], config, dt, kc, grav, e, rem,
                              interpret)
    return c


def _diff_core_fwd(pos, vel, dt, kc, grav, e, config, n_steps, interpret):
    k = max(1, config.rebuild_every)
    n_full, rem = divmod(n_steps, k)

    def seg(c, _):
        p, v = c
        return _diff_segment_fwd(p, v, config, dt, kc, grav, e, k,
                                 interpret), (p, v)

    c = (pos, vel)
    starts = None
    if n_full:
        c, starts = jax.lax.scan(seg, c, None, length=n_full)
    rem_start = c
    if rem:
        c = _diff_segment_fwd(c[0], c[1], config, dt, kc, grav, e, rem,
                              interpret)
    return c, (starts, rem_start, dt, kc, grav, e)


def _diff_core_bwd(config, n_steps, interpret, res, cot):
    starts, rem_start, dt, kc, grav, e = res
    # Non-differentiated scalar residuals come back as TypedNdArray
    # literals (no __neg__ etc.) — coerce to real arrays before tracing.
    dt, kc, grav, e = (jnp.asarray(x, jnp.float32)
                       for x in (dt, kc, grav, e))
    pbar, vbar = cot
    k = max(1, config.rebuild_every)
    n_full, rem = divmod(n_steps, k)
    zero = jnp.float32(0.0)
    acc = (zero, zero, zero, zero)  # dt, kc, grav, e cotangents
    if rem:
        pbar, vbar, *ds = _diff_segment_bwd(
            rem_start[0], rem_start[1], config, dt, kc, grav, e, rem,
            interpret, pbar, vbar)
        acc = tuple(a + d for a, d in zip(acc, ds))
    if n_full:
        def seg(c, xs):
            pbar, vbar, acc = c
            p0, v0 = xs
            pbar, vbar, *ds = _diff_segment_bwd(
                p0, v0, config, dt, kc, grav, e, k, interpret, pbar,
                vbar)
            return (pbar, vbar, tuple(a + d for a, d in zip(acc, ds))), None

        (pbar, vbar, acc), _ = jax.lax.scan(
            seg, (pbar, vbar, acc), starts, reverse=True)
    return (pbar, vbar) + tuple(a.astype(jnp.float32) for a in acc)


_diff_core.defvjp(_diff_core_fwd, _diff_core_bwd)


@functools.partial(jax.jit, static_argnames=("config", "n_steps",
                                             "interpret"))
def multi_step_diff(state: ParticleState, config: GranularConfig,
                    dt, n_steps: int,
                    interpret: Optional[bool] = None,
                    k_contact=None, gravity=None,
                    restitution=None) -> ParticleState:
    """Differentiable ``multi_step`` at slab-kernel speed.

    ``jax.grad``/``jax.vjp`` flow through this w.r.t. ``state.pos``,
    ``state.vel``, ``dt``, and the traced physics parameters
    ``k_contact`` / ``gravity`` / ``restitution`` (each defaults to the
    static config value; pass a traced scalar to optimize it — the
    system-ID use, see examples/inverse_granular.py). ``k_contact``'s
    cotangent exploits linearity of the penalty force in ``k``; the
    other two fall out of the integrate mirror's ``jax.vjp``. Forward:
    the production contact kernel + an XLA mirror
    of the integrate phase per substep, on the frozen-window schedule.
    Backward (per rebuild segment, reverse order): re-run the segment
    storing per-substep (state, force), transpose integrate/wall with
    ``jax.vjp`` of the mirror, and apply the pair-force transpose
    ``Jᵀ f̄`` with the slab-DMA JVP kernel
    (:func:`ops.granular_pallas.contact_force_jvp_sorted` — J symmetric,
    conservative pair force). Segment checkpointing bounds memory at
    O(rebuild_every) stored states.

    Gradient contract (same a.e. sense as the cloth path, see
    tests/test_granular_grad.py): branchy physics (contact activation,
    wall hits) differentiates piecewise; the discrete broad-phase
    structure is treated as locally constant; slab drops must be zero
    (``multi_step(..., return_stats=True)`` telemetry) or the force
    Jacobian loses its symmetry on the dropped pairs.

    Requires the CIV kernel path (default config) — the JVP kernel
    differentiates the exact VPU pair expressions.
    """
    spec = config.grid_spec()
    if not (config.civ and min(spec.dims) >= 3):
        raise ValueError(
            "multi_step_diff needs the CIV kernel path: civ=True and "
            f"grid dims >= 3 (got {spec.dims})")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kc = config.k_contact if k_contact is None else k_contact
    grav = config.gravity if gravity is None else gravity
    e = config.restitution if restitution is None else restitution
    pos, vel = _diff_core(state.pos, state.vel,
                          jnp.asarray(dt, jnp.float32),
                          jnp.asarray(kc, jnp.float32),
                          jnp.asarray(grav, jnp.float32),
                          jnp.asarray(e, jnp.float32), config, n_steps,
                          interpret)
    return ParticleState(pos=pos, vel=vel)


@functools.partial(jax.jit, static_argnames=("config", "n_steps",
                                             "return_stats", "backend",
                                             "interpret"))
def multi_step(state: ParticleState, config: GranularConfig, dt: jnp.ndarray,
               n_steps: int, return_stats: bool = False,
               backend: Optional[str] = None,
               interpret: Optional[bool] = None,
               k_contact=None, gravity=None, restitution=None):
    """``n_steps`` substeps. ``rebuild_every>1`` uses the frozen Verlet-list
    schedule; ``rebuild_every=1`` rebuilds the broad-phase each substep.

    ``backend``: ``"pallas"`` steps each frozen-window block with the
    slab-DMA kernel (ops/granular_pallas.py — the fast path on TPU, ~10x
    the XLA frozen path at 1M); ``"xla"`` keeps the gather-based frozen
    path; ``None`` picks pallas on TPU, xla elsewhere. ``interpret`` runs
    the kernel in Pallas interpret mode (defaults to True off-TPU, for
    tests).

    ``k_contact`` / ``gravity`` / ``restitution`` optionally override the
    config constants as TRACED scalars — they ride the kernel's params
    vector, so material changes cost zero recompiles (the egui-slider
    analog of the reference's hardcoded WGSL constants, and the per-world
    material knob for batched datagen). ``radius``/grid geometry stay
    static (they shape the broad-phase). Bitwise-identical to the static
    path when passed the config values.

    With ``return_stats=True`` returns ``(state, dropped_max)`` where
    ``dropped_max`` is the worst per-rebuild dropped-candidate count —
    nonzero means the broad-phase capacities (``window``/``max_neighbors``
    for xla, ``pallas_slab`` for pallas) are undersized and contacts were
    silently lost."""
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kc, grav, e = k_contact, gravity, restitution
    k = max(1, config.rebuild_every)
    if backend == "pallas":
        n_outer, rem = divmod(n_steps, k)
        n = state.pos.shape[-1]

        def outer(carry, _):
            pos, vel, ordc, dmax = carry
            pos, vel, order_step, d = _run_block_pallas(
                pos, vel, config, dt, k, interpret, stats=return_stats,
                kc=kc, grav=grav, e=e)
            # compose: original index of new slot s is ordc[order_step[s]]
            return (pos, vel, ordc[order_step],
                    jnp.maximum(dmax, d)), None

        carry = (state.pos, state.vel, jnp.arange(n, dtype=jnp.int32),
                 jnp.int32(0))
        if n_outer:
            carry, _ = jax.lax.scan(outer, carry, None, length=n_outer)
        if rem:
            pos, vel, order_step, d = _run_block_pallas(
                carry[0], carry[1], config, dt, rem, interpret,
                stats=return_stats, kc=kc, grav=grav, e=e)
            carry = (pos, vel, carry[2][order_step],
                     jnp.maximum(carry[3], d))
        pos, vel, ordc, dmax = carry
        inv = jnp.argsort(ordc, stable=True)     # one unsort for the run
        state = ParticleState(pos=pos[:, inv], vel=vel[:, inv])
        return (state, dmax) if return_stats else state
    if k == 1:
        def body(carry, _):
            s, dmax = carry
            s, d = substep(s, config, dt, return_stats=True,
                           kc=kc, grav=grav, e=e)
            return (s, jnp.maximum(dmax, d)), None

        (out, dmax), _ = jax.lax.scan(body, (state, jnp.int32(0)), None,
                                      length=n_steps)
        return (out, dmax) if return_stats else out

    n_outer, rem = divmod(n_steps, k)

    def outer(carry, _):
        s, dmax = carry
        s, d = _run_block(s, config, dt, k, kc, grav, e)
        return (s, jnp.maximum(dmax, d)), None

    dmax = jnp.int32(0)
    if n_outer:
        (state, dmax), _ = jax.lax.scan(outer, (state, dmax), None,
                                        length=n_outer)
    if rem:
        state, d = _run_block(state, config, dt, rem, kc, grav, e)
        dmax = jnp.maximum(dmax, d)
    return (state, dmax) if return_stats else state
