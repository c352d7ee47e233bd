"""Multi-chip granular stepping: the slab-DMA contact kernel sharded over
a device mesh.

The granular substep (ops/granular_pallas.py) is a grid of independent
per-block programs over the SORTED particle array — embarrassingly
parallel given two shared inputs: the full position array (slab-DMA
source) and the rebuild's slab offsets. That makes the distribution
strategy the opposite of the cloth rows-SP path (parallel/mesh.py): no
halo bookkeeping at all —

* device ``d`` owns the contiguous sorted blocks
  ``[d·nbloc, (d+1)·nbloc)`` and integrates ONLY its own particles
  (the kernel runs with a per-launch global base index so self-exclusion
  and the ``n_real`` pad test see global sorted slots);
* the slab DMA source stays the FULL position array, refreshed once per
  substep with ``jax.lax.all_gather`` over ICI (positions only —
  velocities stay shard-local between rebuilds). At 1M particles that is
  12 MB/substep of ICI traffic against ~VPU-bound block math, i.e. the
  gather rides under the compute;
* the rebuild (sort + CIV offsets) is REPLICATED: every device sorts the
  gathered state identically. Rebuilds happen once per
  ``rebuild_every`` substeps and the multi-operand sort is ~25 ms at 1M,
  so replication costs wall-clock parity with the single-chip rebuild —
  the substep compute is what scales with devices. (A distributed sort
  would shrink that too; measured single-chip profile says it is not the
  wall until ~8 devices.)

Semantics: identical math to ``granular.multi_step(backend="pallas")`` —
same kernel, same rebuild, same op order. The only numeric difference is
the global pad size (``n_pad`` rounds to ``block·8·D``), which can shift
end-of-array slab clips; candidate SETS are identical (CIV validity),
so results match the single-device path to fp reassociation at worst and
bitwise when the pad coincides.

The reference has no multi-GPU story (SURVEY §2); this extends the
BASELINE configs[2] workload across chips the way mesh.py extends
configs[1]. :func:`multi_step_diff_sharded` adds the worlds-DP
composition of the differentiable path (distributed granular
system-ID / training).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.state import ParticleState
from ..models import broadphase
from ..models.granular import GranularConfig
from ..ops import granular_pallas


def multi_step_diff_sharded(state: ParticleState, config: GranularConfig,
                            dt, n_steps: int, mesh: Mesh,
                            axis: str = "worlds",
                            k_contact=None, gravity=None, restitution=None,
                            interpret: Optional[bool] = None
                            ) -> ParticleState:
    """Batched DIFFERENTIABLE granular stepping, worlds-data-parallel
    over ``mesh[axis]`` — the distributed-training composition of
    :func:`~wgpu_physics_engine_tpu.models.granular.multi_step_diff`.

    ``state.pos``/``state.vel`` are ``[W, 3, N]`` with the worlds axis
    sharded (``W % mesh.shape[axis] == 0``). Each device steps its local
    worlds serially via ``lax.map`` (scan, NOT vmap — the slab kernels
    never see a batch dim), so every per-world program is exactly the
    single-chip differentiable path.

    Gradients flow w.r.t. the batched state, ``dt``, and the traced
    physics scalars ``k_contact`` / ``gravity`` / ``restitution`` (each
    defaults to the config constant). The scalars enter the shard_map as
    REPLICATED operands, so their cotangents are ``psum``-ed across the
    mesh by shard_map's transpose — the DP gradient all-reduce falls out
    of the sharding (the parallel/mesh.py training-path design). Jit the
    surrounding loss; this function stays un-jitted so it composes under
    ``jax.grad``/``jax.value_and_grad`` without re-tracing games.
    """
    from ..models import granular

    num_d = mesh.shape[axis]
    n_worlds = state.pos.shape[0]
    if n_worlds % num_d:
        raise ValueError(
            f"W={n_worlds} worlds not divisible by {num_d} devices")
    kc = config.k_contact if k_contact is None else k_contact
    grav = config.gravity if gravity is None else gravity
    e = config.restitution if restitution is None else restitution

    def body(pos, vel, dt, kc, grav, e):
        def one(pv):
            p, v = pv
            out = granular.multi_step_diff(
                ParticleState(pos=p, vel=v), config, dt, n_steps,
                interpret=interpret, k_contact=kc, gravity=grav,
                restitution=e)
            return out.pos, out.vel

        return jax.lax.map(one, (pos, vel))

    pspec = P(axis)
    f = shard_map(body, mesh=mesh,
                  in_specs=(pspec, pspec, P(), P(), P(), P()),
                  out_specs=(pspec, pspec), check_vma=False)
    pos, vel = f(state.pos, state.vel, jnp.asarray(dt, jnp.float32),
                 jnp.asarray(kc, jnp.float32),
                 jnp.asarray(grav, jnp.float32),
                 jnp.asarray(e, jnp.float32))
    return ParticleState(pos=pos, vel=vel)


def multi_step_sharded(state: ParticleState, config: GranularConfig,
                       dt, n_steps: int, mesh: Mesh, axis: str = "grains",
                       interpret: Optional[bool] = None,
                       return_stats: bool = False):
    """``n_steps`` granular substeps sharded over ``mesh[axis]``.

    ``state.pos``/``state.vel`` are ``[3, N]`` with the particle axis
    sharded (contiguous chunks per device; ``N % mesh.shape[axis] == 0``).
    Requires the CIV kernel path (``config.civ``, the default);
    ``thin`` composes.

    With ``return_stats=True`` also returns the worst per-rebuild dropped
    count (same contract as ``granular.multi_step``).
    """
    num_d = mesh.shape[axis]
    n = state.pos.shape[-1]
    if n % num_d:
        raise ValueError(f"N={n} not divisible by {num_d} devices")
    spec = config.grid_spec()
    civ_ok = config.civ and min(spec.dims) >= 3
    if not civ_ok:
        raise ValueError(
            "multi_step_sharded needs the CIV kernel path: civ=True, "
            f"grid dims >= 3 (got {spec.dims})")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    civ = granular_pallas.civ_bounds(spec, thin=config.thin)
    block, slab = config.pallas_block, config.pallas_slab
    # global pad: a multiple of block·8·D, so every shard owns an equal
    # whole number of 8-block slab_start tiles (the kernel's SMEM rows)
    unit = block * 8 * num_d
    n_pad = -(-max(n, slab) // unit) * unit
    assert n_pad < 2 ** 24, "selfs base rides an f32 params slot exactly"
    nloc_pad = n_pad // num_d
    nbloc = nloc_pad // block
    nloc = n // num_d
    pad = n_pad - n
    k = max(1, config.rebuild_every)
    n_outer, rem = divmod(n_steps, k)

    def body(pos_sh, vel_sh, dt):
        d = jax.lax.axis_index(axis)
        lo_sorted = d * nloc_pad

        def run_block(posf, velf, length):
            # replicated rebuild on the gathered state
            grid = broadphase.build_sorted_grid(posf, velf, spec)
            cidf, off, dropped = granular_pallas.build_offsets_civ(
                grid, spec, block, slab, n_pad, thin=config.thin,
                stats=return_stats)
            posc = jnp.pad(grid.sorted_pos.T, ((0, pad), (0, 0)),
                           constant_values=4.0 * config.bounds)
            velc = jnp.pad(grid.sorted_vel.T, ((0, pad), (0, 0)))
            cid_row = cidf[None, :]
            # shard-local views: this device's blocks (+ the extra
            # 8-row slab_start tile the cross-block prefetch reads;
            # build_offsets_civ pads 8 rows past nb, so the last shard's
            # slice lands exactly on the array end)
            posc_l = jax.lax.dynamic_slice(posc, (lo_sorted, 0),
                                           (nloc_pad, 3))
            velc_l = jax.lax.dynamic_slice(velc, (lo_sorted, 0),
                                           (nloc_pad, 3))
            win_l = jax.lax.dynamic_slice(cidf[:, None], (lo_sorted, 0),
                                          (nloc_pad, 1))
            off_l = jax.lax.dynamic_slice(off, (d * nbloc, 0),
                                          (nbloc + 8, off.shape[1]))
            pvec = jnp.stack([
                2.0 * jnp.float32(config.radius),
                jnp.float32(config.k_contact),
                jnp.float32(config.gravity), jnp.float32(dt),
                jnp.float32(config.restitution),
                jnp.float32(config.bounds - config.radius),
                lo_sorted.astype(jnp.float32),   # kernel selfs base
            ]).astype(jnp.float32)

            def inner(c, _):
                posc_full, posc_l, velc_l = c
                pos4 = jnp.concatenate([posc_full.T, cid_row])
                posc_l, velc_l = granular_pallas.substep_sorted(
                    pos4, posc_l, velc_l, win_l, off_l, pvec,
                    block=block, slab=slab, n_real=n, interpret=interpret,
                    civ=civ)
                # refresh the slab-DMA source: positions only
                posc_full = jax.lax.all_gather(posc_l, axis, axis=0,
                                               tiled=True)
                return (posc_full, posc_l, velc_l), None

            (posc, _, velc_l), _ = jax.lax.scan(
                inner, (posc, posc_l, velc_l), None, length=length)
            velc = jax.lax.all_gather(velc_l, axis, axis=0, tiled=True)
            inv = jnp.argsort(grid.order, stable=True)
            return posc[:n].T[:, inv], velc[:n].T[:, inv], dropped

        posf = jax.lax.all_gather(pos_sh, axis, axis=1, tiled=True)
        velf = jax.lax.all_gather(vel_sh, axis, axis=1, tiled=True)
        dmax = jnp.int32(0)
        if n_outer:
            def outer(c, _):
                posf, velf, dmax = c
                posf, velf, dropped = run_block(posf, velf, k)
                return (posf, velf, jnp.maximum(dmax, dropped)), None

            (posf, velf, dmax), _ = jax.lax.scan(
                outer, (posf, velf, dmax), None, length=n_outer)
        if rem:
            posf, velf, dropped = run_block(posf, velf, rem)
            dmax = jnp.maximum(dmax, dropped)
        lo = d * nloc
        return (jax.lax.dynamic_slice(posf, (0, lo), (3, nloc)),
                jax.lax.dynamic_slice(velf, (0, lo), (3, nloc)), dmax)

    pspec = P(None, axis)
    f = shard_map(body, mesh=mesh, in_specs=(pspec, pspec, P()),
                  out_specs=(pspec, pspec, P()), check_vma=False)
    pos, vel, dmax = jax.jit(f)(state.pos, state.vel,
                                jnp.asarray(dt, jnp.float32))
    out = ParticleState(pos=pos, vel=vel)
    return (out, dmax) if return_stats else out
