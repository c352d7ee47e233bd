"""Multi-chip parallelism over a TPU device mesh.

The reference is strictly single-process/single-GPU (SURVEY §2: no
parallelism components exist); its only concurrency is SIMT workgroup
dispatch. The TPU build scales two orthogonal ways:

1. **Worlds axis (data parallel):** independent vmapped scenes sharded over
   the mesh's ``worlds`` axis — embarrassingly parallel datagen with ZERO
   inter-chip collectives in the step (SURVEY §5, BASELINE configs[4]).
2. **Spatial axis (halo exchange):** a single giant cloth sharded by grid
   rows across the ``rows`` axis; the stencil needs a 2-row halo (the bend
   family reaches 2 rows down — cloth.rs:956-957), exchanged per substep
   with ``jax.lax.ppermute`` over ICI inside ``shard_map``.

Both compose: a ``(worlds, rows)`` mesh runs batches of spatially-sharded
giant cloths.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import ClothParams, ClothState
from ..models import cloth


def make_mesh(shape: Sequence[int] = None, axis_names: Sequence[str] = ("worlds",),
              devices=None) -> Mesh:
    """Build a device mesh. Default: 1-D ``worlds`` axis over all devices."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


# ---------------------------------------------------------------------------
# 1. Worlds-axis data parallelism
# ---------------------------------------------------------------------------

def shard_worlds(state: ClothState, mesh: Mesh, axis: str = "worlds") -> ClothState:
    """Place a batched state (leading worlds axis on pos/vel) on the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def put(x, is_batched):
        if x is None:
            return None
        return jax.device_put(x, sharding if is_batched else rep)

    return ClothState(
        pos=put(state.pos, True),
        vel=put(state.vel, True),
        pin_mask=put(state.pin_mask, state.pin_mask is not None and state.pin_mask.ndim > 2),
        pin_pos=put(state.pin_pos, state.pin_pos is not None and state.pin_pos.ndim > 3),
    )


@functools.partial(jax.jit, static_argnames=("n_steps",))
def batched_multi_step(state: ClothState, params: ClothParams, dt: jnp.ndarray,
                       n_steps: int) -> ClothState:
    """vmapped multi-substep over a leading worlds axis. Under a mesh-sharded
    input, XLA partitions this with no collectives (worlds are independent)."""
    return jax.vmap(lambda s: cloth.multi_step(s, params, dt, n_steps))(state)


def batched_self_collide_multi_step(state: ClothState, params: ClothParams,
                                    dt: jnp.ndarray, n_steps: int, spec,
                                    mesh: Mesh, axis: str = "worlds",
                                    rebuild_every: int = 2,
                                    pallas_block: int = 128,
                                    pallas_slab: int = 128,
                                    interpret=None,
                                    use_spring_kernel=None) -> ClothState:
    """Worlds-DP frozen-window SELF-COLLISION stepping (BASELINE
    configs[3] distributed): each shard advances its worlds through
    :func:`models.cloth.multi_step_self_collide` — per-substep slab-DMA
    contact narrow phase + fused spring/integrate kernel — serially via
    ``lax.map`` (scan, NOT vmap: the slab kernels carry SMEM operands
    that don't vmap; sequential per-world launches are what one core
    would execute anyway). No collectives in the step — worlds are
    independent; ``params``/``dt`` enter as REPLICATED shard_map
    operands (not closures) so the pattern stays differentiable the same
    way :func:`batched_spatial_multi_step` is.

    pos/vel: ``[B, 3, H, W]`` with B divisible by the mesh's ``axis``
    size; optional per-world pins.
    """
    has_pins = state.pin_mask is not None
    sp = P(axis)

    def body(pos, vel, params, dt, *pins):
        def one(args):
            p, v, *pw = args
            pinm, pinp = pw if has_pins else (None, None)
            out = cloth.multi_step_self_collide(
                ClothState(pos=p, vel=v, pin_mask=pinm, pin_pos=pinp),
                params, dt, n_steps, spec, rebuild_every=rebuild_every,
                pallas_block=pallas_block, pallas_slab=pallas_slab,
                interpret=interpret,
                use_spring_kernel=use_spring_kernel)
            return out.pos, out.vel

        return jax.lax.map(one, (pos, vel, *pins))

    pin_args = (state.pin_mask, state.pin_pos) if has_pins else ()
    pin_specs = (sp, sp) if has_pins else ()
    f = shard_map(body, mesh=mesh,
                  in_specs=(sp, sp, P(), P(), *pin_specs),
                  out_specs=(sp, sp), check_vma=False)
    new_pos, new_vel = jax.jit(f)(state.pos, state.vel, params, dt,
                                  *pin_args)
    return state._replace(pos=new_pos, vel=new_vel)


# ---------------------------------------------------------------------------
# 2. Spatial sharding with halo exchange
# ---------------------------------------------------------------------------

HALO = 2  # bend springs reach 2 rows (cloth.rs:956-957)


def _exchange_halo(x: jnp.ndarray, axis_name: str, halo: int = HALO) -> jnp.ndarray:
    """Extend local ``[3, h, W]`` rows with ``halo``-row halos from both
    neighbors along ``axis_name`` (non-wrapping: boundary shards receive
    zeros, masked out via row_valid)."""
    n = jax.lax.psum(1, axis_name)
    top = x[:, :halo]
    bot = x[:, -halo:]
    # up_halo on shard i = bottom rows of shard i-1  (perm: i → i+1)
    up_halo = jax.lax.ppermute(bot, axis_name, [(i, i + 1) for i in range(n - 1)])
    # down_halo on shard i = top rows of shard i+1   (perm: i → i-1)
    down_halo = jax.lax.ppermute(top, axis_name, [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([up_halo, x, down_halo], axis=1)


def _spatial_substep_local(pos, vel, pin_mask, pin_pos, params, dt, axis_name,
                           substeps: int = 1, use_kernel: bool = False,
                           interpret=None):
    """Per-shard body: ONE halo exchange of width ``2·substeps`` followed by
    ``substeps`` local substeps (halo widening: stencil reach is 2 rows per
    substep, so a 2K halo stays correct for K substeps — the stale region
    creeps inward 2 rows/substep and is sliced off). K× fewer ppermutes on
    ICI at the cost of K× redundant halo compute. Runs inside shard_map.

    ``use_kernel=True`` steps the halo-extended block with the fused
    Pallas kernel (:func:`ops.cloth_pallas.multi_step_window` — global-row
    masks from the shard's row offset) instead of the XLA stencil: the
    in-chip rate then matches the single-chip kernel instead of XLA rates.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name)
    h_local = pos.shape[-2]
    halo = HALO * substeps

    pos_ext = _exchange_halo(pos, axis_name, halo)
    vel_ext = _exchange_halo(vel, axis_name, halo)
    if pin_mask is not None:
        # pins are per-local-row; halo rows take their owners' pins
        pinm_ext = _exchange_halo(pin_mask[None].astype(jnp.float32),
                                  axis_name, halo)[0] != 0.0
        pinpos_ext = _exchange_halo(pin_pos, axis_name, halo)

    if use_kernel:
        from ..ops import cloth_pallas

        row0 = idx * h_local - halo      # global row of ext row 0 (traced)
        h_global = n * h_local
        pos_ext, vel_ext = cloth_pallas.multi_step_window(
            pos_ext, vel_ext,
            pinm_ext if pin_mask is not None else None,
            pinpos_ext if pin_mask is not None else None,
            params, dt, substeps, row0, h_global, interpret=interpret)
        return pos_ext[:, halo:-halo], vel_ext[:, halo:-halo]

    row_valid = jnp.concatenate([
        jnp.full((halo,), idx > 0),
        jnp.ones((h_local,), bool),
        jnp.full((halo,), idx < n - 1),
    ])
    for _ in range(substeps):
        force_ext = cloth.spring_forces(pos_ext, vel_ext, params,
                                        row_valid=row_valid)
        pos_ext, vel_ext = cloth.integrate(pos_ext, vel_ext, force_ext,
                                           params, dt)
        if pin_mask is not None:
            pos_ext = jnp.where(pinm_ext[None], pinpos_ext, pos_ext)
            vel_ext = jnp.where(pinm_ext[None], 0.0, vel_ext)
    return pos_ext[:, halo:-halo], vel_ext[:, halo:-halo]


def _kernel_fits(state: ClothState, mesh: Mesh, axis: str,
                 substeps: int) -> bool:
    """Whether the halo-extended shard block fits the single-block fused
    kernel's VMEM budget (ops.cloth_pallas._VMEM_PARTICLE_LIMIT)."""
    from ..ops import cloth_pallas

    h, w = state.pos.shape[-2:]
    h_ext = h // mesh.shape[axis] + 2 * HALO * substeps
    return h_ext * w <= cloth_pallas._VMEM_PARTICLE_LIMIT


def spatial_substep(state: ClothState, params: ClothParams, dt: jnp.ndarray,
                    mesh: Mesh, axis: str = "rows",
                    substeps: int = 1, use_kernel=None) -> ClothState:
    """``substeps`` substeps of a single cloth sharded by rows across
    ``axis``, with ONE halo exchange (width 2·substeps).

    Mathematically identical to ``substeps`` × :func:`cloth.substep` — halo
    rows carry true neighbor data, edges crossing the global boundary are
    masked, and the halo-widening redundancy is sliced off.

    ``use_kernel`` steps each shard with the fused Pallas window kernel
    (None = auto: on when the extended shard fits its VMEM budget, running
    interpreted off-TPU). The kernel path matches the XLA path to fp32
    stencil-order tolerance (see tests/test_parallel.py).
    """
    has_pins = state.pin_mask is not None
    if use_kernel is None:
        use_kernel = _kernel_fits(state, mesh, axis, substeps)
    spec3 = P(None, axis, None)   # [3, H, W] sharded on H
    spec2 = P(axis, None)          # [H, W]

    if has_pins:
        def body(pos, vel, pin_mask, pin_pos):
            return _spatial_substep_local(pos, vel, pin_mask, pin_pos,
                                          params, dt, axis, substeps,
                                          use_kernel=use_kernel)

        # check_vma=False: pallas_call results carry no varying-mesh-axes
        # annotation, which trips shard_map's vma check on the kernel path
        f = shard_map(body, mesh=mesh,
                      in_specs=(spec3, spec3, spec2, spec3),
                      out_specs=(spec3, spec3), check_vma=False)
        new_pos, new_vel = f(state.pos, state.vel, state.pin_mask, state.pin_pos)
    else:
        def body(pos, vel):
            return _spatial_substep_local(pos, vel, None, None, params, dt,
                                          axis, substeps,
                                          use_kernel=use_kernel)

        f = shard_map(body, mesh=mesh, in_specs=(spec3, spec3),
                      out_specs=(spec3, spec3), check_vma=False)
        new_pos, new_vel = f(state.pos, state.vel)
    return state._replace(pos=new_pos, vel=new_vel)


def batched_spatial_multi_step(state: ClothState, params: ClothParams,
                               dt: jnp.ndarray, n_steps: int, mesh: Mesh,
                               worlds_axis: str = "worlds",
                               rows_axis: str = "rows",
                               substeps_per_exchange: int = 1,
                               use_kernel=None) -> ClothState:
    """Composed 2-D parallelism: a batch of worlds (data-parallel over
    ``worlds_axis``) of spatially row-sharded cloths (halo exchange over
    ``rows_axis``). pos/vel: ``[B, 3, H, W]``; optional per-world pins
    (``pin_mask [B, H, W]``, ``pin_pos [B, 3, H, W]``).

    This is the full multi-chip step: DP over independent scenes × SP over
    the grid. Halo ``ppermute``s ride ICI once every
    ``substeps_per_exchange`` substeps (halo widening — stencil reach is
    2 rows/substep, so a ``2K``-wide halo stays exact for K substeps), and
    ``use_kernel`` steps each shard's halo-extended window with the fused
    Pallas kernel (None = auto when the window fits its VMEM budget) —
    the same in-chip rate as the single-chip kernel, not XLA rates. The
    per-shard worlds batch is stepped with ``lax.map`` (a vmapped
    pallas_call with SMEM operands is unsupported; sequential per-world
    launches are what a single core would execute anyway).
    """
    k = substeps_per_exchange
    assert n_steps % k == 0, "n_steps must be divisible by substeps_per_exchange"
    h_local = state.pos.shape[-2] // mesh.shape[rows_axis]
    assert HALO * k <= h_local, (
        f"halo width {HALO * k} exceeds shard height {h_local}; lower "
        "substeps_per_exchange or use fewer shards")
    if use_kernel is None:
        ext = (h_local + 2 * HALO * k) * state.pos.shape[-1]
        from ..ops import cloth_pallas

        use_kernel = ext <= cloth_pallas._VMEM_PARTICLE_LIMIT
    has_pins = state.pin_mask is not None
    spec = P(worlds_axis, None, rows_axis, None)
    spec_mask = P(worlds_axis, rows_axis, None)

    # one body parameterized over the (static) pin presence: the mapped
    # tuple carries pins only when they exist, so the pinned and unpinned
    # variants can't drift apart (they once duplicated the scan/map loop).
    # params/dt enter as REPLICATED shard_map operands, not closures:
    # closed-over tracers (e.g. under jax.grad of a training step) carry
    # Auto-mesh shardings that clash with the Manual context — and as
    # operands their cotangents are psum'd across shards by shard_map's
    # transpose, which is exactly the DP gradient aggregation.
    def body(pos, vel, params, dt, *pins):
        def one_world(args):
            pos, vel, *pw = args
            pinm, pinp = pw if has_pins else (None, None)
            return _spatial_substep_local(pos, vel, pinm, pinp, params, dt,
                                          rows_axis, substeps=k,
                                          use_kernel=use_kernel)

        def one(carry, _):
            p, v = carry
            p, v = jax.lax.map(one_world, (p, v, *pins))
            return (p, v), None

        (p, v), _ = jax.lax.scan(one, (pos, vel), None, length=n_steps // k)
        return p, v

    pin_args = (state.pin_mask, state.pin_pos) if has_pins else ()
    pin_specs = (spec_mask, spec) if has_pins else ()
    f = shard_map(body, mesh=mesh,
                  in_specs=(spec, spec, P(), P(), *pin_specs),
                  out_specs=(spec, spec), check_vma=False)
    new_pos, new_vel = jax.jit(f)(state.pos, state.vel, params, dt, *pin_args)
    return state._replace(pos=new_pos, vel=new_vel)


def spatial_multi_step(state: ClothState, params: ClothParams, dt: jnp.ndarray,
                       n_steps: int, mesh: Mesh, axis: str = "rows",
                       substeps_per_exchange: int = 1,
                       use_kernel=None) -> ClothState:
    """``n_steps`` spatially-sharded substeps under one jit; halo ppermutes
    ride ICI once every ``substeps_per_exchange`` substeps (halo widening),
    state never leaves the devices. ``n_steps`` must be divisible by
    ``substeps_per_exchange``. ``use_kernel``: see :func:`spatial_substep`."""
    k = substeps_per_exchange
    assert n_steps % k == 0, "n_steps must be divisible by substeps_per_exchange"
    h_local = state.pos.shape[-2] // mesh.shape[axis]
    assert HALO * k <= h_local, (
        f"halo width {HALO * k} exceeds shard height {h_local}; lower "
        "substeps_per_exchange or use fewer shards")
    if use_kernel is None:
        use_kernel = _kernel_fits(state, mesh, axis, k)

    @functools.partial(jax.jit, static_argnames=())
    def run(s):
        def body(carry, _):
            return spatial_substep(carry, params, dt, mesh, axis, k,
                                   use_kernel=use_kernel), None

        out, _ = jax.lax.scan(body, s, None, length=n_steps // k)
        return out

    return run(state)
