"""Sort-based uniform-grid broad-phase (BASELINE configs[2]/[3]).

The reference has no neighbor search at all (its only pair interaction is
the O(N·S) spring scan). On TPU, scatter-heavy linked-cell grids are
replaced by a **sort-based fixed-capacity bucket table**:

1. quantize positions to cells, linearize to cell ids,
2. sort particle indices by cell id (``jnp.argsort``; XLA's TPU sort),
3. rank within each cell via first-occurrence search, scatter indices into a
   ``[num_cells, capacity]`` table (overflow dropped deterministically),
4. query = for each of the 27 neighbor cells, gather candidates and apply a
   pairwise kernel (masked; scanned over offsets to bound memory).

All shapes are static; capacity is the only tuning knob (candidates beyond
it are ignored, like a fixed-size cell list).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _safe_norm(d2: jnp.ndarray) -> jnp.ndarray:
    """sqrt(d2) with a finite backward pass at d2 = 0 (primal identical:
    sqrt(0) = 0). Self/invalid candidate slots gather coincident
    positions, and the naked sqrt's infinite derivative there turns the
    where-mask's zero cotangent into NaN — which would poison
    ``jax.grad`` through the contact paths (the XLA narrow phases are
    differentiable; see models/cloth._safe_norm for the same guard)."""
    pos = d2 > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, d2, 1.0)), 0.0)


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static uniform-grid description. ``cell_size`` must be ≥ the
    interaction diameter for 27-cell completeness."""

    origin: Tuple[float, float, float]
    cell_size: float
    dims: Tuple[int, int, int]       # cells per axis
    capacity: int = 8                # max particles per cell

    @property
    def num_cells(self) -> int:
        return self.dims[0] * self.dims[1] * self.dims[2]


def cell_ids(pos: jnp.ndarray, spec: GridSpec, origin=None) -> jnp.ndarray:
    """Linear cell id per particle. ``pos``: [3, N]. ``origin`` may be a
    traced [3] array (a grid that follows the object's bounding box);
    defaults to the static ``spec.origin``."""
    if origin is None:
        origin = jnp.asarray(spec.origin, jnp.float32)
    origin = origin[:, None]
    c = jnp.floor((pos - origin) / spec.cell_size).astype(jnp.int32)
    dims = jnp.asarray(spec.dims, jnp.int32)[:, None]
    c = jnp.clip(c, 0, dims - 1)
    return (c[0] * spec.dims[1] + c[1]) * spec.dims[2] + c[2]


def build_table(pos: jnp.ndarray, spec: GridSpec, origin=None,
                return_stats: bool = False):
    """Bucket table ``[num_cells, capacity]`` of particle indices (-1 = empty).

    Deterministic: within a cell, particles appear in index order (argsort is
    stable); overflow beyond ``capacity`` is dropped. With
    ``return_stats=True`` also returns the dropped-particle count (int32
    scalar) — nonzero means ``capacity`` is undersized for this density.
    """
    n = pos.shape[-1]
    cid = cell_ids(pos, spec, origin)
    order = jnp.argsort(cid, stable=True)
    sorted_cid = cid[order]
    # first slot of each equal-cid run via a forward max-scan over marked
    # run heads (gather-free; searchsorted here costs N·log2(N) gathers)
    iota = jnp.arange(n, dtype=jnp.int32)
    is_first = jnp.concatenate([jnp.ones((1,), bool),
                                sorted_cid[1:] != sorted_cid[:-1]])
    first = jax.lax.associative_scan(jnp.maximum,
                                     jnp.where(is_first, iota, 0))
    rank = iota - first
    slot = sorted_cid.astype(jnp.int32) * spec.capacity + rank
    keep = rank < spec.capacity
    # overflow entries get an out-of-range slot, dropped by mode="drop"
    slot = jnp.where(keep, slot, spec.num_cells * spec.capacity)
    table = jnp.full((spec.num_cells * spec.capacity,), -1, jnp.int32)
    table = table.at[slot].set(order.astype(jnp.int32), mode="drop")
    table = table.reshape(spec.num_cells, spec.capacity)
    if return_stats:
        return table, jnp.sum(~keep).astype(jnp.int32)
    return table


_OFFSETS = jnp.asarray(
    [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    jnp.int32)

# 9 (dx, dy) offset groups; each covers the z-contiguous cell triple
# [dz-1, dz, dz+1] as ONE sorted-array window.
OFFSETS_XY = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def group_window_ranges(c: jnp.ndarray, spec: GridSpec,
                        cell_start: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sorted-array window ranges of the 9 (dx, dy) neighbor-column groups.

    ``c``: [3, N] integer cell coords (already clipped to the grid).
    Returns ``(starts [N, 9], ends [N, 9], okxy [N, 9])`` where group
    ``g``'s candidates for particle ``i`` are the sorted slots
    ``[starts[i, g], ends[i, g])`` — the z-triple window — and
    ``okxy[i, g]`` is False when the group's (x, y) cell column lies
    outside the grid (the clamped range is then meaningless and MUST be
    masked or replaced by the caller).

    This is the single source of truth for the window derivation shared
    by :func:`pair_forces_sorted`, :func:`build_candidates`, and
    ``ops.granular_pallas.build_windows``.
    """
    dims = jnp.asarray(spec.dims, jnp.int32)
    ncz0 = jnp.maximum(c[2] - 1, 0)
    zspan = jnp.minimum(c[2] + 2, dims[2]) - ncz0     # 2 or 3 cells
    starts, ends, oks = [], [], []
    for dx, dy in OFFSETS_XY:
        okxy = ((c[0] + dx >= 0) & (c[0] + dx < dims[0]) &
                (c[1] + dy >= 0) & (c[1] + dy < dims[1]))
        ncx = jnp.clip(c[0] + dx, 0, dims[0] - 1)
        ncy = jnp.clip(c[1] + dy, 0, dims[1] - 1)
        c0 = (ncx * spec.dims[1] + ncy) * spec.dims[2] + ncz0
        starts.append(cell_start[c0])
        ends.append(cell_start[c0 + zspan])
        oks.append(okxy)
    return (jnp.stack(starts, axis=-1), jnp.stack(ends, axis=-1),
            jnp.stack(oks, axis=-1))


class SortedGrid(NamedTuple):
    """Scatter-free broad-phase structure: particles reordered by cell id +
    per-cell range starts. TPU scatters serialize (~µs/element), so instead
    of a bucket table we keep the SORTED arrays and answer neighbor queries
    with contiguous windows over them:

    the 27 neighbor cells = 9 (dx, dy) groups × 3 z-contiguous cells, and
    each group's candidates form one contiguous index range
    ``[cell_start[c0], cell_start[c0+3])`` of the sorted order.
    """

    order: jnp.ndarray        # [N] original index of sorted slot
    sorted_cid: jnp.ndarray   # [N]
    cell_start: jnp.ndarray   # [num_cells + 3] first sorted slot of each cell
    sorted_pos: jnp.ndarray   # [3, N]
    sorted_vel: jnp.ndarray   # [3, N]


def build_sorted_grid(pos: jnp.ndarray, vel: jnp.ndarray, spec: GridSpec,
                      origin=None) -> SortedGrid:
    n = pos.shape[-1]
    cid = cell_ids(pos, spec, origin)
    # ONE multi-operand stable sort carries the state planes + iota through
    # the sort network instead of argsort followed by seven 1M-index
    # permutation gathers — random gathers from >cache tables run at
    # ~60 ns/index on v5e, so carrying operands cuts the 1M rebuild's
    # sort+reorder phase ~2.7× (67 → 25 ms; round-3 probe). Bitwise
    # identical to the gather formulation (same permutation, same values).
    out = jax.lax.sort(
        [cid, jnp.arange(n, dtype=jnp.int32),
         pos[0], pos[1], pos[2], vel[0], vel[1], vel[2]],
        num_keys=1, is_stable=True)
    sorted_cid, order = out[0], out[1]
    sorted_pos = jnp.stack(out[2:5])
    sorted_vel = jnp.stack(out[5:8])
    # cell_start[c] = #particles with cid < c, via histogram + exclusive
    # cumsum. A sorted-index scatter-add runs at data rate on TPU, unlike
    # dense searchsorted over num_cells queries (num_cells·log2(N) serial
    # binary-search gathers — 8× slower at 1M/2M cells on v5e).
    counts = jnp.zeros((spec.num_cells,), jnp.int32).at[sorted_cid].add(
        1, indices_are_sorted=True, mode="drop")
    cell_start = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(counts).astype(jnp.int32),
        jnp.full((2,), n, jnp.int32),        # c in [num_cells, num_cells+2]
    ])
    return SortedGrid(order=order, sorted_cid=sorted_cid,
                      cell_start=cell_start,
                      sorted_pos=sorted_pos, sorted_vel=sorted_vel)


def pair_forces_sorted(grid: SortedGrid, spec: GridSpec, radius, k_contact,
                       window: int, origin=None,
                       return_stats: bool = False):
    """Pairwise penalty contact using the scatter-free structure.

    Returns forces in ORIGINAL particle order, [3, N]. ``window`` bounds the
    candidates taken per (dx, dy) group (≈ 3 × expected cell occupancy);
    extras beyond it are dropped, like table capacity. With
    ``return_stats=True`` also returns the dropped-candidate count (int32
    scalar, summed over particles and offset groups) — nonzero in a dense
    pile means ``window`` is silently losing contacts.
    """
    pos = grid.sorted_pos
    vel = grid.sorted_vel
    n = pos.shape[-1]
    if origin is None:
        origin = jnp.asarray(spec.origin, jnp.float32)
    c = jnp.floor((pos - origin[:, None]) / spec.cell_size).astype(jnp.int32)
    dims = jnp.asarray(spec.dims, jnp.int32)
    c = jnp.clip(c, 0, dims[:, None] - 1)
    min_dist = 2.0 * jnp.float32(radius)
    slot_self = jnp.arange(n, dtype=jnp.int32)
    k_idx = jnp.arange(window, dtype=jnp.int32)
    g_starts, g_ends, g_ok = group_window_ranges(c, spec, grid.cell_start)

    def one_group(carry, xs):
        force, dropped = carry
        start, end, okxy = xs
        dropped = dropped + jnp.sum(
            jnp.where(okxy, jnp.maximum(end - start - window, 0), 0))
        idx = start[:, None] + k_idx[None, :]            # [N, window]
        valid = (idx < end[:, None]) & okxy[:, None]
        idx = jnp.clip(idx, 0, n - 1)
        valid = valid & (idx != slot_self[:, None])
        cpos = pos[:, idx]                               # [3, N, window]
        d = pos[:, :, None] - cpos
        dist = _safe_norm(jnp.sum(d * d, axis=0))
        touching = valid & (dist < min_dist) & (dist > 1e-6)
        inv = 1.0 / jnp.where(dist > 1e-6, dist, 1.0)
        f = jnp.where(touching[None], (k_contact * (min_dist - dist) * inv)[None] * d, 0.0)
        return (force + jnp.sum(f, axis=2), dropped), None

    force0 = jnp.zeros_like(pos)
    (force, dropped), _ = jax.lax.scan(
        one_group, (force0, jnp.int32(0)),
        (g_starts.T, g_ends.T, g_ok.T))
    # unsort back to original particle order via inverse-permutation GATHER
    # (a scatter here would reintroduce the cost this path exists to avoid)
    inv = jnp.argsort(grid.order, stable=True)
    if return_stats:
        return force[:, inv], dropped
    return force[:, inv]


def build_candidates(grid: SortedGrid, spec: GridSpec, r_query,
                     window: int, max_neighbors: int,
                     origin=None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Verlet candidate list in SORTED order: for each sorted slot, up to
    ``max_neighbors`` other slots within ``r_query`` (deterministic: kept in
    window-scan order). This is the rebuild-every-K broad-phase — the
    returned index matrix is loop-invariant across substeps, so the hot
    pair loop's gather indices are reused instead of recomputed (the
    dominant granular cost; see CLAUDE.md round-1 probe log).

    ``r_query`` should be ``2·radius + skin`` where ``skin`` bounds the
    relative displacement accumulated between rebuilds; ``spec.cell_size``
    must be ≥ ``r_query`` for 27-cell completeness.

    Returns ``(idx [N, M] int32, mask [N, M] bool, dropped int32 scalar)``
    where ``dropped`` counts true candidates lost to ``window`` or
    ``max_neighbors`` truncation (telemetry: nonzero means the list is
    undersized for this density).
    """
    pos = grid.sorted_pos
    n = pos.shape[-1]
    m = max_neighbors
    if origin is None:
        origin = jnp.asarray(spec.origin, jnp.float32)
    c = jnp.floor((pos - origin[:, None]) / spec.cell_size).astype(jnp.int32)
    dims = jnp.asarray(spec.dims, jnp.int32)
    c = jnp.clip(c, 0, dims[:, None] - 1)
    r2 = jnp.float32(r_query) * jnp.float32(r_query)
    slot_self = jnp.arange(n, dtype=jnp.int32)
    k_idx = jnp.arange(window, dtype=jnp.int32)
    big = jnp.int32(1 << 30)

    # Pass 1: all 9 windows' candidates + validity in one [N, 9·window]
    # matrix (the gathers here are the irreducible rebuild cost: ~6.6 ns
    # per index on v5e).
    keys = []
    idxs = []
    dropped = jnp.int32(0)
    g_starts, g_ends, g_ok = group_window_ranges(c, spec, grid.cell_start)
    for g in range(9):
        start, end, okxy = g_starts[:, g], g_ends[:, g], g_ok[:, g]
        idx = start[:, None] + k_idx[None, :]               # [N, window]
        valid = (idx < end[:, None]) & okxy[:, None]
        idxc = jnp.clip(idx, 0, n - 1)
        valid = valid & (idxc != slot_self[:, None])
        cpos = pos[:, idxc]                                 # [3, N, window]
        d = pos[:, :, None] - cpos
        valid = valid & (jnp.sum(d * d, axis=0) < r2)
        # window-overflow telemetry: candidates past the window are unseen,
        # count them all (conservative — some might fail the radius test)
        over = jnp.maximum(end - start - window, 0)
        dropped = dropped + jnp.sum(jnp.where(okxy, over, 0))
        rank = g * window + k_idx
        keys.append(jnp.where(valid, rank[None, :], big))
        idxs.append(idxc)
    key = jnp.concatenate(keys, axis=1)                     # [N, 9W]
    idx = jnp.concatenate(idxs, axis=1)

    # Pass 2: compact the ≤M smallest-rank valid candidates per row by M
    # argmin-extraction sweeps. Each sweep is a cheap vector reduce over the
    # minor axis — benchmarked far faster than top_k / per-row sorts on TPU
    # (which lower to O(width log² width) sorting networks).
    cols = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)

    def extract(carry, _):
        key = carry
        amin = jnp.argmin(key, axis=1)                      # [N]
        kmin = jnp.take_along_axis(key, amin[:, None], 1)[:, 0]
        imin = jnp.take_along_axis(idx, amin[:, None], 1)[:, 0]
        key = jnp.where(cols == amin[:, None], big, key)
        return key, (imin, kmin)

    key, (out_idx, out_key) = jax.lax.scan(extract, key, None, length=m)
    dropped = dropped + jnp.sum(key < big)   # valid candidates beyond M
    return out_idx.T, (out_key < big).T, dropped


def pair_forces(pos: jnp.ndarray, vel: jnp.ndarray, table: jnp.ndarray,
                spec: GridSpec, radius, k_contact, origin=None) -> jnp.ndarray:
    """Pairwise sphere penalty contact via the grid: for each particle, sum
    ``k_contact · overlap · n̂`` over neighbors within ``2·radius``
    (the narrow phase of BASELINE configs[2]/[3]); ``pos``/``vel``: [3, N].

    Returns force [3, N]. Scans the 27 cell offsets to bound peak memory at
    ``[N, capacity]`` per offset.
    """
    n = pos.shape[-1]
    if origin is None:
        origin = jnp.asarray(spec.origin, jnp.float32)
    c = jnp.floor((pos - origin[:, None]) / spec.cell_size).astype(jnp.int32)
    dims = jnp.asarray(spec.dims, jnp.int32)
    c = jnp.clip(c, 0, dims[:, None] - 1)
    min_dist = 2.0 * jnp.float32(radius)
    idx_self = jnp.arange(n, dtype=jnp.int32)

    def one_offset(force, off):
        nc = c + off[:, None]
        in_grid = jnp.all((nc >= 0) & (nc < dims[:, None]), axis=0)
        ncid = (nc[0] * spec.dims[1] + nc[1]) * spec.dims[2] + nc[2]
        ncid = jnp.where(in_grid, ncid, 0)
        cand = table[ncid]                                  # [N, cap]
        valid = (cand >= 0) & in_grid[:, None] & (cand != idx_self[:, None])
        cand_safe = jnp.where(valid, cand, 0)
        cpos = pos[:, cand_safe]                            # [3, N, cap]
        d = pos[:, :, None] - cpos
        dist = _safe_norm(jnp.sum(d * d, axis=0))
        touching = valid & (dist < min_dist) & (dist > 1e-6)
        inv = 1.0 / jnp.where(dist > 1e-6, dist, 1.0)
        overlap = min_dist - dist
        f = jnp.where(touching[None], (k_contact * overlap * inv)[None] * d, 0.0)
        return force + jnp.sum(f, axis=2), None

    force0 = jnp.zeros_like(pos)
    force, _ = jax.lax.scan(one_offset, force0, _OFFSETS)
    return force
