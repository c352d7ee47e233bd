"""Slab-DMA granular contact kernel (Pallas / Mosaic TPU).

The XLA frozen-Verlet path (models/granular.py) is gather-bound: every
substep reads ``N × max_neighbors`` data-dependent HBM indices (~6.6 ns
each on v5e), and each rebuild pays ~4 s of window gathers + candidate
compaction at 1M particles. This kernel removes the gathers entirely by
exploiting **sorted-window monotonicity**:

after sorting particles by linearized cell id, each of the 9 (dx, dy)
neighbor-column groups maps particle ``i`` to ONE contiguous sorted-array
range (its z-triple window), and window starts are monotone in ``i`` —
so for a block of ``B`` consecutive sorted particles, each group's
candidates all live in one contiguous slab of ``S ≈ B + margin`` sorted
positions. The kernel DMAs the 9 slabs HBM→VMEM (contiguous, no gather)
and evaluates contacts as dense masked ``[B, S]`` vector math on-chip.

Per rebuild, the host-side XLA work shrinks to the sorted-grid build plus
18 ``cell_start`` gathers (window starts/ends per group) — the expensive
``[N, M]`` candidate compaction of ``broadphase.build_candidates`` is
gone because the kernel consumes window *ranges*, not index lists.

Workload mapping: this extends the reference's free-particle integrator
(/root/reference/simulations/4_instances_imgui/compute_movement.wgsl:36-105
— gravity + wall reflect, no interactions) with particle-particle penalty
contact at BASELINE configs[2] scale, with semantics identical to
models/granular._frozen_substep.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import broadphase

_EPS = 1e-6

_NG = 9          # (dx, dy) neighbor-column groups (broadphase.OFFSETS_XY)
_NGP = 16        # group axis padded to a sublane-friendly width

# Param vector layout (SMEM f32):
# 0:min_dist 1:k_contact 2:gravity 3:dt 4:restitution 5:wall_limit
_NP = 6


def build_windows(grid: broadphase.SortedGrid, spec: broadphase.GridSpec,
                  block: int, slab: int, n_pad: int, thin: bool = False
                  ) -> Tuple[jnp.ndarray, ...]:
    """Per-particle window ranges + per-block slab offsets (XLA, rebuild
    time).

    Default (``thin=False``): for each sorted particle and each (dx, dy)
    group, the z-triple window ``[start, end)`` into the sorted arrays
    (exactly the ranges ``broadphase.pair_forces_sorted`` scans, but kept
    as ranges). Group cells outside the grid get empty windows —
    mirroring the ``okxy`` masking there, which also prevents
    boundary-clamp duplicates.

    ``thin=True``: THREE dx-groups, each one merged contiguous range from
    ``cell_start[lin(x+dx, y-1, z-1)]`` to ``cell_start[lin(x+dx, y+1,
    z+1)+1]`` — a SUPERSET of the nine z-triple windows (it includes the
    z-cells lying between the three y-columns' triples, which the
    distance test rejects). For surface-like distributions (cloth
    self-collision) whole cell-columns hold only ~a handful of particles,
    so the superset costs little and the group count — the dense-math
    multiplier in the kernel — drops 3×. Do NOT use for volumetric
    (granular) fills: there the in-between z-cells hold the bulk of the
    column and the merged window degenerates to ~3 full columns.

    Returns ``(windows [n_pad, 2*NGP] int32, slab_start [nb, 2*NG]
    int32, dropped int32)`` where ``windows[:, g]`` = start of group g,
    ``windows[:, NGP+g]`` = end; ``slab_start[b, 2g]``/``[b, 2g+1]`` are
    the 128-aligned A/B slab offsets of group g and ``dropped`` counts
    window entries outside both slabs (the kernel never sees them —
    nonzero means ``slab`` is undersized for this density).
    """
    n = grid.sorted_cid.shape[0]
    ng, ngp = (3, 4) if thin else (_NG, _NGP)
    d1, d2 = spec.dims[1], spec.dims[2]
    cid = grid.sorted_cid.astype(jnp.int32)
    cx = cid // (d1 * d2)
    rem = cid - cx * (d1 * d2)
    c = jnp.stack([cx, rem // d2, rem - (rem // d2) * d2])
    if thin:
        dims = jnp.asarray(spec.dims, jnp.int32)
        y0 = jnp.maximum(c[1] - 1, 0)
        y1 = jnp.minimum(c[1] + 1, dims[1] - 1)
        z0 = jnp.maximum(c[2] - 1, 0)
        z1 = jnp.minimum(c[2] + 1, dims[2] - 1)
        starts_l, ends_l, oks_l = [], [], []
        for dx in (-1, 0, 1):
            okx = (c[0] + dx >= 0) & (c[0] + dx < dims[0])
            ncx = jnp.clip(c[0] + dx, 0, dims[0] - 1)
            lo = (ncx * d1 + y0) * d2 + z0
            hi = (ncx * d1 + y1) * d2 + z1
            starts_l.append(grid.cell_start[lo])
            ends_l.append(grid.cell_start[hi + 1])
            oks_l.append(okx)
        g_starts = jnp.stack(starts_l, axis=-1)
        g_ends = jnp.stack(ends_l, axis=-1)
        g_ok = jnp.stack(oks_l, axis=-1)
    else:
        g_starts, g_ends, g_ok = broadphase.group_window_ranges(
            c, spec, grid.cell_start)
    # empty windows (group cell off-grid) anchor at the particle's OWN
    # slot, not 0: [i, i) is just as empty but keeps the block's window
    # hull tight, so boundary blocks don't drag slab A to the array head
    # and burn slab B on the real candidates
    slot = jnp.arange(n, dtype=jnp.int32)[:, None]
    starts = jnp.where(g_ok, g_starts, slot)             # [n, ng]
    ends = jnp.where(g_ok, g_ends, slot)
    pad = n_pad - n
    nb = n_pad // block

    # ---- slab offsets + drop telemetry, on BARRIER-ISOLATED copies ----
    # When these reductions share their input buffers/layout with the
    # pallas operands built below, XLA-on-TPU miscompiles them at some
    # shapes (observed at block=256, N >= 1.5M: the last block's emax
    # collapses, slab B is skipped, and its real candidates are silently
    # dropped). The barrier blocks CSE/layout unification so the
    # reduction path compiles against naturally-laid-out arrays; verified
    # bit-exact against NumPy at the failing shapes after this change.
    sr, er = jax.lax.optimization_barrier((starts, ends))
    # pad rows hold the empty window [n, n): keeps the last block's hull
    # at the array tail instead of dragging smin to 0
    sblk = jnp.pad(sr, ((0, pad), (0, 0)),
                   constant_values=n).reshape(nb, block, ng)
    eblk = jnp.pad(er, ((0, pad), (0, 0)),
                   constant_values=n).reshape(nb, block, ng)
    smin = jnp.min(sblk, axis=1)                          # [nb, 9]
    emax = jnp.max(eblk, axis=1)
    # Slab A anchors the head of the block's window hull. When the block
    # straddles an (x, y) cell-column boundary the hull is far wider than
    # one slab — but the windows themselves cluster at its two ENDS (the
    # jump is a discontinuity, not a spread), so slab B anchored at the
    # tail covers the rest. offb == offa signals "B not needed".
    offa = jnp.clip((smin // 128) * 128, 0, n_pad - slab)
    offb_raw = jnp.clip(((emax - slab + 127) // 128) * 128, 0, n_pad - slab)
    need_b = emax > offa + slab
    offb = jnp.where(need_b, offb_raw, offa)
    # telemetry: window entries in the A-B gap or beyond B's end are
    # invisible to the kernel
    offa_e = offa[:, None, :]
    offb_e = offb[:, None, :]
    gap = jnp.maximum(
        jnp.minimum(eblk, offb_e) - jnp.maximum(sblk, offa_e + slab), 0)
    beyond = jnp.maximum(eblk - jnp.maximum(sblk, offb_e + slab), 0)
    # float32 accumulation then saturate: a badly undersized slab at high
    # density can exceed 2^31 entries and an int32 sum would wrap negative
    dropped = jnp.sum(gap + beyond, dtype=jnp.float32)
    dropped = jnp.minimum(dropped, jnp.float32(2**31 - 128)).astype(jnp.int32)

    # ---- kernel operands ----
    # pad rows/columns hold the empty window [n, n) (columns 9..15 are
    # alignment only, never read)
    starts = jnp.pad(starts, ((0, pad), (0, ngp - ng)), constant_values=n)
    ends = jnp.pad(ends, ((0, pad), (0, ngp - ng)), constant_values=n)
    windows = jnp.concatenate([starts, ends], axis=-1)    # [n_pad, 32]
    # [nb_pad8, 18] (a, b interleaved per group): consumed as PER-BLOCK
    # SMEM rows (blocks of 8 — Mosaic's sublane granularity), NOT scalar
    # prefetch — a flat prefetch operand grows with nb and silently
    # corrupts memory past ~512 KB of SMEM (v5e), seen at N=1M with
    # block=128 / N=2M with block=256
    off = jnp.stack([offa, offb], axis=-1).astype(jnp.int32)
    off = off.reshape(off.shape[0], -1)
    pad8 = (-off.shape[0]) % 8
    # +8 extra rows: the pipelined kernel reads row+1 through a 16-row
    # window, which at the last tile runs past nb
    off = jnp.pad(off, ((0, pad8 + 8), (0, 0)))
    return windows, off, dropped


def build_offsets_civ(grid: broadphase.SortedGrid,
                      spec: broadphase.GridSpec, block: int, slab: int,
                      n_pad: int, thin: bool = False,
                      stats: bool = False) -> Tuple[jnp.ndarray, ...]:
    """Rebuild-time companion of CIV mode (:func:`civ_bounds`): per-block
    slab offsets + the cid plane — ``(cidf [n_pad] f32, slab_start
    [rows8, 2*ng] int32, dropped int32)``.

    The expensive part of :func:`build_windows` is 2·ng data-dependent
    ``cell_start`` gathers PER PARTICLE (~6.6 ns/element on v5e however
    small the table — measured irreducible in round 3). CIV needs none:
    the kernel tests cid differences, and slab offsets only need the
    hull of each block's windows, which by monotonicity of
    ``cell_start`` is ``cell_start[cmin + lo_g]`` / ``[cmax + hi_g + 1]``
    — 2·ng gathers per BLOCK. Off-grid borders: the old per-particle
    path anchored empty windows at the particle's slot; here the clip
    just widens the hull toward the array edge for border blocks — the
    group's valid set is empty either way (cid arithmetic admits no
    candidate), so forces are identical and only border blocks scan a
    useless slab.

    ``dropped`` fast mode (``stats=False``): a SOUND indicator — it is
    nonzero whenever real window entries are uncovered (no false
    negatives: any particle's gap entries force the block's max
    window-end past slab A, which is what the count tests). It may
    over-report: an EMPTY window whose anchor lands inside the A–B gap
    fires the count with nothing real dropped (cid-hole slots), and
    per-block aggregates cannot distinguish that from a smaller cid's
    populated window really dropping entries. Treat nonzero as "confirm
    with ``stats=True``", zero as definitive. ``stats=True`` reproduces
    :func:`build_windows`-style exact entry counts (pays the
    per-particle gathers — tests and sizing runs).
    """
    n = grid.sorted_cid.shape[0]
    bounds = civ_bounds(spec, thin)
    ng = len(bounds)
    nb = n_pad // block
    pad = n_pad - n
    ncells = spec.num_cells
    cid = grid.sorted_cid.astype(jnp.int32)
    cs = grid.cell_start
    cid_pad = jnp.concatenate(
        [cid, jnp.broadcast_to(cid[-1:], (pad,))]) if pad else cid
    cblk = cid_pad.reshape(nb, block)
    cmin = jnp.min(cblk, axis=1)
    cmax = jnp.max(cblk, axis=1)
    hs = jnp.stack([cs[jnp.clip(cmin + lo, 0, ncells)]
                    for lo, _ in bounds], axis=-1)            # [nb, ng]
    he = jnp.stack([cs[jnp.clip(cmax + hi + 1, 0, ncells)]
                    for _, hi in bounds], axis=-1)
    he = jnp.maximum(he, hs)
    offa = jnp.clip((hs // 128) * 128, 0, n_pad - slab)
    offb_raw = jnp.clip(((he - slab + 127) // 128) * 128, 0, n_pad - slab)
    need_b = he > offa + slab
    offb = jnp.where(need_b, offb_raw, offa)

    if stats:
        # exact entry counts against THESE offsets (per-particle gathers)
        s = jnp.stack([cs[jnp.clip(cid + lo, 0, ncells)]
                       for lo, _ in bounds], axis=-1)         # [n, ng]
        e = jnp.stack([cs[jnp.clip(cid + hi + 1, 0, ncells)]
                       for _, hi in bounds], axis=-1)
        sblk = jnp.pad(s, ((0, pad), (0, 0)),
                       constant_values=n).reshape(nb, block, ng)
        eblk = jnp.pad(e, ((0, pad), (0, 0)),
                       constant_values=n).reshape(nb, block, ng)
        offa_e = offa[:, None, :]
        offb_e = offb[:, None, :]
        gap = jnp.maximum(
            jnp.minimum(eblk, offb_e) - jnp.maximum(sblk, offa_e + slab), 0)
        beyond = jnp.maximum(eblk - jnp.maximum(sblk, offb_e + slab), 0)
        dropped = jnp.sum(gap + beyond, dtype=jnp.float32)
    else:
        beyond = jnp.maximum(he - (offb + slab), 0)
        gaps = []
        for g, (lo, hi) in enumerate(bounds):
            ob = offb[:, g]
            # s_i < offb  ⟺  cid_i <= cid[offb-1] - lo  (cell_start /
            # sorted-cid duality); the largest such cid has the largest
            # window end among gap-reaching windows
            qb = cid_pad[jnp.clip(ob - 1, 0, n_pad - 1)]
            t = qb - lo
            cstar = jnp.max(jnp.where(cblk <= t[:, None], cblk, -1), axis=1)
            e_star = cs[jnp.clip(cstar + hi + 1, 0, ncells)]
            # SOUND (no false negatives), occasionally over-reporting:
            # real gap entries from ANY block particle imply
            # e_star > offa+slab (window end is monotone in cid and cstar
            # is the largest cid whose window starts below B), so this
            # count is nonzero whenever entries are really dropped. The
            # converse does not hold: when cstar's own window is EMPTY
            # with its anchor inside the gap, the count can fire with
            # nothing real dropped (cid-hole slots). Distinguishing that
            # from the case where a SMALLER cid's populated window drops
            # real entries (same block aggregates, different outcome)
            # requires per-particle window gathers — exactly stats mode.
            # A silent-loss indicator must not false-negative, so fast
            # mode keeps the sound over-approximation; confirm real loss
            # with return_stats=True.
            cnt = jnp.maximum(
                jnp.minimum(e_star, ob) - (offa[:, g] + slab), 0)
            gaps.append(jnp.where(need_b[:, g] & (cstar >= 0), cnt, 0))
        dropped = (jnp.sum(beyond, dtype=jnp.float32)
                   + jnp.sum(jnp.stack(gaps), dtype=jnp.float32))
    dropped = jnp.minimum(dropped, jnp.float32(2**31 - 128)).astype(jnp.int32)

    off = jnp.stack([offa, offb], axis=-1).astype(jnp.int32)
    off = off.reshape(off.shape[0], -1)
    pad8 = (-off.shape[0]) % 8
    off = jnp.pad(off, ((0, pad8 + 8), (0, 0)))
    cidf = jnp.concatenate(
        [cid.astype(jnp.float32),
         jnp.full((pad,), 3e7, jnp.float32)]) if pad else cid.astype(
             jnp.float32)
    return cidf, off, dropped


def _pair_force_phase(min_dist, k_contact, pos3_hbm, posc_blk, win_blk,
                      slab_ref, slabs, facc, sems, *, block, slab,
                      ng=_NG, ngp=_NGP):
    """Shared contact-force phase: slab DMAs + dense masked pair math for
    sorted-block ``b = program_id(0)``.

    All per-particle quantities live as ``[B, 1]`` columns, slab
    candidates as ``[1, S]`` rows; pair math is dense masked ``[B, S]``.
    Per group: slab A always; slab B (DMA + pass, accumulated into the
    ``facc`` scratch) only when the block's window hull overflows A —
    predicated with ``pl.when`` so non-straddling blocks pay nothing.
    ``slab_ref`` is this block's [1, 18] slab-offset row in SMEM (a
    per-block input — never a monolithic scalar-prefetch array, which
    overflows SMEM beyond ~7.3k blocks and corrupts memory silently).

    Returns ``(px, py, pz, fx, fy, fz, selfs)`` — positions, pair-force
    sums, and global sorted slot ids, each ``[block, 1]``.
    """
    b = pl.program_id(0)
    row = jax.lax.rem(b, 8)         # slab_ref holds 8 blocks' offset rows
    dmas = []
    for g in range(ng):
        offa = pl.multiple_of(slab_ref[row, g * 2], 128)
        offb = pl.multiple_of(slab_ref[row, g * 2 + 1], 128)
        # full 4-row slices: Mosaic requires sublane-aligned DMA slices,
        # so the coordinate planes ride in a [4, Np] array (row 3 unused)
        dst_a = slabs.at[g, 0]
        dst_b = slabs.at[g, 1]
        cpa = pltpu.make_async_copy(
            pos3_hbm.at[:, pl.ds(offa, slab)], dst_a, sems.at[g, 0])
        cpa.start()
        cpb = pltpu.make_async_copy(
            pos3_hbm.at[:, pl.ds(offb, slab)], dst_b, sems.at[g, 1])

        @pl.when(offb > offa)
        def _start_b(cpb=cpb):
            cpb.start()

        dmas.append((cpa, cpb))

    px = posc_blk[:, 0:1]
    py = posc_blk[:, 1:2]
    pz = posc_blk[:, 2:3]
    selfs = b * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)

    fx = jnp.zeros((block, 1), jnp.float32)
    fy = jnp.zeros((block, 1), jnp.float32)
    fz = jnp.zeros((block, 1), jnp.float32)
    facc[...] = jnp.zeros((block, 4), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, slab), 1)

    center = ng // 2      # the (0,0) / dx=0 group: the only window that
    # can contain the particle's own slot (other groups are disjoint
    # cell columns), so only it pays the self-exclusion compare

    def pair_sums(qx, qy, qz, jg, s_g, e_g, lo, check_self):
        """Masked penalty-force sums of one slab pass; ``lo`` drops
        candidates below it (B pass: everything A already covered)."""
        valid = (jg >= s_g) & (jg < e_g) & (jg >= lo)
        if check_self:
            valid = valid & (jg != selfs)
        dx = px - qx
        dy = py - qy
        dz = pz - qz
        d2 = dx * dx + dy * dy + dz * dz
        touching = valid & (d2 < min_dist * min_dist) & (d2 > _EPS * _EPS)
        # (min_dist - dist)/dist = min_dist*rsqrt(d2) - 1: one rsqrt
        # replaces sqrt + divide on the VPU hot path
        inv = jax.lax.rsqrt(jnp.where(d2 > _EPS * _EPS, d2, 1.0))
        w = jnp.where(touching, k_contact * (min_dist * inv - 1.0), 0.0)
        return (jnp.sum(w * dx, axis=1, keepdims=True),
                jnp.sum(w * dy, axis=1, keepdims=True),
                jnp.sum(w * dz, axis=1, keepdims=True))

    for g in range(ng):
        cpa, cpb = dmas[g]
        offa = slab_ref[row, g * 2]
        offb = slab_ref[row, g * 2 + 1]
        s_g = win_blk[:, g:g + 1]                        # [B, 1]
        e_g = win_blk[:, ngp + g:ngp + g + 1]
        cpa.wait()
        sx, sy, sz = pair_sums(
            slabs[g, 0, 0:1, :], slabs[g, 0, 1:2, :], slabs[g, 0, 2:3, :],
            lane + offa, s_g, e_g, jnp.int32(0), g == center)
        fx = fx + sx
        fy = fy + sy
        fz = fz + sz

        @pl.when(offb > offa)
        def _pass_b(cpb=cpb, g=g, offa=offa, offb=offb, s_g=s_g, e_g=e_g):
            cpb.wait()
            bx, by, bz = pair_sums(
                slabs[g, 1, 0:1, :], slabs[g, 1, 1:2, :],
                slabs[g, 1, 2:3, :], lane + offb, s_g, e_g, offa + slab,
                g == center)
            facc[:, 0:1] += bx
            facc[:, 1:2] += by
            facc[:, 2:3] += bz

    fx = fx + facc[:, 0:1]
    fy = fy + facc[:, 1:2]
    fz = fz + facc[:, 2:3]
    return px, py, pz, fx, fy, fz, selfs


def _pair_force_phase_pipelined(min_dist, k_contact, pos3_hbm, posc_blk,
                                win_blk, slab_ref, slab_next_ref, slabs,
                                facc, sems, *, block, slab, ng=_NG,
                                ngp=_NGP):
    """Cross-block double-buffered variant of :func:`_pair_force_phase`.

    Round-3 chip measurement: the dense kernel is only ~60% VPU math —
    the rest is slab-DMA issue/wait latency (~1-2 µs per group, poorly
    overlapped with ~1 µs/group of math). Grid iterations on a TPU core
    run sequentially with PERSISTENT scratch, so block ``b`` issues block
    ``b+1``'s slab DMAs into the other half of a double buffer before
    doing its own math; by the time ``b+1`` runs, its slabs are resident.

    Requires: ``slabs`` [2, ng, 2, 4, slab], ``sems`` [2, ng, 2], and the
    slab-offset table passed TWICE — ``slab_ref`` windowed at ``b//8``
    (this block's row) and ``slab_next_ref`` windowed at ``(b+1)//8``
    (so block b+1's row is addressable across the 8-row tile boundary;
    BlockSpec index maps stride in units of the block shape, so one wider
    window cannot overlap).
    """
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    row = jax.lax.rem(b, 8)
    par = jax.lax.rem(b, 2)

    def issue(ref, row_idx, buf):
        for g in range(ng):
            offa = pl.multiple_of(ref[row_idx, g * 2], 128)
            offb = pl.multiple_of(ref[row_idx, g * 2 + 1], 128)
            cpa = pltpu.make_async_copy(
                pos3_hbm.at[:, pl.ds(offa, slab)], slabs.at[buf, g, 0],
                sems.at[buf, g, 0])
            cpa.start()

            @pl.when(offb > offa)
            def _start_b(offb=offb, g=g, buf=buf):
                pltpu.make_async_copy(
                    pos3_hbm.at[:, pl.ds(offb, slab)], slabs.at[buf, g, 1],
                    sems.at[buf, g, 1]).start()

    @pl.when(b == 0)
    def _prime():
        issue(slab_ref, row, par)            # b == 0 -> buffer 0

    @pl.when(b + 1 < nb)
    def _prefetch_next():
        issue(slab_next_ref, jax.lax.rem(b + 1, 8), 1 - par)

    px = posc_blk[:, 0:1]
    py = posc_blk[:, 1:2]
    pz = posc_blk[:, 2:3]
    selfs = b * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    fx = jnp.zeros((block, 1), jnp.float32)
    fy = jnp.zeros((block, 1), jnp.float32)
    fz = jnp.zeros((block, 1), jnp.float32)
    facc[...] = jnp.zeros((block, 4), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, slab), 1)

    center = ng // 2      # only the center group's window can contain
    # the particle's own slot (see _pair_force_phase)

    def pair_sums(qx, qy, qz, jg, s_g, e_g, lo, check_self):
        valid = (jg >= s_g) & (jg < e_g) & (jg >= lo)
        if check_self:
            valid = valid & (jg != selfs)
        dx = px - qx
        dy = py - qy
        dz = pz - qz
        d2 = dx * dx + dy * dy + dz * dz
        touching = valid & (d2 < min_dist * min_dist) & (d2 > _EPS * _EPS)
        inv = jax.lax.rsqrt(jnp.where(d2 > _EPS * _EPS, d2, 1.0))
        w = jnp.where(touching, k_contact * (min_dist * inv - 1.0), 0.0)
        return (jnp.sum(w * dx, axis=1, keepdims=True),
                jnp.sum(w * dy, axis=1, keepdims=True),
                jnp.sum(w * dz, axis=1, keepdims=True))

    for g in range(ng):
        offa = slab_ref[row, g * 2]
        offb = slab_ref[row, g * 2 + 1]
        s_g = win_blk[:, g:g + 1]
        e_g = win_blk[:, ngp + g:ngp + g + 1]
        pltpu.make_async_copy(
            pos3_hbm.at[:, pl.ds(pl.multiple_of(offa, 128), slab)],
            slabs.at[par, g, 0], sems.at[par, g, 0]).wait()
        sx, sy, sz = pair_sums(
            slabs[par, g, 0, 0:1, :], slabs[par, g, 0, 1:2, :],
            slabs[par, g, 0, 2:3, :], lane + offa, s_g, e_g,
            jnp.int32(0), g == center)
        fx = fx + sx
        fy = fy + sy
        fz = fz + sz

        @pl.when(offb > offa)
        def _pass_b(g=g, offa=offa, offb=offb, s_g=s_g, e_g=e_g):
            pltpu.make_async_copy(
                pos3_hbm.at[:, pl.ds(pl.multiple_of(offb, 128), slab)],
                slabs.at[par, g, 1], sems.at[par, g, 1]).wait()
            bx, by, bz = pair_sums(
                slabs[par, g, 1, 0:1, :], slabs[par, g, 1, 1:2, :],
                slabs[par, g, 1, 2:3, :], lane + offb, s_g, e_g,
                offa + slab, g == center)
            facc[:, 0:1] += bx
            facc[:, 1:2] += by
            facc[:, 2:3] += bz

    fx = fx + facc[:, 0:1]
    fy = fy + facc[:, 1:2]
    fz = fz + facc[:, 2:3]
    return px, py, pz, fx, fy, fz, selfs


def civ_bounds(spec: broadphase.GridSpec, thin: bool):
    """Static per-group cid-difference intervals for CIV mode (round 3).

    CIV (cid-interval validity): instead of per-particle window ranges
    gathered from ``cell_start`` at rebuild (the ~6.6 ns/element
    data-dependent-gather cost that dominates the rebuild at scale), the
    kernel carries each particle's linearized cell id and tests the
    DIFFERENCE: candidate j is valid for center i in group g iff
    ``cid_j - cid_i ∈ [lo_g, hi_g]``. With ``cid = (cx·d1 + cy)·d2 + cz``:

    - full mode, group (dx, dy): ``dx·D + dy·d2 ± 1`` (exact z-triple);
    - thin mode, group dx: ``dx·D ± (d2 + 1)`` (the y/z-merged superset).

    These are EXACTLY the slot sets of the window formulation
    (``[cell_start[c_lo], cell_start[c_hi + 1])`` = slots with cid in
    ``[c_lo, c_hi]``), so forces are bitwise identical given the same
    slab offsets. Border behavior: the intervals do not clip at grid
    borders, so they can "wrap" to cells in an adjacent row/column —
    every such wrapped cell differs by ≥ 2 cells along some axis
    (requires ``dims ≥ 3`` on each axis), i.e. ≥ cell_size ≥ the contact
    (+skin) radius away, and the kernel's distance test rejects it. The
    9 full-mode intervals are pairwise disjoint for ``d2 ≥ 3`` — no
    candidate is double-counted. f32 carries cid exactly while
    ``num_cells < 2^24``.
    """
    assert spec.num_cells < 2 ** 24, "cid exceeds f32 exact-integer range"
    assert min(spec.dims) >= 3, "CIV border-wrap safety needs dims >= 3"
    d1, d2 = spec.dims[1], spec.dims[2]
    big = d1 * d2
    if thin:
        return tuple((dx * big - d2 - 1, dx * big + d2 + 1)
                     for dx in (-1, 0, 1))
    return tuple((dx * big + dy * d2 - 1, dx * big + dy * d2 + 1)
                 for dx, dy in broadphase.OFFSETS_XY)


def _pair_force_phase_civ(min_dist, k_contact, pos3_hbm, posc_blk,
                          cidc_blk, slab_ref, slab_next_ref, slabs,
                          facc, sems, *, block, slab, bounds,
                          base=None):
    """CIV variant of :func:`_pair_force_phase_pipelined`: validity is
    ``cid_j - cid_i ∈ bounds[g]`` computed from the cid plane that rides
    in ``pos3_hbm`` row 3 (one fused DMA brings positions + cids), so the
    per-particle window operand and its rebuild-time gathers disappear.
    ``bounds`` are static Python ints from :func:`civ_bounds`.

    The dense pair math stays on the VPU by design: MXU variants
    (recentered-matmul d2 / matmul force-sums) were built and refuted in
    round 3 — slower AND fidelity-broken for the d2 form. See
    docs/kernels.md "Refuted kernel experiments".
    """
    ng = len(bounds)
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    row = jax.lax.rem(b, 8)
    par = jax.lax.rem(b, 2)

    def issue(ref, row_idx, buf):
        for g in range(ng):
            offa = pl.multiple_of(ref[row_idx, g * 2], 128)
            offb = pl.multiple_of(ref[row_idx, g * 2 + 1], 128)
            pltpu.make_async_copy(
                pos3_hbm.at[:, pl.ds(offa, slab)], slabs.at[buf, g, 0],
                sems.at[buf, g, 0]).start()

            @pl.when(offb > offa)
            def _start_b(offb=offb, g=g, buf=buf):
                pltpu.make_async_copy(
                    pos3_hbm.at[:, pl.ds(offb, slab)], slabs.at[buf, g, 1],
                    sems.at[buf, g, 1]).start()

    @pl.when(b == 0)
    def _prime():
        issue(slab_ref, row, par)

    @pl.when(b + 1 < nb)
    def _prefetch_next():
        issue(slab_next_ref, jax.lax.rem(b + 1, 8), 1 - par)

    px = posc_blk[:, 0:1]
    py = posc_blk[:, 1:2]
    pz = posc_blk[:, 2:3]
    pc = cidc_blk[:, 0:1]
    # ``base`` (sharded launches, parallel/granular_mesh.py): the launch
    # covers blocks [base/block, base/block + nb) of the GLOBAL sorted
    # array, so the self index — compared against global slab lanes jg
    # and against n_real — needs the offset.
    selfs = b * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    if base is not None:
        selfs = selfs + base
    fx = jnp.zeros((block, 1), jnp.float32)
    fy = jnp.zeros((block, 1), jnp.float32)
    fz = jnp.zeros((block, 1), jnp.float32)
    facc[...] = jnp.zeros((block, 4), jnp.float32)

    center = ng // 2      # only this group's interval contains dcid == 0

    # The dense pair math materializes ~7 [block, chunk] f32 temporaries
    # in VMEM (dx/dy/dz/d2/valid/inv/w). At the proven default
    # b256/s640 that is ~4.6 MB; big blocks (b512/s1280 = 18 MB) blow
    # the 16 MB scoped-VMEM limit, so the slab is processed in column
    # chunks. chunk == slab (all default configs) is bitwise-identical
    # to the unchunked form; chunk < slab reassociates the per-group
    # force sums (chunk partials added in order) — same contract as
    # changing `slab` itself.
    _CHUNK_BUDGET = 256 * 640
    chunk = slab
    while block * chunk > _CHUNK_BUDGET and chunk % 256 == 0:
        chunk //= 2          # stays a multiple of 128 (lane-aligned)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def _chunk_sums(q, jg, lo_k, hi_k, lo, check_self):
        qc = q[3:4, :]
        dc = qc - pc
        valid = (dc >= lo_k) & (dc <= hi_k)
        if lo is not None:
            valid = valid & (jg >= lo)
        if check_self:
            valid = valid & (jg != selfs)
        dx = px - q[0:1, :]
        dy = py - q[1:2, :]
        dz = pz - q[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz
        touching = valid & (d2 < min_dist * min_dist) & (d2 > _EPS * _EPS)
        inv = jax.lax.rsqrt(jnp.where(d2 > _EPS * _EPS, d2, 1.0))
        w = jnp.where(touching, k_contact * (min_dist * inv - 1.0), 0.0)
        return (jnp.sum(w * dx, axis=1, keepdims=True),
                jnp.sum(w * dy, axis=1, keepdims=True),
                jnp.sum(w * dz, axis=1, keepdims=True))

    def pair_sums(qslab, off, lo_k, hi_k, lo, check_self):
        sx, sy, sz = _chunk_sums(qslab[:, 0:chunk], lane + off, lo_k, hi_k,
                                 lo, check_self)
        for c0 in range(chunk, slab, chunk):
            cx_, cy_, cz_ = _chunk_sums(qslab[:, c0:c0 + chunk],
                                        lane + (off + c0), lo_k, hi_k,
                                        lo, check_self)
            sx = sx + cx_
            sy = sy + cy_
            sz = sz + cz_
        return sx, sy, sz

    for g in range(ng):
        lo_k = jnp.float32(bounds[g][0])
        hi_k = jnp.float32(bounds[g][1])
        offa = slab_ref[row, g * 2]
        offb = slab_ref[row, g * 2 + 1]
        pltpu.make_async_copy(
            pos3_hbm.at[:, pl.ds(pl.multiple_of(offa, 128), slab)],
            slabs.at[par, g, 0], sems.at[par, g, 0]).wait()
        sx, sy, sz = pair_sums(
            slabs[par, g, 0], offa, lo_k, hi_k, None, g == center)
        fx = fx + sx
        fy = fy + sy
        fz = fz + sz

        @pl.when(offb > offa)
        def _pass_b(g=g, offa=offa, offb=offb, lo_k=lo_k, hi_k=hi_k):
            pltpu.make_async_copy(
                pos3_hbm.at[:, pl.ds(pl.multiple_of(offb, 128), slab)],
                slabs.at[par, g, 1], sems.at[par, g, 1]).wait()
            bx, by, bz = pair_sums(
                slabs[par, g, 1], offb, lo_k, hi_k, offa + slab,
                g == center)
            facc[:, 0:1] += bx
            facc[:, 1:2] += by
            facc[:, 2:3] += bz

    fx = fx + facc[:, 0:1]
    fy = fy + facc[:, 1:2]
    fz = fz + facc[:, 2:3]
    return px, py, pz, fx, fy, fz, selfs


def _kernel(params_ref, pos3_hbm, posc_blk, velc_blk, win_blk, slab_ref,
            *rest, block, slab, n_real, pipelined=False, civ=None):
    """One granular substep for sorted-block ``b = program_id(0)``:
    the shared pair-force phase, then gravity -> Euler -> wall clamp &
    reflect — op order matching models/granular._frozen_substep exactly.

    ``civ``: static per-group cid-difference bounds (:func:`civ_bounds`);
    when set, ``win_blk`` is the [block, 1] f32 cid column instead of
    window ranges and the CIV pair phase runs (always cross-block
    pipelined).
    """
    slab_next_ref = None
    if pipelined or civ:
        slab_next_ref, posc_out, velc_out, slabs, facc, sems = rest
    else:
        posc_out, velc_out, slabs, facc, sems = rest
    min_dist = params_ref[0]
    k_contact = params_ref[1]
    gravity = params_ref[2]
    dt = params_ref[3]
    restitution = params_ref[4]
    limit = params_ref[5]

    if civ:
        # a 7th params element (sharded launches) is the launch's global
        # first-particle index; f32 carries it exactly below 2**24
        base = (jnp.int32(params_ref[6])
                if params_ref.shape[0] > 6 else None)
        px, py, pz, fx, fy, fz, selfs = _pair_force_phase_civ(
            min_dist, k_contact, pos3_hbm, posc_blk, win_blk, slab_ref,
            slab_next_ref, slabs, facc, sems, block=block, slab=slab,
            bounds=civ, base=base)
    elif pipelined:
        px, py, pz, fx, fy, fz, selfs = _pair_force_phase_pipelined(
            min_dist, k_contact, pos3_hbm, posc_blk, win_blk, slab_ref,
            slab_next_ref, slabs, facc, sems, block=block, slab=slab)
    else:
        px, py, pz, fx, fy, fz, selfs = _pair_force_phase(
            min_dist, k_contact, pos3_hbm, posc_blk, win_blk, slab_ref,
            slabs, facc, sems, block=block, slab=slab)
    alive = selfs < n_real
    fy = fy + gravity                                    # unit mass

    vx = velc_blk[:, 0:1] + fx * dt
    vy = velc_blk[:, 1:2] + fy * dt
    vz = velc_blk[:, 2:3] + fz * dt
    nx = px + vx * dt
    ny = py + vy * dt
    nz = pz + vz * dt

    def wall(p, v):
        hit = ((p < -limit) & (v < 0.0)) | ((p > limit) & (v > 0.0))
        return jnp.clip(p, -limit, limit), jnp.where(hit, -restitution * v, v)

    nx, vx = wall(nx, vx)
    ny, vy = wall(ny, vy)
    nz, vz = wall(nz, vz)

    posc_out[:, 0:1] = jnp.where(alive, nx, px)
    posc_out[:, 1:2] = jnp.where(alive, ny, py)
    posc_out[:, 2:3] = jnp.where(alive, nz, pz)
    velc_out[:, 0:1] = jnp.where(alive, vx, velc_blk[:, 0:1])
    velc_out[:, 1:2] = jnp.where(alive, vy, velc_blk[:, 1:2])
    velc_out[:, 2:3] = jnp.where(alive, vz, velc_blk[:, 2:3])


def _forces_kernel(params_ref, pos3_hbm, posc_blk, win_blk, slab_ref,
                   *rest, block, slab, n_real, ng=_NG, ngp=_NGP,
                   pipelined=False, civ=None):
    """Force-only variant: write the pair contact-force sums and stop —
    the caller owns integration (cloth self-collision folds these into
    its spring-force accumulation, models/cloth.self_collision_forces)."""
    slab_next_ref = None
    if pipelined or civ:
        slab_next_ref, f_out, slabs, facc, sems = rest
    else:
        f_out, slabs, facc, sems = rest
    if civ:
        _, _, _, fx, fy, fz, selfs = _pair_force_phase_civ(
            params_ref[0], params_ref[1], pos3_hbm, posc_blk, win_blk,
            slab_ref, slab_next_ref, slabs, facc, sems, block=block,
            slab=slab, bounds=civ)
    elif pipelined:
        _, _, _, fx, fy, fz, selfs = _pair_force_phase_pipelined(
            params_ref[0], params_ref[1], pos3_hbm, posc_blk, win_blk,
            slab_ref, slab_next_ref, slabs, facc, sems, block=block,
            slab=slab, ng=ng, ngp=ngp)
    else:
        _, _, _, fx, fy, fz, selfs = _pair_force_phase(
            params_ref[0], params_ref[1], pos3_hbm, posc_blk, win_blk,
            slab_ref, slabs, facc, sems, block=block, slab=slab, ng=ng,
            ngp=ngp)
    alive = selfs < n_real
    f_out[:, 0:1] = jnp.where(alive, fx, 0.0)
    f_out[:, 1:2] = jnp.where(alive, fy, 0.0)
    f_out[:, 2:3] = jnp.where(alive, fz, 0.0)


def _check_block_slab(block: int, slab: int) -> None:
    """Fail fast on launch-geometry values Mosaic rejects deep in
    lowering: slab DMA slices are ``[4, slab]`` windows of the tiled
    pos3 plane, so ``slab`` must be lane-aligned (multiple of 128), and
    per-block operand tiles ``[block, ...]`` need sublane-aligned
    ``block`` (multiple of 8). A mis-sized slab (e.g. 960) otherwise
    surfaces as an opaque remote-compile ``tpu.memref_slice`` error."""
    if slab % 128 != 0:
        raise ValueError(f"slab must be a multiple of 128 (got {slab}): "
                         "slab DMA windows slice the lane dimension")
    if block % 8 != 0:
        raise ValueError(f"block must be a multiple of 8 (got {block})")


def contact_forces_sorted(pos3: jnp.ndarray, posc: jnp.ndarray,
                          windows: jnp.ndarray, slab_start: jnp.ndarray,
                          min_dist, k_contact, *, block: int, slab: int,
                          n_real: int, interpret: bool,
                          thin: bool = False, pipelined: bool = False,
                          civ=None) -> jnp.ndarray:
    """Pairwise penalty contact forces on padded SORTED positions.

    Same slab-DMA machinery as :func:`substep_sorted` but returns forces
    ``[n_pad, 3]`` (zero on pad rows) instead of integrating — the
    narrow-phase for cloth self-collision (BASELINE configs[3]), whose
    integration lives in the cloth step.

    ``civ``: static bounds from :func:`civ_bounds` — ``windows`` is then
    the [n_pad, 1] f32 cid column and ``pos3`` must carry cids in row 3
    (``build_offsets_civ`` returns both); always cross-block pipelined.
    """
    _check_block_slab(block, slab)
    n_pad = posc.shape[0]
    nb = n_pad // block
    ng, ngp = (3, 4) if thin else (_NG, _NGP)
    if civ:
        pipelined = False
    pvec = jnp.stack([jnp.asarray(min_dist, jnp.float32),
                      jnp.asarray(k_contact, jnp.float32)])
    kernel = functools.partial(_forces_kernel, block=block, slab=slab,
                               n_real=n_real, ng=ng, ngp=ngp,
                               pipelined=pipelined, civ=civ)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),        # params
        pl.BlockSpec(memory_space=pl.ANY),            # pos3 (DMA src)
        pl.BlockSpec((block, 3), lambda b: (b, 0)),
        pl.BlockSpec((block, 1) if civ else (block, 2 * ngp),
                     lambda b: (b, 0)),
        pl.BlockSpec((8, 2 * ng), lambda b: (b // 8, 0),
                     memory_space=pltpu.SMEM),
    ]
    operands = [pvec, pos3, posc, windows, slab_start]
    if pipelined or civ:
        # the SAME offset table again, windowed one block ahead: block
        # b's prefetch of block b+1's slabs reads row (b+1)%8 here
        in_specs.append(pl.BlockSpec((8, 2 * ng),
                                     lambda b: ((b + 1) // 8, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(slab_start)
        slab_scratch = pltpu.VMEM((2, ng, 2, 4, slab), jnp.float32)
    else:
        slab_scratch = pltpu.VMEM((ng, 2, 4, slab), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, 3), lambda b: (b, 0)),
        scratch_shapes=[
            slab_scratch,
            pltpu.VMEM((block, 4), jnp.float32),
            pltpu.SemaphoreType.DMA((2, ng, 2) if (pipelined or civ)
                                    else (ng, 2)),
        ],
        out_shape=jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*operands)


def _pair_jvp_phase_civ(min_dist, k_contact, pos8_hbm, pu_blk, cidc_blk,
                        slab_ref, slab_next_ref, slabs, facc, sems, *,
                        block, slab, bounds, base=None):
    """CIV pair phase computing the contact force AND its directional
    derivative (f(p), J·u) for a tangent field ``u`` that rides the slab
    DMA next to the positions (rows 3-5 of ``pos8_hbm``).

    Purpose (ops/cloth_pallas_grad.py is the cloth analog): reverse-mode
    through :func:`substep_sorted` needs ``Jᵀ·f̄`` where ``J = ∂f/∂pos``.
    The penalty contact force is conservative — ``f = -∇U`` for the pair
    potential ``U = Σ φ(|p_i - p_j|)`` — so ``J`` is symmetric wherever
    the branch structure is locally constant and ``Jᵀ f̄ = J f̄``: the
    TRANSPOSE is a forward directional derivative, which has exactly the
    slab structure of the primal force pass (candidate symmetry:
    ``j ∈ cand(i) ⟺ i ∈ cand(j)`` for the ±symmetric CIV intervals; a
    dropped slab entry breaks the pairing, so gradient runs require the
    dropped telemetry to be zero). The pair tangent math is not
    hand-derived: ``jax.jvp`` differentiates the same masked expressions
    the primal phase evaluates, inside the kernel body at trace time.

    Layout mirrors :func:`_pair_force_phase_civ` with an 8-row DMA plane
    (x, y, z, ux, uy, uz, cid, pad) and a [block, 8] accumulator
    (f + J·u for the B pass). Returns ``(fx, fy, fz, tx, ty, tz, selfs)``.
    """
    ng = len(bounds)
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    row = jax.lax.rem(b, 8)
    par = jax.lax.rem(b, 2)

    def issue(ref, row_idx, buf):
        for g in range(ng):
            offa = pl.multiple_of(ref[row_idx, g * 2], 128)
            offb = pl.multiple_of(ref[row_idx, g * 2 + 1], 128)
            pltpu.make_async_copy(
                pos8_hbm.at[:, pl.ds(offa, slab)], slabs.at[buf, g, 0],
                sems.at[buf, g, 0]).start()

            @pl.when(offb > offa)
            def _start_b(offb=offb, g=g, buf=buf):
                pltpu.make_async_copy(
                    pos8_hbm.at[:, pl.ds(offb, slab)], slabs.at[buf, g, 1],
                    sems.at[buf, g, 1]).start()

    @pl.when(b == 0)
    def _prime():
        issue(slab_ref, row, par)

    @pl.when(b + 1 < nb)
    def _prefetch_next():
        issue(slab_next_ref, jax.lax.rem(b + 1, 8), 1 - par)

    px = pu_blk[:, 0:1]
    py = pu_blk[:, 1:2]
    pz = pu_blk[:, 2:3]
    ux = pu_blk[:, 3:4]
    uy = pu_blk[:, 4:5]
    uz = pu_blk[:, 5:6]
    pc = cidc_blk[:, 0:1]
    selfs = b * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    if base is not None:
        selfs = selfs + base
    zero = jnp.zeros((block, 1), jnp.float32)
    fx = fy = fz = tx = ty = tz = zero
    facc[...] = jnp.zeros((block, 8), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, slab), 1)
    center = ng // 2

    def pair_sums(qslab, jg, lo_k, hi_k, lo, check_self):
        qc = qslab[6:7, :]
        dc = qc - pc
        valid = (dc >= lo_k) & (dc <= hi_k)
        if lo is not None:
            valid = valid & (jg >= lo)
        if check_self:
            valid = valid & (jg != selfs)

        def force(args):
            # the EXACT primal pair expressions of _pair_force_phase_civ;
            # jvp treats the comparisons (and `valid`) as constants — the
            # a.e. derivative, same contract as the cloth grad kernel
            px_, py_, pz_, qx_, qy_, qz_ = args
            dx = px_ - qx_
            dy = py_ - qy_
            dz = pz_ - qz_
            d2 = dx * dx + dy * dy + dz * dz
            touching = valid & (d2 < min_dist * min_dist) & (d2 > _EPS * _EPS)
            inv = jax.lax.rsqrt(jnp.where(d2 > _EPS * _EPS, d2, 1.0))
            w = jnp.where(touching, k_contact * (min_dist * inv - 1.0), 0.0)
            return (jnp.sum(w * dx, axis=1, keepdims=True),
                    jnp.sum(w * dy, axis=1, keepdims=True),
                    jnp.sum(w * dz, axis=1, keepdims=True))

        primals = (px, py, pz, qslab[0:1, :], qslab[1:2, :], qslab[2:3, :])
        tangents = (ux, uy, uz, qslab[3:4, :], qslab[4:5, :], qslab[5:6, :])
        return jax.jvp(force, (primals,), (tangents,))

    for g in range(ng):
        lo_k = jnp.float32(bounds[g][0])
        hi_k = jnp.float32(bounds[g][1])
        offa = slab_ref[row, g * 2]
        offb = slab_ref[row, g * 2 + 1]
        pltpu.make_async_copy(
            pos8_hbm.at[:, pl.ds(pl.multiple_of(offa, 128), slab)],
            slabs.at[par, g, 0], sems.at[par, g, 0]).wait()
        (sx, sy, sz), (jx, jy, jz) = pair_sums(
            slabs[par, g, 0], lane + offa, lo_k, hi_k, None, g == center)
        fx = fx + sx
        fy = fy + sy
        fz = fz + sz
        tx = tx + jx
        ty = ty + jy
        tz = tz + jz

        @pl.when(offb > offa)
        def _pass_b(g=g, offa=offa, offb=offb, lo_k=lo_k, hi_k=hi_k):
            pltpu.make_async_copy(
                pos8_hbm.at[:, pl.ds(pl.multiple_of(offb, 128), slab)],
                slabs.at[par, g, 1], sems.at[par, g, 1]).wait()
            (bx, by, bz), (cx, cy, cz) = pair_sums(
                slabs[par, g, 1], lane + offb, lo_k, hi_k, offa + slab,
                g == center)
            facc[:, 0:1] += bx
            facc[:, 1:2] += by
            facc[:, 2:3] += bz
            facc[:, 3:4] += cx
            facc[:, 4:5] += cy
            facc[:, 5:6] += cz

    fx = fx + facc[:, 0:1]
    fy = fy + facc[:, 1:2]
    fz = fz + facc[:, 2:3]
    tx = tx + facc[:, 3:4]
    ty = ty + facc[:, 4:5]
    tz = tz + facc[:, 5:6]
    return fx, fy, fz, tx, ty, tz, selfs


def _jvp_kernel(params_ref, pos8_hbm, pu_blk, win_blk, slab_ref,
                slab_next_ref, ft_out, slabs, facc, sems, *, block, slab,
                n_real, civ):
    """Force + directional-derivative kernel: ``ft_out[:, 0:3] = f``,
    ``ft_out[:, 3:6] = J·u`` (zero on pad rows)."""
    fx, fy, fz, tx, ty, tz, selfs = _pair_jvp_phase_civ(
        params_ref[0], params_ref[1], pos8_hbm, pu_blk, win_blk,
        slab_ref, slab_next_ref, slabs, facc, sems, block=block,
        slab=slab, bounds=civ)
    alive = selfs < n_real
    ft_out[:, 0:1] = jnp.where(alive, fx, 0.0)
    ft_out[:, 1:2] = jnp.where(alive, fy, 0.0)
    ft_out[:, 2:3] = jnp.where(alive, fz, 0.0)
    ft_out[:, 3:4] = jnp.where(alive, tx, 0.0)
    ft_out[:, 4:5] = jnp.where(alive, ty, 0.0)
    ft_out[:, 5:6] = jnp.where(alive, tz, 0.0)


def contact_force_jvp_sorted(pos8: jnp.ndarray, pu: jnp.ndarray,
                             cidc: jnp.ndarray, slab_start: jnp.ndarray,
                             min_dist, k_contact, *, block: int, slab: int,
                             n_real: int, interpret: bool, civ
                             ) -> jnp.ndarray:
    """Contact forces and their directional derivative on padded SORTED
    state: returns ``[n_pad, 6]`` = ``(f(pos), J·u)`` for tangents ``u``.

    ``pos8`` [8, Np]: x, y, z, ux, uy, uz, cid, pad (one fused slab DMA
    per candidate range brings positions + tangents + cids). ``pu``
    [Np, 6]: the same positions + tangents as per-particle columns.
    CIV mode only (``civ`` from :func:`civ_bounds`, thin or full).

    The reverse-mode use (models/granular.multi_step_diff): the pair
    force field is the negative gradient of a pair potential, so its
    Jacobian is symmetric and ``Jᵀ f̄`` — the term the substep transpose
    needs — is this kernel applied with ``u = f̄``. Requires zero dropped
    slab entries (asymmetric drops break the pairing; check the rebuild
    telemetry).
    """
    n_pad = pu.shape[0]
    nb = n_pad // block
    ng = len(civ)
    pvec = jnp.stack([jnp.asarray(min_dist, jnp.float32),
                      jnp.asarray(k_contact, jnp.float32)])
    kernel = functools.partial(_jvp_kernel, block=block, slab=slab,
                               n_real=n_real, civ=civ)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),        # params
        pl.BlockSpec(memory_space=pl.ANY),            # pos8 (DMA src)
        pl.BlockSpec((block, 6), lambda b: (b, 0)),
        pl.BlockSpec((block, 1), lambda b: (b, 0)),
        pl.BlockSpec((8, 2 * ng), lambda b: (b // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((8, 2 * ng), lambda b: ((b + 1) // 8, 0),
                     memory_space=pltpu.SMEM),        # prefetch row
    ]
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, 6), lambda b: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ng, 2, 8, slab), jnp.float32),
            pltpu.VMEM((block, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((2, ng, 2)),
        ],
        out_shape=jax.ShapeDtypeStruct((n_pad, 6), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pvec, pos8, pu, cidc, slab_start, slab_start)


def substep_sorted(pos3: jnp.ndarray, posc: jnp.ndarray, velc: jnp.ndarray,
                   windows: jnp.ndarray, slab_start: jnp.ndarray,
                   params_vec: jnp.ndarray, *, block: int, slab: int,
                   n_real: int, interpret: bool,
                   pipelined: bool = False, civ=None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One substep on padded SORTED state. ``pos3`` [4, Np] (DMA slab
    source; rows x/y/z + one dead alignment row), ``posc``/``velc``
    [Np, 3] (per-particle columns), ``windows`` [Np, 2*_NGP] int32,
    ``slab_start`` [Np//block, 2*_NG] int32 (per-block SMEM rows).
    Returns new ``(posc, velc)``; the caller re-derives pos3.

    ``civ``: static bounds from :func:`civ_bounds` — ``windows`` is then
    the [n_pad, 1] f32 cid column and ``pos3`` row 3 carries cids
    (``build_offsets_civ`` returns both); always cross-block pipelined.
    """
    _check_block_slab(block, slab)
    n_pad = posc.shape[0]
    nb = n_pad // block
    if civ:
        pipelined = False
    ngd = len(civ) if civ else _NG
    kernel = functools.partial(_kernel, block=block, slab=slab,
                               n_real=n_real, pipelined=pipelined,
                               civ=civ)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),        # params
        pl.BlockSpec(memory_space=pl.ANY),            # pos3 (DMA src)
        pl.BlockSpec((block, 3), lambda b: (b, 0)),
        pl.BlockSpec((block, 3), lambda b: (b, 0)),
        pl.BlockSpec((block, 1) if civ else (block, 2 * _NGP),
                     lambda b: (b, 0)),
        # slab offsets: an [8, 18] SMEM tile per 8 blocks — bounded
        # SMEM at any N (a flat scalar-prefetch array overflows
        # ~512 KB of SMEM past ~7.3k blocks and corrupts memory
        # without error)
        pl.BlockSpec((8, 2 * ngd), lambda b: (b // 8, 0),
                     memory_space=pltpu.SMEM),
    ]
    operands = [params_vec, pos3, posc, velc, windows, slab_start]
    if pipelined or civ:
        in_specs.append(pl.BlockSpec((8, 2 * ngd),
                                     lambda b: ((b + 1) // 8, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(slab_start)
        slab_scratch = pltpu.VMEM((2, ngd, 2, 4, slab), jnp.float32)
    else:
        slab_scratch = pltpu.VMEM((_NG, 2, 4, slab), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block, 3), lambda b: (b, 0)),
            pl.BlockSpec((block, 3), lambda b: (b, 0)),
        ),
        scratch_shapes=[
            slab_scratch,
            pltpu.VMEM((block, 4), jnp.float32),
            pltpu.SemaphoreType.DMA((2, ngd, 2) if (pipelined or civ)
                                    else (_NG, 2)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*operands)
