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


VIEW_W = 128     # lanes per sub-block view (kernel v3); one vreg width


def build_windows(grid: broadphase.SortedGrid, spec: broadphase.GridSpec,
                  block: int, slab: int, n_pad: int, thin: bool = False,
                  sub_block: int = 0, merge: bool = False
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

    ``merge=True`` (round-3 merged-slab mode): each dx-triple of window
    ranges shares ONE A/B slab pair — ``slab_start`` shrinks to
    ``[nb, 2*(NG//3)]`` and the kernel does NG//3 slab DMAs per block
    instead of NG (window ranges and their per-range masks are
    unchanged). The chip measurement behind it: at 256 blocks the dense
    kernel is DMA-issue/wait-bound, not VPU-bound — halving the slab
    saved ~1% while merging triples cuts the per-block scalar-core DMA
    work 3×. The price is a wider shared slab (it must span the triple's
    hull: ~the population of one x-slice for thin/cloth, ~one x-slice of
    a y-window for full/granular) — size ``slab`` accordingly and watch
    ``dropped``.
    """
    n = grid.sorted_cid.shape[0]
    ng, ngp = (3, 4) if thin else (_NG, _NGP)
    d1, d2 = spec.dims[1], spec.dims[2]
    cid = grid.sorted_cid.astype(jnp.int32)
    cx = cid // (d1 * d2)
    rem = cid - cx * (d1 * d2)
    c = jnp.stack([cx, rem // d2, rem - (rem // d2) * d2])
    if merge:
        # Z-FREE column windows (merged mode only): each range spans the
        # WHOLE z-extent of its cell column(s) instead of the z-triple.
        # The superset is exact: a candidate whose z-cell differs by >= 2
        # is >= cell_size >= min_dist (+ skin) away and the kernel's
        # distance test rejects it — the same argument that already
        # admits the in-between y-cells of thin mode. The hull each
        # merged slab must cover is IDENTICAL (the dx-triple's merged
        # range already spans those z-cells), so this costs no slab
        # width and no extra VPU time (dense math pays the full slab
        # either way). What it buys is the rebuild: window queries
        # become gathers from the [dims0*dims1 + 1] column-start table
        # below (cache-resident) instead of the multi-MB cell_start —
        # at 256² cloth that one change removes ~3 ms of the ~5 ms
        # rebuild (round-3 chip probe), and at 1M granular it turns 18M
        # slow gathers into cache-rate ones.
        dims = jnp.asarray(spec.dims, jnp.int32)
        ncols = spec.dims[0] * d1
        cs2 = jax.lax.slice(grid.cell_start, (0,), (ncols * d2 + 1,),
                            (d2,))                        # [ncols + 1]
        starts_l, ends_l, oks_l = [], [], []
        if thin:
            y0 = jnp.maximum(c[1] - 1, 0)
            y1 = jnp.minimum(c[1] + 1, dims[1] - 1)
            for dx in (-1, 0, 1):
                okx = (c[0] + dx >= 0) & (c[0] + dx < dims[0])
                ncx = jnp.clip(c[0] + dx, 0, dims[0] - 1)
                starts_l.append(cs2[ncx * d1 + y0])
                ends_l.append(cs2[ncx * d1 + y1 + 1])
                oks_l.append(okx)
        else:
            for dx, dy in broadphase.OFFSETS_XY:
                ok = ((c[0] + dx >= 0) & (c[0] + dx < dims[0]) &
                      (c[1] + dy >= 0) & (c[1] + dy < dims[1]))
                col = (jnp.clip(c[0] + dx, 0, dims[0] - 1) * d1
                       + jnp.clip(c[1] + dy, 0, dims[1] - 1))
                starts_l.append(cs2[col])
                ends_l.append(cs2[col + 1])
                oks_l.append(ok)
        g_starts = jnp.stack(starts_l, axis=-1)
        g_ends = jnp.stack(ends_l, axis=-1)
        g_ok = jnp.stack(oks_l, axis=-1)
    elif thin:
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
    if merge:
        assert ng % 3 == 0 and not sub_block
        ngd = ng // 3
        smin = jnp.min(sblk.reshape(nb, block, ngd, 3), axis=(1, 3))
        emax = jnp.max(eblk.reshape(nb, block, ngd, 3), axis=(1, 3))
    else:
        smin = jnp.min(sblk, axis=1)                      # [nb, 9]
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
    if merge:
        offa_e = jnp.repeat(offa, 3, axis=-1)[:, None, :]
        offb_e = jnp.repeat(offb, 3, axis=-1)[:, None, :]
    else:
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

    if sub_block:
        # ---- per-sub-block views (round-3 kernel v3) ----
        # The dense [block, slab] pair math wastes most lanes: slab must
        # cover the whole BLOCK's window hull plus 128-alignment slack,
        # while one SUB-block of ``sub_block`` sorted particles has a hull
        # of only ~sub_block + window width. Each (group, sub) therefore
        # gets a VIEW_W-lane view positioned at its own hull (8-lane
        # granularity — the kernel realizes it with static-roll chains,
        # since Mosaic has no dynamic lane slice), and the kernel's math
        # shrinks from [block, slab] to nsub × [sub_block, VIEW_W] per
        # group. Views live inside the A|B concat scratch; the encoded
        # shift is the view's lane offset there, base its global slot.
        nsub = block // sub_block
        sb = sblk.reshape(nb, nsub, sub_block, ng)
        eb = eblk.reshape(nb, nsub, sub_block, ng)
        smin_s = jnp.min(sb, axis=2)                     # [nb, nsub, ng]
        emax_s = jnp.max(eb, axis=2)
        vs = (smin_s // 8) * 8
        offa_s = offa[:, None, :]
        offb_s = offb[:, None, :]
        in_a = (vs >= offa_s) & (vs + VIEW_W <= offa_s + slab)
        in_b = (vs >= offb_s) & (vs + VIEW_W <= offb_s + slab)
        vs_a = jnp.clip(vs, offa_s, offa_s + slab - VIEW_W)
        vs = jnp.where(in_a, vs, jnp.where(in_b, vs, vs_a))
        shift = jnp.where(in_a | ~in_b, vs - offa_s, slab + vs - offb_s)
        # drops vs the actual view coverage [vs, vs + VIEW_W)
        vs_e = vs[:, :, None, :]
        covered = jnp.maximum(
            jnp.minimum(eb, vs_e + VIEW_W) - jnp.maximum(sb, vs_e), 0)
        dropped_v = jnp.sum((eb - sb) - covered, dtype=jnp.float32)
        dropped = jnp.minimum(dropped_v,
                              jnp.float32(2**31 - 128)).astype(jnp.int32)
        views = jnp.stack([shift, vs], axis=-1)          # [nb, nsub, ng, 2]
        # kernel reads column (g * nsub + t) * 2 — group-major layout
        views = views.transpose(0, 2, 1, 3).reshape(nb, -1).astype(jnp.int32)
        views = jnp.pad(views, ((0, (-nb) % 8), (0, 0)))
        return windows, off, views, dropped
    return windows, off, dropped


def build_offsets_civ(grid: broadphase.SortedGrid,
                      spec: broadphase.GridSpec, block: int, slab: int,
                      n_pad: int, thin: bool = False,
                      stats: bool = False, rpb: int = 1,
                      wide: int = None) -> Tuple[jnp.ndarray, ...]:
    """Rebuild-time companion of CIV mode (:func:`civ_bounds`): per-block
    slab offsets + the cid plane — ``(cidf [n_pad] f32, slab_start
    [rows8, 2*ng] int32, dropped int32)``.

    ``rpb > 1`` (rows-blocks per program, round 3): adds a per-PROGRAM
    wide-slab table for the multi-block kernel mode, where one kernel
    program covers ``rpb`` consecutive sorted blocks with a single wide
    [4, wide] A-slab DMA per group (and one gated wide B) instead of
    per-block slabs — the slab-probe decomposition (tools/probes/
    probe_sc4.py) showed ~70% of the contact kernel is per-block FIXED
    cost (DMA issues + program overhead), which this divides by ``rpb``
    while the dense [block, slab] pair math is unchanged. Window starts
    are monotone in sorted order, so ``rpb`` consecutive blocks' A
    windows fit in ``wide = slab + rpb*block`` lanes in the common case;
    when a program's hull outruns ``wide`` the per-block effective
    offsets clip to the covered range and the uncovered entries are
    COUNTED in ``dropped`` (same contract as slab-A overflow today).
    Returns a 4-tuple ``(cidf, slab_start, wide_start, dropped)`` where
    ``slab_start`` holds per-block (aeff, beff) pairs — the effective,
    coverage-clipped starts (== (offa, offb) whenever nothing clips,
    making rpb mode bitwise-equal to rpb=1) — and ``wide_start``
    [programs8, 2*ng] holds (woffa, woffb) wide-slab starts with
    ``woffb < 0`` meaning no block in the program needs a B pass.

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

    woff = None
    if rpb > 1:
        if block % 128:
            raise ValueError("rpb mode needs block % 128 == 0 "
                             "(wide-slab starts must stay lane-aligned)")
        if rpb < 8 and 8 % rpb or rpb >= 8 and rpb % 8:
            raise ValueError(f"rpb must divide 8 or be a multiple of 8 "
                             f"(got {rpb}): the SMEM offset table is read "
                             "through 8-row blockspec windows")
        if nb % rpb:
            raise ValueError(f"n_pad/block = {nb} blocks must be a "
                             f"multiple of rpb = {rpb}")
        w = wide if wide is not None else slab + rpb * block
        if w % 128 or w > n_pad:
            raise ValueError(f"wide = {w} must be a multiple of 128 and "
                             f"<= n_pad = {n_pad}")
        npg = nb // rpb
        offa3 = offa.reshape(npg, rpb, ng)
        he3 = he.reshape(npg, rpb, ng)
        offb_raw3 = offb_raw.reshape(npg, rpb, ng)
        # wide A covers [woffa, woffa + w]; per-block A start clips into
        # the covered range (aeff == offa whenever nothing clips)
        woffa = jnp.clip(offa3[:, 0, :], 0, n_pad - w)         # [npg, ng]
        aeff = jnp.minimum(offa3, woffa[:, None, :] + (w - slab))
        need_b3 = he3 > aeff + slab
        big = jnp.int32(2 ** 30)
        woffb = jnp.min(jnp.where(need_b3, offb_raw3, big), axis=1)
        bany = jnp.any(need_b3, axis=1)
        woffb = jnp.clip(woffb, 0, n_pad - w)
        # beff == aeff means "no B applied for this block" (kernel gate
        # beff > aeff); a B start that the wide coverage forces at or
        # below aeff cannot add lanes beyond A, so it gates off and its
        # tail counts as `beyond` — keeps the in-kernel extract shift
        # (beff - woffb) inside [0, w - slab]
        beff_raw = jnp.minimum(offb_raw3, woffb[:, None, :] + (w - slab))
        beff = jnp.where(need_b3 & (beff_raw > aeff), beff_raw, aeff)
        woffb = jnp.where(bany, woffb, -big)
        offa = aeff.reshape(nb, ng)
        offb = beff.reshape(nb, ng)
        need_b = need_b3.reshape(nb, ng)
        woff = jnp.stack([woffa, woffb], axis=-1).astype(jnp.int32)
        woff = woff.reshape(npg, -1)
        wpad8 = (-npg) % 8
        woff = jnp.pad(woff, ((0, wpad8 + 8), (0, 0)),
                       constant_values=-(2 ** 30))
    else:
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
    if rpb > 1:
        return cidf, off, woff, dropped
    return cidf, off, dropped


def _extract_view(x, shift, width, min_bit=8):
    """[4, L] -> [4, width] lanes starting at traced ``shift`` (multiple of
    ``min_bit``, <= L - width). Mosaic has no dynamic lane slice and its
    dynamic pltpu.roll miscompiles (round-3 probe), so the shift is
    realized as a chain of STATIC rolls selected by the shift's bits —
    ~log2(L/min_bit) vector selects, far cheaper than the dense lanes it
    saves. ``min_bit=128`` (rpb mode: all offsets lane-aligned) skips the
    sub-128 levels."""
    length = x.shape[-1]
    bit = min_bit
    while bit < length:
        x = jnp.where((shift & bit) != 0, pltpu.roll(x, (-bit) % length,
                                                     axis=1), x)
        bit *= 2
    return x[:, :width]


def _pair_force_phase(min_dist, k_contact, pos3_hbm, posc_blk, win_blk,
                      slab_ref, slabs, facc, sems, *, block, slab,
                      ng=_NG, ngp=_NGP, views_ref=None, sub_block=0):
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
        if sub_block:
            dst_a = slabs.at[g, :, pl.ds(0, slab)]
            dst_b = slabs.at[g, :, pl.ds(slab, slab)]
        else:
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

    if sub_block:
        # v3: per-sub-block views — nsub × [sub_block, VIEW_W] dense math
        # per group instead of [block, slab]; window masks make any view
        # overlap across groups/subs harmless (group windows are disjoint
        # cell ranges).
        nsub = block // sub_block
        lane_v = jax.lax.broadcasted_iota(jnp.int32, (1, VIEW_W), 1)
        for g in range(ng):
            cpa, cpb = dmas[g]
            offa = slab_ref[row, g * 2]
            offb = slab_ref[row, g * 2 + 1]
            cpa.wait()

            @pl.when(offb > offa)
            def _wait_b(cpb=cpb):
                cpb.wait()

            concat = slabs[g]                            # [4, 2*slab]
            for t in range(nsub):
                col = (g * nsub + t) * 2
                shift = views_ref[row, col]
                base = views_ref[row, col + 1]
                view = _extract_view(concat, shift, VIEW_W)
                lo = t * sub_block
                hi = lo + sub_block
                s_g = win_blk[lo:hi, g:g + 1]
                e_g = win_blk[lo:hi, ngp + g:ngp + g + 1]
                jg = lane_v + base
                p_x = px[lo:hi]
                p_y = py[lo:hi]
                p_z = pz[lo:hi]
                valid = (jg >= s_g) & (jg < e_g)
                if g == center:
                    valid = valid & (jg != selfs[lo:hi])
                dx = p_x - view[0:1, :]
                dy = p_y - view[1:2, :]
                dz = p_z - view[2:3, :]
                d2 = dx * dx + dy * dy + dz * dz
                touching = valid & (d2 < min_dist * min_dist) & \
                    (d2 > _EPS * _EPS)
                inv = jax.lax.rsqrt(jnp.where(d2 > _EPS * _EPS, d2, 1.0))
                wgt = jnp.where(touching,
                                k_contact * (min_dist * inv - 1.0), 0.0)
                facc[lo:hi, 0:1] += jnp.sum(wgt * dx, axis=1, keepdims=True)
                facc[lo:hi, 1:2] += jnp.sum(wgt * dy, axis=1, keepdims=True)
                facc[lo:hi, 2:3] += jnp.sum(wgt * dz, axis=1, keepdims=True)
        fx = fx + facc[:, 0:1]
        fy = fy + facc[:, 1:2]
        fz = fz + facc[:, 2:3]
        return px, py, pz, fx, fy, fz, selfs

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


def _pair_force_phase_merged(min_dist, k_contact, pos3_hbm, posc_blk,
                             win_blk, slab_ref, slab_next_ref, slabs,
                             facc, sems, *, block, slab, ng=_NG,
                             ngp=_NGP):
    """Merged-slab pair phase (round-3): each dx-triple of window ranges
    shares one A/B slab pair, so a block issues ``ng//3`` slab-DMA
    groups instead of ``ng``. The chip measurement driving this: at
    b256 the dense kernel is DMA-issue/wait-bound on the scalar core
    (halving ``slab`` moved time ~1%), so fewer/wider DMAs win even
    though each pass evaluates a wider slab. Validity stays exact — a
    candidate must fall inside one of the triple's PER-RANGE windows;
    the ranges are disjoint cell columns, so the particle's own slot
    appears exactly once (in the center dx-group) and self-exclusion is
    one compare there. Cross-block double-buffered like
    :func:`_pair_force_phase_pipelined` (``slab_ref`` again passed
    twice, next block's row via ``slab_next_ref``).
    """
    ngd = ng // 3
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    row = jax.lax.rem(b, 8)
    par = jax.lax.rem(b, 2)

    def issue(ref, row_idx, buf):
        for g in range(ngd):
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
    selfs = b * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    fx = jnp.zeros((block, 1), jnp.float32)
    fy = jnp.zeros((block, 1), jnp.float32)
    fz = jnp.zeros((block, 1), jnp.float32)
    facc[...] = jnp.zeros((block, 4), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, slab), 1)

    center = ngd // 2     # the dx=0 triple — the only one whose ranges
    # can contain the particle's own slot

    def pair_sums(qx, qy, qz, jg, ranges, lo, check_self):
        valid = (jg >= ranges[0][0]) & (jg < ranges[0][1])
        for s_g, e_g in ranges[1:]:
            valid = valid | ((jg >= s_g) & (jg < e_g))
        valid = valid & (jg >= lo)
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

    for g in range(ngd):
        offa = slab_ref[row, g * 2]
        offb = slab_ref[row, g * 2 + 1]
        ranges = [(win_blk[:, j:j + 1], win_blk[:, ngp + j:ngp + j + 1])
                  for j in range(g * 3, g * 3 + 3)]
        pltpu.make_async_copy(
            pos3_hbm.at[:, pl.ds(pl.multiple_of(offa, 128), slab)],
            slabs.at[par, g, 0], sems.at[par, g, 0]).wait()
        sx, sy, sz = pair_sums(
            slabs[par, g, 0, 0:1, :], slabs[par, g, 0, 1:2, :],
            slabs[par, g, 0, 2:3, :], lane + offa, ranges,
            jnp.int32(0), g == center)
        fx = fx + sx
        fy = fy + sy
        fz = fz + sz

        @pl.when(offb > offa)
        def _pass_b(g=g, offa=offa, offb=offb, ranges=ranges):
            pltpu.make_async_copy(
                pos3_hbm.at[:, pl.ds(pl.multiple_of(offb, 128), slab)],
                slabs.at[par, g, 1], sems.at[par, g, 1]).wait()
            bx, by, bz = pair_sums(
                slabs[par, g, 1, 0:1, :], slabs[par, g, 1, 1:2, :],
                slabs[par, g, 1, 2:3, :], lane + offb, ranges,
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
                          facc, sems, *, block, slab, bounds, mxu=False,
                          base=None):
    """CIV variant of :func:`_pair_force_phase_pipelined`: validity is
    ``cid_j - cid_i ∈ bounds[g]`` computed from the cid plane that rides
    in ``pos3_hbm`` row 3 (one fused DMA brings positions + cids), so the
    per-particle window operand and its rebuild-time gathers disappear.
    ``bounds`` are static Python ints from :func:`civ_bounds`.

    ``mxu=True`` moves the dense [block, slab] pair math onto the MXU
    (round 3): ``d2 = |p'|^2 + |q'|^2 - 2 p'.q'`` via one [B,3]x[3,S]
    matmul, and the three force components via one [B,S]x[S,4] matmul
    using ``f_i = p'_i * sum_j(w_ij) - sum_j(w_ij q'_j)`` — the VPU then
    only evaluates the validity mask and the weight ``w`` (~2/3 fewer
    elementwise ops, and no [B,S] reductions). Positions are recentered
    on the block's first particle before squaring, but a slab can still
    span a full grid z-column, so the expanded form carries up to
    ~1 ulp of the column extent squared in d2 — worst case ~1e-3
    relative in contact distance for near-threshold pairs (small-|w|
    pairs, so force noise stays ~1e-3 of a typical contact force; far
    below the frozen-window schedule's own chaotic divergence). NOT
    bitwise-equal to the direct-difference form; guarded by tolerance
    tests (test_granular_pallas.py).

    ``mxu="sums"``: hybrid — d2/w stay on the VPU (direct differences,
    ZERO extra d2 error; per-pair weights bit-identical to mxu=False)
    and only the three force-sum reductions ride the MXU; force totals
    differ from the VPU form purely by summation reassociation.
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

    if mxu:
        # recenter on the block's first particle: slab hulls span a few
        # cells, keeping |p'|^2 small enough that the expanded-form d2
        # stays accurate at contact range
        cx = posc_blk[0:1, 0:1]        # [1,1]: broadcasts against both
        cy = posc_blk[0:1, 1:2]        # [B,1] block columns and [1,S]
        cz = posc_blk[0:1, 2:3]        # slab rows
        pxc = px - cx
        pyc = py - cy
        pzc = pz - cz
        pmat = jnp.concatenate([pxc, pyc, pzc], axis=1)       # [B, 3]
        p2 = pxc * pxc + pyc * pyc + pzc * pzc                # [B, 1]
        md2 = min_dist * min_dist
        eps2 = jnp.float32(_EPS * _EPS)
        dn_d = (((1,), (0,)), ((), ()))       # [B,3] x [3,S] -> [B,S]
        dn_w = (((1,), (1,)), ((), ()))       # [B,S] x [4,S] -> [B,4]
        ones_row = jnp.ones((1, chunk), jnp.float32)

    def _chunk_sums(q, jg, lo_k, hi_k, lo, check_self):
        qc = q[3:4, :]
        dc = qc - pc
        valid = (dc >= lo_k) & (dc <= hi_k)
        if lo is not None:
            valid = valid & (jg >= lo)
        if check_self:
            valid = valid & (jg != selfs)
        if mxu:
            qxc = q[0:1, :] - cx
            qyc = q[1:2, :] - cy
            qzc = q[2:3, :] - cz
            qm = jnp.concatenate([qxc, qyc, qzc], axis=0)     # [3, C]
            if mxu == "sums":
                # hybrid: d2 from RAW differences (bit-identical per-pair
                # weights to mxu=False), MXU only for the reductions
                dx = px - q[0:1, :]
                dy = py - q[1:2, :]
                dz = pz - q[2:3, :]
                d2 = dx * dx + dy * dy + dz * dz
            else:
                q2 = qxc * qxc + qyc * qyc + qzc * qzc        # [1, C]
                dot = jax.lax.dot_general(
                    pmat, qm, dn_d, preferred_element_type=jnp.float32)
                d2 = (p2 + q2) - (dot + dot)
            touching = valid & (d2 < md2) & (d2 > eps2)
            inv = jax.lax.rsqrt(jnp.where(d2 > eps2, d2, 1.0))
            w = jnp.where(touching, k_contact * (min_dist * inv - 1.0),
                          0.0)
            q4 = jnp.concatenate([qm, ones_row], axis=0)      # [4, C]
            s = jax.lax.dot_general(
                w, q4, dn_w, preferred_element_type=jnp.float32)
            wsum = s[:, 3:4]
            return (pxc * wsum - s[:, 0:1],
                    pyc * wsum - s[:, 1:2],
                    pzc * wsum - s[:, 2:3])
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


def _pair_force_phase_civ_rpb(min_dist, k_contact, pos3_hbm, posc_blk,
                              cidc_blk, off_ref, woff_ref, woff_next_ref,
                              slabs_a, slabs_b, facc, sems_a, sems_b, *,
                              block, slab, wide, rpb, bounds, base=None):
    """Multi-block CIV pair phase (round 3): program ``p`` covers ``rpb``
    consecutive sorted blocks with ONE wide [4, wide] A-slab DMA per
    group (plus one gated wide B) instead of per-block slabs.

    Why it was built: the slab-width decomposition
    (tools/probes/probe_sc4.py, v5e) suggested the b256/s640 thin
    contact kernel was ~0.99 ms FIXED cost (DMA issues + per-program
    overhead) vs ~0.39 ms dense math; window starts are monotone in
    sorted order, so ``rpb`` neighboring blocks' A windows share one
    wide slab.

    MEASURED RESULT (tools/probes/probe_rpb.py, Aug 19): a LOSS or wash
    on both production workloads — SC 256² 1.79 -> 1.86/1.87/2.15
    ms/substep at rpb 2/4/8, granular 1M 27.0 -> 27.6/27.3 ms/step at
    rpb 4/8 (with 0.5M dropped entries at the auto ``wide``). The
    probe_sc4 intercept was NOT per-program issue cost: it conflates
    B-pass firing frequency (which falls as slab widens) with fixed
    overhead, and the tuned kernels sit near the VPU dense-math floor
    (~1.26G elem-ops ≈ 1.3 ms at 256²). Kept as a tested option — the
    same status as merged-slab mode — because the bitwise contract and
    drop accounting are useful if a future workload IS issue-bound
    (many tiny blocks).
    Per-block math is UNCHANGED: each row-block extracts its own
    [4, slab] view from the wide buffer (static-roll chain,
    :func:`_extract_view` — Mosaic has no dynamic lane slice; offsets
    are 128-aligned so only the >=128 bit levels run) and runs the same
    chunked [block, slab] masked pair math, making rpb mode
    bitwise-equal to :func:`_pair_force_phase_civ` whenever nothing
    clips (pinned by tests/test_granular_pallas.py::test_rpb_*).

    ``off_ref`` rows hold per-block (aeff, beff) *effective* starts and
    ``woff_ref`` per-program (woffa, woffb) wide starts, both from
    :func:`build_offsets_civ` with ``rpb``; ``woffb < 0`` = no block in
    the program needs a B pass, ``beff == aeff`` = this block doesn't.
    Returns [rpb*block, 1] column stacks (same contract as the per-block
    phases)."""
    ng = len(bounds)
    p = pl.program_id(0)
    npg = pl.num_programs(0)
    wrow = jax.lax.rem(p, 8)
    par = jax.lax.rem(p, 2)
    off_rows = max(rpb, 8)

    def issue(ref, row_idx, buf):
        for g in range(ng):
            woffa = pl.multiple_of(ref[row_idx, g * 2], 128)
            woffb = ref[row_idx, g * 2 + 1]
            pltpu.make_async_copy(
                pos3_hbm.at[:, pl.ds(woffa, wide)], slabs_a.at[buf, g],
                sems_a.at[buf, g]).start()

            @pl.when(woffb >= 0)
            def _start_b(woffb=woffb, g=g, buf=buf):
                pltpu.make_async_copy(
                    pos3_hbm.at[:, pl.ds(pl.multiple_of(woffb, 128), wide)],
                    slabs_b.at[buf, g], sems_b.at[buf, g]).start()

    @pl.when(p == 0)
    def _prime():
        issue(woff_ref, wrow, par)

    @pl.when(p + 1 < npg)
    def _prefetch_next():
        issue(woff_next_ref, jax.lax.rem(p + 1, 8), 1 - par)

    wide_offs = []
    for g in range(ng):
        woffa = pl.multiple_of(woff_ref[wrow, g * 2], 128)
        woffb = woff_ref[wrow, g * 2 + 1]
        pltpu.make_async_copy(
            pos3_hbm.at[:, pl.ds(woffa, wide)], slabs_a.at[par, g],
            sems_a.at[par, g]).wait()

        @pl.when(woffb >= 0)
        def _wait_b(woffb=woffb, g=g):
            pltpu.make_async_copy(
                pos3_hbm.at[:, pl.ds(pl.multiple_of(woffb, 128), wide)],
                slabs_b.at[par, g], sems_b.at[par, g]).wait()

        wide_offs.append((woffa, woffb))

    _CHUNK_BUDGET = 256 * 640
    chunk = slab
    while block * chunk > _CHUNK_BUDGET and chunk % 256 == 0:
        chunk //= 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    center = ng // 2
    md2 = min_dist * min_dist
    eps2 = jnp.float32(_EPS * _EPS)

    outs = []
    for rb in range(rpb):
        r0 = rb * block
        px = posc_blk[r0:r0 + block, 0:1]
        py = posc_blk[r0:r0 + block, 1:2]
        pz = posc_blk[r0:r0 + block, 2:3]
        pc = cidc_blk[r0:r0 + block, 0:1]
        selfs = ((p * rpb + rb) * block
                 + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0))
        if base is not None:
            selfs = selfs + base
        row_idx = jax.lax.rem(p * rpb, off_rows) + rb

        def chunk_sums(q, jg, lo_k, hi_k, lo, check_self, px=px, py=py,
                       pz=pz, pc=pc, selfs=selfs):
            dc = q[3:4, :] - pc
            valid = (dc >= lo_k) & (dc <= hi_k)
            if lo is not None:
                valid = valid & (jg >= lo)
            if check_self:
                valid = valid & (jg != selfs)
            dx = px - q[0:1, :]
            dy = py - q[1:2, :]
            dz = pz - q[2:3, :]
            d2 = dx * dx + dy * dy + dz * dz
            touching = valid & (d2 < md2) & (d2 > eps2)
            inv = jax.lax.rsqrt(jnp.where(d2 > eps2, d2, 1.0))
            w = jnp.where(touching, k_contact * (min_dist * inv - 1.0), 0.0)
            return (jnp.sum(w * dx, axis=1, keepdims=True),
                    jnp.sum(w * dy, axis=1, keepdims=True),
                    jnp.sum(w * dz, axis=1, keepdims=True))

        def pair_sums(qslab, off, lo_k, hi_k, lo, check_self,
                      chunk_sums=chunk_sums):
            sx, sy, sz = chunk_sums(qslab[:, 0:chunk], lane + off, lo_k,
                                    hi_k, lo, check_self)
            for c0 in range(chunk, slab, chunk):
                ax, ay, az = chunk_sums(qslab[:, c0:c0 + chunk],
                                        lane + (off + c0), lo_k, hi_k,
                                        lo, check_self)
                sx, sy, sz = sx + ax, sy + ay, sz + az
            return sx, sy, sz

        fx = jnp.zeros((block, 1), jnp.float32)
        fy = jnp.zeros((block, 1), jnp.float32)
        fz = jnp.zeros((block, 1), jnp.float32)
        facc[...] = jnp.zeros((block, 4), jnp.float32)
        for g in range(ng):
            lo_k = jnp.float32(bounds[g][0])
            hi_k = jnp.float32(bounds[g][1])
            woffa, woffb = wide_offs[g]
            aeff = off_ref[row_idx, g * 2]
            beff = off_ref[row_idx, g * 2 + 1]
            qa = _extract_view(slabs_a[par, g], aeff - woffa, slab,
                               min_bit=128)
            sx, sy, sz = pair_sums(qa, aeff, lo_k, hi_k, None, g == center)
            fx, fy, fz = fx + sx, fy + sy, fz + sz

            @pl.when(beff > aeff)
            def _pass_b(g=g, woffb=woffb, aeff=aeff, beff=beff, lo_k=lo_k,
                        hi_k=hi_k, pair_sums=pair_sums):
                qb = _extract_view(slabs_b[par, g], beff - woffb, slab,
                                   min_bit=128)
                bx, by, bz = pair_sums(qb, beff, lo_k, hi_k, aeff + slab,
                                       g == center)
                facc[:, 0:1] += bx
                facc[:, 1:2] += by
                facc[:, 2:3] += bz

        outs.append((px, py, pz, fx + facc[:, 0:1], fy + facc[:, 1:2],
                     fz + facc[:, 2:3], selfs))

    return tuple(jnp.concatenate([o[i] for o in outs], axis=0)
                 for i in range(7))


def _kernel(params_ref, pos3_hbm, posc_blk, velc_blk, win_blk, slab_ref,
            *rest, block, slab, n_real, sub_block=0, pipelined=False,
            merge=False, civ=None, mxu=False, rpb=1, wide=0):
    """One granular substep for sorted-block ``b = program_id(0)``:
    the shared pair-force phase, then gravity -> Euler -> wall clamp &
    reflect — op order matching models/granular._frozen_substep exactly.

    ``civ``: static per-group cid-difference bounds (:func:`civ_bounds`);
    when set, ``win_blk`` is the [block, 1] f32 cid column instead of
    window ranges and the CIV pair phase runs (always cross-block
    pipelined). ``rpb > 1``: the multi-block wide-slab phase
    (:func:`_pair_force_phase_civ_rpb`); the program covers rpb blocks.
    """
    slab_next_ref = views_ref = None
    if rpb > 1:
        (woff_ref, woff_next_ref, posc_out, velc_out, slabs_a, slabs_b,
         facc, sems_a, sems_b) = rest
    elif sub_block:
        views_ref, posc_out, velc_out, slabs, facc, sems = rest
    elif pipelined or merge or civ:
        slab_next_ref, posc_out, velc_out, slabs, facc, sems = rest
    else:
        posc_out, velc_out, slabs, facc, sems = rest
    min_dist = params_ref[0]
    k_contact = params_ref[1]
    gravity = params_ref[2]
    dt = params_ref[3]
    restitution = params_ref[4]
    limit = params_ref[5]

    if rpb > 1:
        base = (jnp.int32(params_ref[6])
                if params_ref.shape[0] > 6 else None)
        px, py, pz, fx, fy, fz, selfs = _pair_force_phase_civ_rpb(
            min_dist, k_contact, pos3_hbm, posc_blk, win_blk, slab_ref,
            woff_ref, woff_next_ref, slabs_a, slabs_b, facc, sems_a,
            sems_b, block=block, slab=slab, wide=wide, rpb=rpb,
            bounds=civ, base=base)
    elif civ:
        # a 7th params element (sharded launches) is the launch's global
        # first-particle index; f32 carries it exactly below 2**24
        base = (jnp.int32(params_ref[6])
                if params_ref.shape[0] > 6 else None)
        px, py, pz, fx, fy, fz, selfs = _pair_force_phase_civ(
            min_dist, k_contact, pos3_hbm, posc_blk, win_blk, slab_ref,
            slab_next_ref, slabs, facc, sems, block=block, slab=slab,
            bounds=civ, mxu=mxu, base=base)
    elif merge:
        px, py, pz, fx, fy, fz, selfs = _pair_force_phase_merged(
            min_dist, k_contact, pos3_hbm, posc_blk, win_blk, slab_ref,
            slab_next_ref, slabs, facc, sems, block=block, slab=slab)
    elif pipelined:
        px, py, pz, fx, fy, fz, selfs = _pair_force_phase_pipelined(
            min_dist, k_contact, pos3_hbm, posc_blk, win_blk, slab_ref,
            slab_next_ref, slabs, facc, sems, block=block, slab=slab)
    else:
        px, py, pz, fx, fy, fz, selfs = _pair_force_phase(
            min_dist, k_contact, pos3_hbm, posc_blk, win_blk, slab_ref,
            slabs, facc, sems, block=block, slab=slab,
            views_ref=views_ref, sub_block=sub_block)
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
                   sub_block=0, pipelined=False, merge=False, civ=None,
                   mxu=False, rpb=1, wide=0):
    """Force-only variant: write the pair contact-force sums and stop —
    the caller owns integration (cloth self-collision folds these into
    its spring-force accumulation, models/cloth.self_collision_forces)."""
    slab_next_ref = views_ref = None
    if rpb > 1:
        (woff_ref, woff_next_ref, f_out, slabs_a, slabs_b, facc,
         sems_a, sems_b) = rest
        _, _, _, fx, fy, fz, selfs = _pair_force_phase_civ_rpb(
            params_ref[0], params_ref[1], pos3_hbm, posc_blk, win_blk,
            slab_ref, woff_ref, woff_next_ref, slabs_a, slabs_b, facc,
            sems_a, sems_b, block=block, slab=slab, wide=wide, rpb=rpb,
            bounds=civ)
        alive = selfs < n_real
        f_out[:, 0:1] = jnp.where(alive, fx, 0.0)
        f_out[:, 1:2] = jnp.where(alive, fy, 0.0)
        f_out[:, 2:3] = jnp.where(alive, fz, 0.0)
        return
    if sub_block:
        views_ref, f_out, slabs, facc, sems = rest
    elif pipelined or merge or civ:
        slab_next_ref, f_out, slabs, facc, sems = rest
    else:
        f_out, slabs, facc, sems = rest
    if civ:
        _, _, _, fx, fy, fz, selfs = _pair_force_phase_civ(
            params_ref[0], params_ref[1], pos3_hbm, posc_blk, win_blk,
            slab_ref, slab_next_ref, slabs, facc, sems, block=block,
            slab=slab, bounds=civ, mxu=mxu)
    elif merge:
        _, _, _, fx, fy, fz, selfs = _pair_force_phase_merged(
            params_ref[0], params_ref[1], pos3_hbm, posc_blk, win_blk,
            slab_ref, slab_next_ref, slabs, facc, sems, block=block,
            slab=slab, ng=ng, ngp=ngp)
    elif pipelined:
        _, _, _, fx, fy, fz, selfs = _pair_force_phase_pipelined(
            params_ref[0], params_ref[1], pos3_hbm, posc_blk, win_blk,
            slab_ref, slab_next_ref, slabs, facc, sems, block=block,
            slab=slab, ng=ng, ngp=ngp)
    else:
        _, _, _, fx, fy, fz, selfs = _pair_force_phase(
            params_ref[0], params_ref[1], pos3_hbm, posc_blk, win_blk,
            slab_ref, slabs, facc, sems, block=block, slab=slab, ng=ng,
            ngp=ngp, views_ref=views_ref, sub_block=sub_block)
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


def _launch_rpb(body, pvec, pos3, posc, windows, slab_start, woff, *,
                block, slab, n_real, interpret, civ, rpb, wide,
                velc=None):
    """Launch the multi-block (rpb) CIV kernel: a grid of ``nb/rpb``
    programs, each owning ``rpb`` consecutive sorted blocks, wide A/B
    slab scratch, and the per-program wide-offset SMEM table (windowed
    one program ahead for the cross-program prefetch, like the per-block
    table in the rpb=1 launchers)."""
    n_pad = posc.shape[0]
    nb = n_pad // block
    ng = len(civ)
    w = wide if wide is not None else slab + rpb * block
    if nb % rpb:
        raise ValueError(f"{nb} blocks not divisible by rpb={rpb}")
    if w % 128 or w > n_pad:
        raise ValueError(f"wide={w} must be 128-aligned and <= n_pad "
                         f"({n_pad})")
    npg = nb // rpb
    off_rows = max(rpb, 8)
    kernel = functools.partial(body, block=block, slab=slab,
                               n_real=n_real, civ=civ, rpb=rpb, wide=w)
    rblk = rpb * block
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),        # params
        pl.BlockSpec(memory_space=pl.ANY),            # pos3 (DMA src)
        pl.BlockSpec((rblk, 3), lambda b: (b, 0)),    # posc
    ]
    operands = [pvec, pos3, posc]
    if velc is not None:
        in_specs.append(pl.BlockSpec((rblk, 3), lambda b: (b, 0)))
        operands.append(velc)
    in_specs += [
        pl.BlockSpec((rblk, 1), lambda b: (b, 0)),    # cid column
        # per-block (aeff, beff) rows, windowed so rows [p*rpb, +rpb)
        # are always inside the (off_rows)-row tile
        pl.BlockSpec((off_rows, 2 * ng),
                     lambda b: (b * rpb // off_rows, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((8, 2 * ng), lambda b: (b // 8, 0),
                     memory_space=pltpu.SMEM),        # wide offsets
        pl.BlockSpec((8, 2 * ng), lambda b: ((b + 1) // 8, 0),
                     memory_space=pltpu.SMEM),        # prefetch row
    ]
    operands += [windows, slab_start, woff, woff]
    scratch = [
        pltpu.VMEM((2, ng, 4, w), jnp.float32),       # wide A slabs
        pltpu.VMEM((2, ng, 4, w), jnp.float32),       # wide B slabs
        pltpu.VMEM((block, 4), jnp.float32),          # per-row-block facc
        pltpu.SemaphoreType.DMA((2, ng)),
        pltpu.SemaphoreType.DMA((2, ng)),
    ]
    if velc is not None:
        out_specs = (pl.BlockSpec((rblk, 3), lambda b: (b, 0)),
                     pl.BlockSpec((rblk, 3), lambda b: (b, 0)))
        out_shape = (jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
                     jax.ShapeDtypeStruct((n_pad, 3), jnp.float32))
    else:
        out_specs = pl.BlockSpec((rblk, 3), lambda b: (b, 0))
        out_shape = jax.ShapeDtypeStruct((n_pad, 3), jnp.float32)
    return pl.pallas_call(
        kernel, grid=(npg,), in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=scratch, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret)(*operands)


def contact_forces_sorted(pos3: jnp.ndarray, posc: jnp.ndarray,
                          windows: jnp.ndarray, slab_start: jnp.ndarray,
                          min_dist, k_contact, *, block: int, slab: int,
                          n_real: int, interpret: bool,
                          thin: bool = False, sub_block: int = 0,
                          views=None, pipelined: bool = False,
                          merge: bool = False, civ=None,
                          mxu: bool = False, rpb: int = 1,
                          woff=None, wide: int = None) -> jnp.ndarray:
    """Pairwise penalty contact forces on padded SORTED positions.

    Same slab-DMA machinery as :func:`substep_sorted` but returns forces
    ``[n_pad, 3]`` (zero on pad rows) instead of integrating — the
    narrow-phase for cloth self-collision (BASELINE configs[3]), whose
    integration lives in the cloth step.

    ``merge=True`` consumes ``build_windows(merge=True)`` offsets: one
    A/B slab pair per dx-triple of window ranges (always cross-block
    pipelined); ``pipelined``/``sub_block`` are ignored.

    ``civ``: static bounds from :func:`civ_bounds` — ``windows`` is then
    the [n_pad, 1] f32 cid column and ``pos3`` must carry cids in row 3
    (``build_offsets_civ`` returns both); always cross-block pipelined.
    """
    _check_block_slab(block, slab)
    n_pad = posc.shape[0]
    nb = n_pad // block
    ng, ngp = (3, 4) if thin else (_NG, _NGP)
    if merge or civ:
        sub_block = 0
        pipelined = False
    ngd = ng // 3 if merge else ng
    pvec = jnp.stack([jnp.asarray(min_dist, jnp.float32),
                      jnp.asarray(k_contact, jnp.float32)])
    if rpb > 1:
        if civ is None or mxu or woff is None:
            raise ValueError("rpb > 1 requires civ bounds and the woff "
                             "table from build_offsets_civ(rpb=...); "
                             "mxu is unsupported in rpb mode")
        return _launch_rpb(_forces_kernel, pvec, pos3, posc, windows,
                           slab_start, woff, block=block, slab=slab,
                           n_real=n_real, interpret=interpret, civ=civ,
                           rpb=rpb, wide=wide)
    kernel = functools.partial(_forces_kernel, block=block, slab=slab,
                               n_real=n_real, ng=ng, ngp=ngp,
                               sub_block=sub_block, pipelined=pipelined,
                               merge=merge, civ=civ, mxu=mxu)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),        # params
        pl.BlockSpec(memory_space=pl.ANY),            # pos3 (DMA src)
        pl.BlockSpec((block, 3), lambda b: (b, 0)),
        pl.BlockSpec((block, 1) if civ else (block, 2 * ngp),
                     lambda b: (b, 0)),
        pl.BlockSpec((8, 2 * ngd), lambda b: (b // 8, 0),
                     memory_space=pltpu.SMEM),
    ]
    operands = [pvec, pos3, posc, windows, slab_start]
    if (pipelined or merge or civ) and not sub_block:
        # the SAME offset table again, windowed one block ahead: block
        # b's prefetch of block b+1's slabs reads row (b+1)%8 here
        in_specs.append(pl.BlockSpec((8, 2 * ngd),
                                     lambda b: ((b + 1) // 8, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(slab_start)
    if sub_block:
        nsub = block // sub_block
        in_specs.append(pl.BlockSpec((8, ng * nsub * 2),
                                     lambda b: (b // 8, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(views)
        slab_scratch = pltpu.VMEM((ng, 4, 2 * slab), jnp.float32)
    elif pipelined or merge or civ:
        slab_scratch = pltpu.VMEM((2, ngd, 2, 4, slab), jnp.float32)
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
            pltpu.SemaphoreType.DMA((2, ngd, 2)
                                    if (pipelined or merge or civ)
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
                   n_real: int, interpret: bool, sub_block: int = 0,
                   views=None, pipelined: bool = False,
                   merge: bool = False, civ=None, mxu: bool = False,
                   rpb: int = 1, woff=None, wide: int = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One substep on padded SORTED state. ``pos3`` [4, Np] (DMA slab
    source; rows x/y/z + one dead alignment row), ``posc``/``velc``
    [Np, 3] (per-particle columns), ``windows`` [Np, 2*_NGP] int32,
    ``slab_start`` [Np//block, 2*_NG] int32 (per-block SMEM rows).
    Returns new ``(posc, velc)``; the caller re-derives pos3.

    ``merge=True``: merged-slab mode (one A/B slab pair per dx-triple;
    requires ``build_windows(merge=True)`` offsets; always cross-block
    pipelined; ``pipelined``/``sub_block`` are ignored).

    ``civ``: static bounds from :func:`civ_bounds` — ``windows`` is then
    the [n_pad, 1] f32 cid column and ``pos3`` row 3 carries cids
    (``build_offsets_civ`` returns both); always cross-block pipelined.
    """
    _check_block_slab(block, slab)
    n_pad = posc.shape[0]
    nb = n_pad // block
    if merge or civ:
        sub_block = 0
        pipelined = False
    if rpb > 1:
        if civ is None or mxu or woff is None:
            raise ValueError("rpb > 1 requires civ bounds and the woff "
                             "table from build_offsets_civ(rpb=...); "
                             "mxu is unsupported in rpb mode")
        return _launch_rpb(_kernel, params_vec, pos3, posc, windows,
                           slab_start, woff, block=block, slab=slab,
                           n_real=n_real, interpret=interpret, civ=civ,
                           rpb=rpb, wide=wide, velc=velc)
    ngd = _NG // 3 if merge else (len(civ) if civ else _NG)
    kernel = functools.partial(_kernel, block=block, slab=slab,
                               n_real=n_real, sub_block=sub_block,
                               pipelined=pipelined, merge=merge, civ=civ,
                               mxu=mxu)
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
    if (pipelined or merge or civ) and not sub_block:
        in_specs.append(pl.BlockSpec((8, 2 * ngd),
                                     lambda b: ((b + 1) // 8, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(slab_start)
    if sub_block:
        nsub = block // sub_block
        in_specs.append(pl.BlockSpec((8, _NG * nsub * 2),
                                     lambda b: (b // 8, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(views)
        slab_scratch = pltpu.VMEM((_NG, 4, 2 * slab), jnp.float32)
    elif pipelined or merge or civ:
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
            pltpu.SemaphoreType.DMA((2, ngd, 2)
                                    if (pipelined or merge or civ)
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
