"""Pallas instanced-sphere rasterization kernel.

The XLA instanced-sphere pass (render/raster.draw_instanced_spheres) scans
instance chunks and materializes [pixels, chunk] intermediates in HBM
(~50 ms/frame at 256² × 3,600 instances). This kernel keeps the framebuffer
(tmin + winning instance id) VMEM-resident and loops instances with
per-instance SMEM scalars, so HBM sees only the ray directions in and two
[H, W] planes out — the TPU equivalent of the reference's instanced draw
(cloth.rs:1366-1379: 3,600 instances × 48,384 indices through the vertex
shader; here each instance is ~12 VPU ops over the pixel grid).

Depth resolve = nearest hit (ray parameter t), ties by lower instance id —
deterministic, unlike a GPU z-fight.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# SMEM budget for per-instance scalars (4 floats each). 16k instances ≈
# 256 KiB of SMEM; beyond that callers should fall back to the XLA path.
MAX_INSTANCES = 16384

# Candidate-sweep unroll width (see _hit_sweep): amortizes the ~100 ns
# fori-iteration overhead that dominated the per-world datagen render.
_SWEEP_UNROLL = 8


def _kernel(scal_ref, oc_ref, dirs_ref, tmin_out, inst_out, *, n, h, w):
    znear = scal_ref[0]
    dx, dy, dz = dirs_ref[0], dirs_ref[1], dirs_ref[2]

    def body(k, carry):
        tmin, inst = carry
        ocx = oc_ref[0, k]
        ocy = oc_ref[1, k]
        ocz = oc_ref[2, k]
        cc = oc_ref[3, k]          # |oc|^2 - r^2 (precomputed; +inf = padding)
        b = dx * ocx + dy * ocy + dz * ocz
        disc = b * b - cc
        t = b - jnp.sqrt(jnp.maximum(disc, 0.0))
        better = (disc > 0.0) & (t > znear) & (t < tmin)
        tmin = jnp.where(better, t, tmin)
        inst = jnp.where(better, k, inst)
        return tmin, inst

    tmin0 = jnp.full((h, w), jnp.inf, jnp.float32)
    inst0 = jnp.full((h, w), -1, jnp.int32)
    tmin, inst = jax.lax.fori_loop(0, n, body, (tmin0, inst0))
    tmin_out[...] = tmin
    inst_out[...] = inst


@functools.partial(jax.jit, static_argnames=("interpret",))
def sphere_raster(eye: jnp.ndarray, dirs: jnp.ndarray, centers: jnp.ndarray,
                  radius, znear, interpret: Optional[bool] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest ray-sphere hit over all instances.

    ``eye`` [3], ``dirs`` [3, H, W] (normalized), ``centers`` [N, 3].
    Returns ``(tmin [H, W], inst [H, W])`` with ``inst = -1`` on miss and
    ``tmin = +inf`` on miss.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = dirs.shape[-2:]
    n = centers.shape[0]
    assert n <= MAX_INSTANCES, f"{n} instances exceed SMEM budget"

    oc = (centers - eye[None, :]).T.astype(jnp.float32)       # [3, N]
    cc = jnp.sum(oc * oc, axis=0) - jnp.float32(radius) ** 2  # [N]
    ocb = jnp.concatenate([oc, cc[None]], axis=0)             # [4, N]
    scal = jnp.asarray([znear], jnp.float32)

    kernel = functools.partial(_kernel, n=n, h=h, w=w)
    tmin, inst = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(scal, ocb, dirs)
    return tmin, inst


# ---------------------------------------------------------------------------
# Tile-binned variant
# ---------------------------------------------------------------------------

def _hit_sweep(oc_ref, dirs_ref, znear, base, start, end, tmin, inst,
               oc_win=None):
    """fori-sweep candidates [start, end) of ``oc_ref`` against one pixel
    tile, recording nearest hit; ``base + k`` is the recorded instance id
    (base > 0 in the chunked-table kernel). Shared by both tiled kernels
    so the hit test cannot drift between the n<=MAX and chunked paths.

    ``oc_win``: optional (ox, oy, oz) winner planes — when given, the
    winning candidate's eye-relative center is tracked alongside
    (3 extra where-selects per candidate). This lets the composite read
    the hit sphere's center from kernel outputs instead of a 65k-pixel
    gather from the instance table (the TPU gather floor is ~7 ns/elem —
    the gathers, not the sweep, dominate the per-world render at datagen
    scales).

    The loop is unrolled ``_SWEEP_UNROLL``-wide with a balanced
    min-by-(t, index) tree per group: a scalar per-candidate fori pays
    ~100 ns/iteration of loop/scalar-issue overhead (measured Aug 19 —
    2.2 of the 2.4 ms/world datagen render at ~22k candidate-tile
    iterations), swamping the ~12 VPU ops of actual hit math. Unrolling
    amortizes the overhead and the tree exposes ILP across the group's
    scalar SMEM loads. First-strict-minimum is associative over
    index-ordered groups, so the winner (and every output bit) is
    IDENTICAL to the scalar loop's, including exact-t ties (earliest
    sorted index wins)."""
    track = oc_win is not None
    u = _SWEEP_UNROLL
    kmax = oc_ref.shape[1] - 1          # clamp loads past `end` in-bounds

    def body(i, carry):
        tmin = carry[0]
        k0 = start + i * u
        cands = []
        for j in range(u):
            k = k0 + j
            kc = jnp.minimum(k, kmax)
            ocx = oc_ref[0, kc]
            ocy = oc_ref[1, kc]
            ocz = oc_ref[2, kc]
            cc = oc_ref[3, kc]
            b = dirs_ref[0] * ocx + dirs_ref[1] * ocy + dirs_ref[2] * ocz
            disc = b * b - cc
            tt = b - jnp.sqrt(jnp.maximum(disc, 0.0))
            ok = (disc > 0.0) & (tt > znear) & (k < end)
            teff = jnp.where(ok, tt, jnp.inf)
            cand = (teff, base + k)
            if track:
                cand += (ocx, ocy, ocz)
            cands.append(cand)
        while len(cands) > 1:           # balanced first-min tree
            nxt = []
            for a, bnd in zip(cands[0::2], cands[1::2]):
                w = bnd[0] < a[0]       # strict: ties keep the earlier
                nxt.append(tuple(jnp.where(w, xb, xa)
                                 for xa, xb in zip(a, bnd)))
            if len(cands) % 2:
                nxt.append(cands[-1])
            cands = nxt
        better = cands[0][0] < tmin
        return tuple(jnp.where(better, g, c)
                     for g, c in zip(cands[0], carry))

    init = (tmin, inst) + (tuple(oc_win) if track else ())
    n_groups = jax.lax.div(end - start + (u - 1), u)
    return jax.lax.fori_loop(0, n_groups, body, init)


def _tiled_kernel(scal_ref, wins_ref, oc_ref, dirs_ref, tmin_out, inst_out,
                  *oc_outs, th, tw, tx_tiles):
    """Nearest hit for pixel tile ``t = program_id(0)`` over its binned
    candidate ranges: 3 sorted-order row-ring ranges + the global range
    (instances too close/large/behind to bin — exact fallback, no caps).

    ``oc_outs``: optionally (ox_out, oy_out, oz_out) — winner
    eye-relative-center planes (see :func:`_hit_sweep`).
    """
    t = pl.program_id(0)
    row = jax.lax.rem(t, 8)
    znear = scal_ref[0]

    tmin = jnp.full((th, tw), jnp.inf, jnp.float32)
    inst = jnp.full((th, tw), -1, jnp.int32)
    oc_win = (tuple(jnp.zeros((th, tw), jnp.float32) for _ in range(3))
              if oc_outs else None)

    # dynamic loop over the 4 ranges (3 row-ring + global) so the
    # unrolled sweep body is emitted ONCE — four inlined copies blew the
    # remote-compile request size limit (HTTP 413) on the axon tunnel
    def grp(g, carry):
        start = wins_ref[row, 2 * g]
        end = wins_ref[row, 2 * g + 1]
        return _hit_sweep(oc_ref, dirs_ref, znear, 0, start, end,
                          carry[0], carry[1],
                          carry[2:] if oc_outs else None)

    out = jax.lax.fori_loop(0, 4, grp,
                            (tmin, inst) + (oc_win if oc_outs else ()))
    tmin_out[...] = out[0]
    inst_out[...] = out[1]
    for ref, plane in zip(oc_outs, out[2:]):
        ref[...] = plane


def _tiled_kernel_chunked(scal_ref, wins_ref, oc_ref, dirs_ref, tmin_out,
                          inst_out, *oc_outs, th, tw, tx_tiles, chunk):
    """Large-N variant of :func:`_tiled_kernel`: grid ``(tiles, chunks)``
    with the instance table split into ``chunk``-column SMEM blocks (so
    the per-step SMEM footprint stays inside the budget however large N
    is) and the per-tile ranges pre-intersected with each chunk's span.
    The chunk axis is INNERMOST, so each pixel tile's (tmin, inst) block
    stays VMEM-resident across its consecutive chunk steps — the
    canonical Pallas accumulation pattern. Bit-identical to the
    single-chunk kernel: candidates are visited in the same global
    sorted order, so even exact-t ties resolve the same way.
    """
    c = pl.program_id(1)
    row = jax.lax.rem(pl.program_id(0), 8)
    znear = scal_ref[0]
    base = c * chunk

    @pl.when(c == 0)
    def _init():
        tmin_out[...] = jnp.full((th, tw), jnp.inf, jnp.float32)
        inst_out[...] = jnp.full((th, tw), -1, jnp.int32)
        for ref in oc_outs:
            ref[...] = jnp.zeros((th, tw), jnp.float32)

    tmin = tmin_out[...]
    inst = inst_out[...]
    oc_win = tuple(ref[...] for ref in oc_outs) if oc_outs else ()

    def grp(g, carry):                      # see _tiled_kernel: one body
        start = wins_ref[0, row, 2 * g]
        end = wins_ref[0, row, 2 * g + 1]
        return _hit_sweep(oc_ref, dirs_ref, znear, base, start, end,
                          carry[0], carry[1],
                          carry[2:] if oc_outs else None)

    out = jax.lax.fori_loop(0, 4, grp, (tmin, inst) + oc_win)
    tmin_out[...] = out[0]
    inst_out[...] = out[1]
    for ref, plane in zip(oc_outs, out[2:]):
        ref[...] = plane


def tiled_prologue(camera_rot: jnp.ndarray, eye: jnp.ndarray,
                   centers: jnp.ndarray, radius, znear, tan_half, aspect,
                   h: int, w: int, tile_h: int = 8
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The XLA binning half of :func:`sphere_raster_tiled`: project centers,
    bin by screen tile, sort, build per-tile candidate windows.

    Split out so batched renderers (datagen) can ``vmap`` it across worlds
    in ONE program — inside a per-world ``lax.map`` these small ops
    (argsort of N, histogram, cumsum) serialize and dominate the render
    floor (~0.5 of 1.4 ms/world at 512×256²; VERDICT-r2 weak #6).

    Returns ``(wins [T8, 8] int32, ocb [4, N] f32, order [N] int32)`` —
    everything the kernel launch needs besides the ray grid.
    """
    th, tw = tile_h, 128
    assert h % th == 0 and w % tw == 0
    ty_t, tx_t = h // th, w // tw
    n_tiles = ty_t * tx_t
    n = centers.shape[0]
    r = jnp.float32(radius)

    oc = (centers - eye[None, :]).astype(jnp.float32)          # [N, 3] world
    cc = jnp.sum(oc * oc, axis=1) - r * r
    cv = oc @ camera_rot.T                                     # [N, 3] view
    depth = -cv[:, 2]
    safe = depth > (znear + r)
    d = jnp.where(safe, depth, 1.0)
    col = ((cv[:, 0] / d) / (tan_half * aspect) + 1.0) * 0.5 * w - 0.5
    row = (1.0 - (cv[:, 1] / d) / tan_half) * 0.5 * h - 0.5
    # conservative pixel radius: near depth (d - r), scaled by the
    # worst-case off-axis silhouette elongation 1/cos²θ_corner =
    # 1 + tan²θ_corner (a sphere at the frustum corner projects up to
    # that much larger than the on-axis formula predicts)
    elong = 1.0 + tan_half * tan_half * (1.0 + aspect * aspect)
    r_px = elong * r / (d - r) * jnp.maximum(h / (2.0 * tan_half),
                                             w / (2.0 * tan_half * aspect))
    fits = safe & (1.5 * r_px + 2.0 < th)
    tx = jnp.clip((col // tw).astype(jnp.int32), 0, tx_t - 1)
    ty = jnp.clip((row // th).astype(jnp.int32), 0, ty_t - 1)
    tid = jnp.where(fits, ty * tx_t + tx, n_tiles)     # unbinnable -> global

    order = jnp.argsort(tid, stable=True)
    counts = jnp.zeros((n_tiles + 1,), jnp.int32).at[tid[order]].add(
        1, indices_are_sorted=True)
    tile_start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(counts).astype(jnp.int32)])

    # per-tile windows: 3 row-ring ranges (x-ring is contiguous in the
    # x-minor tile order) + the global range
    tys = jnp.arange(ty_t, dtype=jnp.int32)[:, None]           # [TY, 1]
    txs = jnp.arange(tx_t, dtype=jnp.int32)[None, :]           # [1, TX]
    wins = []
    for dy in (-1, 0, 1):
        oky = (tys + dy >= 0) & (tys + dy < ty_t)
        nty = jnp.clip(tys + dy, 0, ty_t - 1)
        x0 = jnp.maximum(txs - 1, 0)
        x1 = jnp.minimum(txs + 1, tx_t - 1)
        s = tile_start[nty * tx_t + x0]
        e = tile_start[nty * tx_t + x1 + 1]
        wins.append(jnp.where(oky, s, 0).reshape(-1))
        wins.append(jnp.where(oky, e, 0).reshape(-1))
    gs = jnp.broadcast_to(tile_start[n_tiles], (n_tiles,))
    ge = jnp.broadcast_to(jnp.int32(n), (n_tiles,))
    wins = jnp.stack(wins + [gs, ge], axis=-1)                 # [T, 8]
    pad8 = (-n_tiles) % 8
    wins = jnp.pad(wins, ((0, pad8), (0, 0)))

    ocb = jnp.concatenate([oc[order].T, cc[order][None]], axis=0)  # [4, N]
    return wins, ocb, order.astype(jnp.int32)


def sphere_raster_tiled_binned(wins: jnp.ndarray, ocb: jnp.ndarray,
                               order: jnp.ndarray, dirs: jnp.ndarray, znear,
                               tile_h: int = 8,
                               interpret: Optional[bool] = None,
                               return_oc: bool = False):
    """Kernel half of :func:`sphere_raster_tiled`: consume prebuilt bins
    (from :func:`tiled_prologue`, possibly computed batched across worlds)
    and return ``(tmin, inst)`` in original instance ids.

    ``return_oc=True`` instead returns ``(tmin, hit, oc)`` — ``hit``
    [h, w] bool and ``oc`` [3, h, w] the WINNING sphere's eye-relative
    center, tracked inside the sweep. This skips BOTH post-kernel
    gathers (the ``order`` remap and the caller's center lookup), the
    dominant per-world render cost at datagen scales (~7 ns/elem TPU
    gather floor × 4 planes × 65k pixels); original instance ids are
    not recoverable in this mode.

    Beyond ``MAX_INSTANCES`` the instance table no longer fits SMEM in
    one piece; the kernel switches to a ``(tiles, chunks)`` grid whose
    per-step SMEM block is one ``MAX_INSTANCES``-column slice, with each
    tile's candidate ranges pre-intersected per chunk — bit-identical
    results (same global candidate order), unbounded N."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = dirs.shape[-2:]
    th, tw = tile_h, 128
    ty_t, tx_t = h // th, w // tw
    n_tiles = ty_t * tx_t
    n = order.shape[0]
    scal = jnp.asarray([znear], jnp.float32)
    n_outs = 5 if return_oc else 2
    out_specs = tuple(
        pl.BlockSpec((th, tw),
                     lambda t, *c: (t // tx_t, jax.lax.rem(t, tx_t)))
        for _ in range(n_outs))
    out_shape = (
        jax.ShapeDtypeStruct((h, w), jnp.float32),
        jax.ShapeDtypeStruct((h, w), jnp.int32),
    ) + tuple(jax.ShapeDtypeStruct((h, w), jnp.float32)
              for _ in range(n_outs - 2))
    dirs_spec = pl.BlockSpec((3, th, tw),
                             lambda t, *c: (0, t // tx_t,
                                            jax.lax.rem(t, tx_t)))
    if n <= MAX_INSTANCES:
        kernel = functools.partial(_tiled_kernel, th=th, tw=tw,
                                   tx_tiles=tx_t)
        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),         # znear
                pl.BlockSpec((8, 8), lambda t: (t // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),         # oc table
                dirs_spec,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(scal, wins, ocb, dirs)
        tmin, inst_sorted = outs[:2]
    else:
        # half the single-piece budget per block: Mosaic double-buffers
        # blocked inputs across grid steps, so the in-flight SMEM
        # footprint is ~2 blocks — 2 x 128 KB keeps it at the proven
        # single-table budget
        ch = MAX_INSTANCES // 2
        n_chunks = -(-n // ch)
        pad = n_chunks * ch - n
        # pad columns miss every ray (cc = +inf) and sit past every range
        ocb_p = jnp.pad(ocb, ((0, 0), (0, pad)),
                        constant_values=jnp.inf)
        # per-chunk ranges: intersect each absolute [start, end) with the
        # chunk span and rebase (empty where disjoint)
        lo = (jnp.arange(n_chunks, dtype=jnp.int32) * ch)[:, None, None]
        wins_c = jnp.clip(wins[None], lo, lo + ch) - lo    # [C, T8, 8]
        kernel = functools.partial(_tiled_kernel_chunked, th=th, tw=tw,
                                   tx_tiles=tx_t, chunk=ch)
        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles, n_chunks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),         # znear
                pl.BlockSpec((1, 8, 8), lambda t, c: (c, t // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((4, ch), lambda t, c: (0, c),
                             memory_space=pltpu.SMEM),
                dirs_spec,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(scal, wins_c, ocb_p, dirs)
        tmin, inst_sorted = outs[:2]
    hit = inst_sorted >= 0
    if return_oc:
        return tmin, hit, jnp.stack(outs[2:], axis=0)
    inst = jnp.where(hit, order[jnp.clip(inst_sorted, 0, n - 1)], -1)
    return tmin, inst


@functools.partial(jax.jit,
                   static_argnames=("tile_h", "interpret", "return_oc"))
def sphere_raster_tiled(camera_rot: jnp.ndarray, eye: jnp.ndarray,
                        dirs: jnp.ndarray, centers: jnp.ndarray, radius,
                        znear, tan_half, aspect,
                        tile_h: int = 8,
                        interpret: Optional[bool] = None,
                        return_oc: bool = False):
    """Tile-binned nearest ray-sphere hit (same contract as
    :func:`sphere_raster`, ~5-10× less VPU work at datagen scales).

    Instances are binned by the screen tile of their projected center
    (sorted by tile id + histogram/cumsum ranges — the broadphase trick in
    2-D); each ``(tile_h, 128)`` pixel tile tests only instances whose
    center lies in its 3-row × 3-column tile ring. Instances that project
    too large for the ring (close-ups), sit closer than ``znear + r``, or
    lie behind the camera go to a GLOBAL range appended at the sorted
    array's end that every tile also tests — an exact fallback, so the
    binned path drops nothing, ever. The binning margin accounts for the
    off-axis silhouette elongation (1/cos² of the frustum corner angle)
    and uses the sphere's NEAR depth, so it stays conservative at wide
    FOV, not just the default camera.

    Hit resolution matches :func:`sphere_raster` except on EXACT float
    ties in hit distance t: the untiled kernel keeps the lowest original
    instance id, this one the lowest bin-sorted index. Coincident-t
    spheres (measure-zero except in symmetric synthetic scenes) may
    therefore resolve differently; everything else is bit-equal.

    ``camera_rot`` [3,3] world→view, ``dirs`` [3, H, W] normalized world
    rays (pixel_rays convention: row 0 = NDC y=+1).
    """
    h, w = dirs.shape[-2:]
    # no instance cap: beyond MAX_INSTANCES the binned kernel runs its
    # chunked-table grid (see sphere_raster_tiled_binned)
    wins, ocb, order = tiled_prologue(camera_rot, eye, centers, radius,
                                      znear, tan_half, aspect, h, w, tile_h)
    return sphere_raster_tiled_binned(wins, ocb, order, dirs, znear, tile_h,
                                      interpret, return_oc=return_oc)
