"""Headless batched rasterizer (replaces the reference's wgpu render
pipelines, L4): pure-function render passes over an explicit framebuffer.

Design (SURVEY §7): the scene's spheres (the globe and every cloth/particle
instance — the reference draws ALL of them as instanced UV-sphere meshes,
cloth.rs:1350-1379) are rendered **analytically** by per-pixel ray-sphere
intersection instead of rasterizing 48k-index meshes 3,600 times. That
replaces the reference's ~174M vertex shades/frame with two small matmuls
(pixels × instances dot products ride the MXU) plus a min-reduction, and is
exact — a ray-traced sphere is the limit of the tessellated one. A general
z-buffered triangle rasterizer covers arbitrary meshes (cube apps, custom
geometry).

Depth convention: NDC z in [0, 1], test = Less (wgpu Depth32Float contract,
cloth.rs:749-770). Each pass reads and returns a :class:`Framebuffer`, the
functional analog of a wgpu render pass.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import config as cfg
from . import shading, texture as tex_mod
from .camera import Camera, pixel_rays


class Framebuffer(NamedTuple):
    color: jnp.ndarray   # [H, W, 3] float32
    depth: jnp.ndarray   # [H, W] float32 (NDC z, 1.0 = far/clear)


def clear(height: int, width: int, color=(0.05, 0.05, 0.08)) -> Framebuffer:
    """Clear pass (Runner's clear color + depth=max, reference L0)."""
    c = jnp.broadcast_to(jnp.asarray(color, jnp.float32), (height, width, 3))
    return Framebuffer(color=c, depth=jnp.ones((height, width), jnp.float32))


def _ndc_z(view_z: jnp.ndarray, camera: Camera) -> jnp.ndarray:
    """View-space z (negative in front) → NDC depth in [0, 1]."""
    p22 = camera.proj[2, 2]
    p23 = camera.proj[2, 3]
    return (p22 * view_z + p23) / (-view_z)


def _safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """``sqrt(maximum(x, 0))`` with a finite backward pass everywhere.

    The renderer's XLA paths are differentiable (inverse rendering —
    examples/inverse_rendering.py); the naked form's d sqrt/dx|0 = inf
    turns into NaN cotangents for every MISSED ray (0-cotangent · inf),
    poisoning gradients of hit pixels through shared reductions."""
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def _sphere_uv(rel: jnp.ndarray, radius) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference sphere parametrization (sphere_vertices.rs:34-54) with
    pole-safe gradients: ``arcsin`` never sees ±1 and ``arctan2`` never
    sees (0, 0) on the backward pass. Primal-identical to the naked form
    (the pole pixel's u = 0, v ∈ {0, 1} either way)."""
    z_over_r = jnp.clip(rel[2] / jnp.float32(radius), -1.0, 1.0)
    interior = jnp.abs(z_over_r) < 1.0
    asv = jnp.arcsin(jnp.where(interior, z_over_r, 0.0))
    v = jnp.where(interior, (jnp.pi / 2.0 - asv) / jnp.pi,
                  jnp.where(z_over_r > 0, 0.0, 1.0))
    r2xy = rel[0] * rel[0] + rel[1] * rel[1]
    off_pole = r2xy > 0
    theta = jnp.arctan2(jnp.where(off_pole, rel[1], 0.0),
                        jnp.where(off_pole, rel[0], 1.0))
    u = jnp.mod(theta / (2.0 * jnp.pi), 1.0)
    return u, v


def _view_rot(camera: Camera) -> jnp.ndarray:
    return camera.view[:3, :3]


def _light_view(camera: Camera, light: cfg.LightConfig) -> jnp.ndarray:
    """Light position transformed to view space (globe_shader.wgsl:91)."""
    lp = jnp.asarray(light.position, jnp.float32)
    return camera.view[:3, :3] @ lp + camera.view[:3, 3]


# ---------------------------------------------------------------------------
# Analytic sphere passes
# ---------------------------------------------------------------------------

def draw_globe(fb: Framebuffer, camera: Camera, radius,
               texture: jnp.ndarray, light: cfg.LightConfig,
               compute_specular=None, center=(0.0, 0.0, 0.0)) -> Framebuffer:
    """Lit, textured sphere at ``center`` — the analytic equivalent of the
    globe render pipeline (cloth.rs:705-773 + globe_shader.wgsl).

    UV matches the reference mesh parametrization (sphere_vertices.rs:34-54):
    polar axis +z, u = θ/2π (θ = atan2(y, x)), v = (π/2 − asin(z/r))/π.
    """
    h, w = fb.depth.shape
    eye, dirs = pixel_rays(camera, h, w)              # [3], [3,H,W]
    center = jnp.asarray(center, jnp.float32)
    oc = center - eye                                  # [3]
    b = jnp.einsum("i,ihw->hw", oc, dirs)
    cc = jnp.dot(oc, oc)
    disc = b * b - (cc - jnp.float32(radius) ** 2)
    hit = (disc > 0.0)
    sq = _safe_sqrt(disc)
    t = b - sq
    hit = hit & (t > camera.znear)

    p_world = eye[:, None, None] + t[None] * dirs      # [3,H,W]
    rel = p_world - center[:, None, None]
    n_world = rel / jnp.float32(radius)

    rot = _view_rot(camera)
    p_view = jnp.einsum("ij,jhw->ihw", rot, p_world - eye[:, None, None])
    n_view = jnp.einsum("ij,jhw->ihw", rot, n_world)

    # UV from the reference parametrization (pole-safe gradients)
    u, v = _sphere_uv(rel, radius)
    albedo = tex_mod.sample(texture, u, v)

    color = shading.phong(p_view, n_view, albedo, _light_view(camera, light),
                          light, compute_specular)

    # masked pixels carry garbage view-z; pin them finite so the division's
    # backward pass stays NaN-free (win is False there either way)
    zn = _ndc_z(jnp.where(hit, p_view[2], -1.0), camera)
    win = hit & (zn < fb.depth)
    return Framebuffer(
        color=jnp.where(win[..., None], color, fb.color),
        depth=jnp.where(win, zn, fb.depth),
    )


def draw_instanced_spheres(
    fb: Framebuffer, camera: Camera, centers: jnp.ndarray, radius,
    light: cfg.LightConfig,
    flat_color: Optional[Tuple[float, float, float]] = (1.0, 0.0, 0.0),
    texture: Optional[jnp.ndarray] = None,
    lit: bool = False,
    chunk: int = 512,
    use_kernel: Optional[bool] = None,
    binned=None,
) -> Framebuffer:
    """Instanced sphere pass — the analytic replacement for the cloth/
    particle instanced draw (cloth.rs:1366-1379; 3,600 instances × 48,384
    indices in the reference).

    ``centers``: [N, 3]. Modes, mirroring the reference fragment shaders:
    default ``flat_color`` red (cloth_instances.wgsl:81); ``texture`` without
    ``lit`` = unlit texture sample (instances_shader.wgsl:70-77); ``lit`` =
    Phong (the commented-out path of instances_shader.wgsl:80-112).

    Nearest hit over N instances via chunked min-reduction; the per-chunk
    ray·center dot products are one [P,3]×[3,K] matmul (MXU).

    ``binned``: optional precomputed ``(wins, ocb, order)`` from
    ``ops.raster_pallas.tiled_prologue`` — batched renderers (datagen)
    compute the binning for ALL worlds in one vmapped program and hand
    each world's tables in here, skipping the per-world XLA prologue.
    """
    h, w = fb.depth.shape
    eye, dirs = pixel_rays(camera, h, w)
    p = h * w
    n = centers.shape[0]

    if use_kernel is None:
        from ..ops import raster_pallas

        # beyond MAX_INSTANCES only the tile-binned kernel (chunked
        # instance table) can run — the untiled kernel's SMEM table is
        # single-piece, so oddly-sized framebuffers fall back to XLA
        use_kernel = (jax.default_backend() == "tpu"
                      and (n <= raster_pallas.MAX_INSTANCES
                           or (h % 16 == 0 and w % 128 == 0)))

    oc_hw = None            # [3, h, w] winner eye-relative centers, if fused
    if use_kernel or binned is not None:
        from ..ops import raster_pallas

        if binned is not None:
            # fused winner-center mode: the kernel tracks the hit sphere's
            # eye-relative center, so the composite needs NO gather from
            # the instance table (the gathers, not the sweep, dominate the
            # per-world render at datagen scales). cen = eye + oc differs
            # from the gathered center by ≤1 ulp of the subtraction in
            # tiled_prologue — inside every draw-level tolerance.
            tmin_hw, hit_hw, oc_hw = raster_pallas.sphere_raster_tiled_binned(
                *binned, dirs, camera.znear, return_oc=True)
        elif h % 16 == 0 and w % 128 == 0:
            # tile-binned: each (16, 128) pixel tile tests only instances
            # whose projected center lands in its tile ring (~5-10x less
            # VPU work; bit-exact vs the untiled kernel incl. a global
            # fallback range for close/behind-camera instances)
            tmin_hw, hit_hw, oc_hw = raster_pallas.sphere_raster_tiled(
                camera.view[:3, :3], eye, dirs, centers, radius,
                camera.znear, jnp.tan(camera.fovy_rad / 2.0), camera.aspect,
                return_oc=True)
        else:
            tmin_hw, inst_hw = raster_pallas.sphere_raster(
                eye, dirs, centers, radius, camera.znear)
        if oc_hw is not None:
            tmin = tmin_hw.reshape(p)
            hit = hit_hw.reshape(p)
        else:
            tmin = tmin_hw.reshape(p)
            inst = inst_hw.reshape(p)
            hit = inst >= 0
    else:
        d = dirs.reshape(3, p).T                        # [P, 3]
        r2 = jnp.float32(radius) ** 2
        pad = (-n) % chunk
        cpad = jnp.pad(centers, ((0, pad), (0, 0)))
        valid0 = jnp.arange(n + pad) < n
        cpadc = cpad.reshape(-1, chunk, 3)
        validc = valid0.reshape(-1, chunk)

        def body(carry, inp):
            tmin, inst = carry
            cen, val, ci = inp                          # [K,3], [K], scalar
            oc = cen - eye[None, :]                     # [K,3]
            b = d @ oc.T                                # [P,K]  (MXU)
            cc = jnp.sum(oc * oc, axis=1)               # [K]
            disc = b * b - (cc[None, :] - r2)
            sq = _safe_sqrt(disc)
            t = b - sq
            ok = (disc > 0.0) & (t > camera.znear) & val[None, :]
            t = jnp.where(ok, t, jnp.inf)
            k = jnp.argmin(t, axis=1)                   # [P] chunk-local winner
            tc = jnp.take_along_axis(t, k[:, None], axis=1)[:, 0]
            better = tc < tmin
            inst = jnp.where(better, ci * chunk + k, inst)
            return (jnp.where(better, tc, tmin), inst), None

        n_chunks = cpadc.shape[0]
        carry0 = (jnp.full((p,), jnp.inf, jnp.float32),
                  jnp.zeros((p,), jnp.int32))
        (tmin, inst), _ = jax.lax.scan(
            body, carry0, (cpadc, validc, jnp.arange(n_chunks, dtype=jnp.int32)))
        hit = jnp.isfinite(tmin)

    tmin_g = jnp.where(hit, tmin, 0.0).reshape(h, w)
    hitg = hit.reshape(h, w)
    if oc_hw is not None:
        cen_g = eye[:, None, None] + oc_hw
    else:
        cen_win = jnp.take(centers,
                           jnp.clip(jnp.where(hit, inst, 0), 0, n - 1),
                           axis=0)
        cen_g = cen_win.T.reshape(3, h, w)

    p_world = eye[:, None, None] + tmin_g[None] * dirs
    rel = p_world - cen_g
    n_world = rel / jnp.float32(radius)
    rot = _view_rot(camera)
    p_view = jnp.einsum("ij,jhw->ihw", rot, p_world - eye[:, None, None])

    if texture is not None:
        u, v = _sphere_uv(rel, radius)
        albedo = tex_mod.sample(texture, u, v)
    else:
        albedo = jnp.broadcast_to(jnp.asarray(flat_color, jnp.float32), (h, w, 3))

    if lit:
        n_view = jnp.einsum("ij,jhw->ihw", rot, n_world)
        color = shading.phong(p_view, n_view, albedo,
                              _light_view(camera, light), light)
    else:
        color = albedo

    zn = _ndc_z(jnp.where(hitg, p_view[2], -1.0), camera)
    win = hitg & (zn < fb.depth)
    return Framebuffer(
        color=jnp.where(win[..., None], color, fb.color),
        depth=jnp.where(win, zn, fb.depth),
    )


# ---------------------------------------------------------------------------
# General triangle rasterizer
# ---------------------------------------------------------------------------

class DeviceMesh(NamedTuple):
    """Mesh uploaded as device arrays (the vertex/index buffer analog, L2)."""

    positions: jnp.ndarray   # [V, 3]
    normals: jnp.ndarray     # [V, 3]
    uvs: jnp.ndarray         # [V, 2]
    tris: jnp.ndarray        # [T, 3] int32
    colors: Optional[jnp.ndarray] = None

    @classmethod
    def from_host(cls, mesh) -> "DeviceMesh":
        return cls(
            positions=jnp.asarray(mesh.positions),
            normals=jnp.asarray(mesh.normals),
            uvs=jnp.asarray(mesh.uvs),
            tris=jnp.asarray(mesh.indices, jnp.int32).reshape(-1, 3),
            colors=None if mesh.colors is None else jnp.asarray(mesh.colors),
        )


def _edge(ax, ay, bx, by, cx, cy):
    return (cx - ax) * (by - ay) - (cy - ay) * (bx - ax)


def _tri_setup(tris, sx, sy, wclip, znear, cull_backface):
    """Per-triangle screen-space setup shared by the brute and tiled
    resolvers: vertex screen coords, signed area, and the front-facing +
    in-front-of-near validity mask."""
    i0, i1, i2 = tris[:, 0], tris[:, 1], tris[:, 2]
    x0, y0 = sx[i0], sy[i0]
    x1, y1 = sx[i1], sy[i1]
    x2, y2 = sx[i2], sy[i2]
    area = _edge(x0, y0, x1, y1, x2, y2)
    # CCW-in-NDC front faces (the reference's FrontFace::Ccw) come out
    # with positive area under this edge function after the y flip.
    front = (area > 0.0) if cull_backface else (area != 0.0)
    front = front & (wclip[i0] > znear) & (wclip[i1] > znear) & \
        (wclip[i2] > znear)
    return (x0, y0, x1, y1, x2, y2), area, front


def _resolve_brute(depth0, sx, sy, sz, wclip, tris, tvalid, znear,
                   px, py, cull_backface, chunk,
                   carry=None):
    """O(pixels × tris) visibility resolve: scan triangle chunks against
    every pixel. ``carry`` continues a resolve started elsewhere (the tiled
    path reuses this for its large-triangle residue)."""
    p = px.shape[0]
    t = tris.shape[0]
    pad = (-t) % chunk
    tris_p = jnp.pad(tris, ((0, pad), (0, 0)))
    tvalid = jnp.pad(tvalid, (0, pad))
    n_chunks = tris_p.shape[0] // chunk
    # carry tri ids must reference the CALLER's triangle numbering, so scan
    # inputs carry their original ids explicitly
    tri_ids = jnp.pad(jnp.arange(t, dtype=jnp.int32), (0, pad))

    def one_chunk(carry, inp):
        depth, win_tri, win_b0, win_b1 = carry
        tr, tv, tid = inp
        (x0, y0, x1, y1, x2, y2), area, front = _tri_setup(
            tr, sx, sy, wclip, znear, cull_backface)
        front = front & tv
        inv_area = 1.0 / jnp.where(area != 0.0, area, 1.0)
        i0, i1, i2 = tr[:, 0], tr[:, 1], tr[:, 2]

        e0 = _edge(x1[None], y1[None], x2[None], y2[None], px[:, None], py[:, None])
        e1 = _edge(x2[None], y2[None], x0[None], y0[None], px[:, None], py[:, None])
        e2 = _edge(x0[None], y0[None], x1[None], y1[None], px[:, None], py[:, None])
        b0 = e0 * inv_area[None]
        b1 = e1 * inv_area[None]
        b2 = e2 * inv_area[None]
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & front[None]
        z = b0 * sz[i0][None] + b1 * sz[i1][None] + b2 * sz[i2][None]
        z = jnp.where(inside, z, jnp.inf)
        kbest = jnp.argmin(z, axis=1)
        zbest = jnp.take_along_axis(z, kbest[:, None], 1)[:, 0]
        better = zbest < depth
        depth = jnp.where(better, zbest, depth)
        win_tri = jnp.where(better, tid[kbest], win_tri)
        win_b0 = jnp.where(better, jnp.take_along_axis(b0, kbest[:, None], 1)[:, 0], win_b0)
        win_b1 = jnp.where(better, jnp.take_along_axis(b1, kbest[:, None], 1)[:, 0], win_b1)
        return (depth, win_tri, win_b0, win_b1), None

    if carry is None:
        carry = (depth0, jnp.full((p,), -1, jnp.int32),
                 jnp.zeros((p,), jnp.float32), jnp.zeros((p,), jnp.float32))
    carry, _ = jax.lax.scan(
        one_chunk, carry,
        (tris_p.reshape(n_chunks, chunk, 3),
         tvalid.reshape(n_chunks, chunk),
         tri_ids.reshape(n_chunks, chunk)))
    return carry


def _resolve_tiled(depth0, sx, sy, sz, wclip, tris, znear, h, w,
                   cull_backface, tile: int, window: int, cand_chunk: int,
                   big_capacity: int):
    """Tile-binned visibility resolve, O(pixels × tris-per-tile).

    TPU-shaped binning (no atomics): each small triangle emits its ≤2×2
    block of ``tile``×``tile`` screen tiles as (tile_id, tri) pairs; the
    pairs are SORTED by tile id and answered as contiguous windows
    (the broadphase.SortedGrid trick applied to screen space). Triangles
    whose AABB spans more than 2 tiles on an axis are rare for dense
    meshes — they're compacted into a ``big_capacity`` list and resolved
    by the brute chunk scan over all pixels.

    Returns ``(depth [P], win_tri, win_b0, win_b1, dropped)`` where
    ``dropped`` counts candidates lost to ``window``/``big_capacity``
    truncation (0 in a correctly-sized render).
    """
    t = tris.shape[0]
    ntx = -(-w // tile)
    nty = -(-h // tile)
    n_tiles = ntx * nty
    tpx = tile * tile
    hp, wp = nty * tile, ntx * tile      # padded screen

    (x0, y0, x1, y1, x2, y2), area, ok = _tri_setup(
        tris, sx, sy, wclip, znear, cull_backface)
    xmin = jnp.minimum(x0, jnp.minimum(x1, x2))
    xmax = jnp.maximum(x0, jnp.maximum(x1, x2))
    ymin = jnp.minimum(y0, jnp.minimum(y1, y2))
    ymax = jnp.maximum(y0, jnp.maximum(y1, y2))
    ok = ok & (xmax >= 0) & (xmin < w) & (ymax >= 0) & (ymin < h)
    tx0 = jnp.clip(jnp.floor(xmin / tile).astype(jnp.int32), 0, ntx - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile).astype(jnp.int32), 0, ntx - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile).astype(jnp.int32), 0, nty - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile).astype(jnp.int32), 0, nty - 1)
    big = ok & ((tx1 - tx0 > 1) | (ty1 - ty0 > 1))
    small = ok & ~big

    # --- bin small tris: 4 emissions (2x2 tile block), sort by tile id ---
    tids = []
    for dy in (0, 1):
        for dx in (0, 1):
            tx = tx0 + dx
            ty = ty0 + dy
            valid = small & (tx <= tx1) & (ty <= ty1)
            tids.append(jnp.where(valid, ty * ntx + tx, n_tiles))
    pair_tid = jnp.concatenate(tids)                       # [4T]
    pair_tri = jnp.tile(jnp.arange(t, dtype=jnp.int32), 4)
    order = jnp.argsort(pair_tid)
    sorted_tid = pair_tid[order]
    sorted_tri = pair_tri[order]
    tile_start = jnp.searchsorted(
        sorted_tid, jnp.arange(n_tiles + 1), side="left").astype(jnp.int32)
    counts = tile_start[1:] - tile_start[:-1]
    dropped = jnp.sum(jnp.maximum(counts - window, 0))

    # --- tile-major pixel layout: [H, W] ↔ [n_tiles, tile*tile] ---
    pxg = (jnp.arange(wp, dtype=jnp.float32) + 0.5)[None, :].repeat(hp, 0)
    pyg = (jnp.arange(hp, dtype=jnp.float32) + 0.5)[:, None].repeat(wp, 1)

    def to_tiles(a):
        return a.reshape(nty, tile, ntx, tile).transpose(0, 2, 1, 3) \
                .reshape(n_tiles, tpx)

    def from_tiles(a):
        return a.reshape(nty, ntx, tile, tile).transpose(0, 2, 1, 3) \
                .reshape(hp, wp)[:h, :w]

    px_t = to_tiles(pxg)
    py_t = to_tiles(pyg)
    d0 = jnp.full((hp, wp), jnp.inf, jnp.float32)
    d0 = d0.at[:h, :w].set(depth0.reshape(h, w))
    depth_t = to_tiles(d0)

    k_idx = jnp.arange(cand_chunk, dtype=jnp.int32)
    start = tile_start[:-1]
    end = tile_start[1:]
    n_steps = -(-window // cand_chunk)
    n_pairs = sorted_tri.shape[0]

    def step(carry, s):
        depth, win_tri, win_b0, win_b1 = carry
        slot = start[:, None] + s * cand_chunk + k_idx[None, :]   # [NT, C]
        valid = slot < end[:, None]
        tri_idx = sorted_tri[jnp.clip(slot, 0, n_pairs - 1)]      # [NT, C]
        tr = tris[tri_idx]                                        # [NT, C, 3]
        i0, i1, i2 = tr[..., 0], tr[..., 1], tr[..., 2]
        cx0, cy0 = sx[i0], sy[i0]
        cx1, cy1 = sx[i1], sy[i1]
        cx2, cy2 = sx[i2], sy[i2]
        careas = _edge(cx0, cy0, cx1, cy1, cx2, cy2)
        inv_area = 1.0 / jnp.where(careas != 0.0, careas, 1.0)
        # [NT, tpx, C] edge evals against this tile's pixels only
        e0 = _edge(cx1[:, None], cy1[:, None], cx2[:, None], cy2[:, None],
                   px_t[:, :, None], py_t[:, :, None])
        e1 = _edge(cx2[:, None], cy2[:, None], cx0[:, None], cy0[:, None],
                   px_t[:, :, None], py_t[:, :, None])
        e2 = _edge(cx0[:, None], cy0[:, None], cx1[:, None], cy1[:, None],
                   px_t[:, :, None], py_t[:, :, None])
        b0 = e0 * inv_area[:, None, :]
        b1 = e1 * inv_area[:, None, :]
        b2 = e2 * inv_area[:, None, :]
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & valid[:, None, :]
        z = b0 * sz[i0][:, None] + b1 * sz[i1][:, None] + b2 * sz[i2][:, None]
        z = jnp.where(inside, z, jnp.inf)
        kbest = jnp.argmin(z, axis=2)                             # [NT, tpx]
        zbest = jnp.take_along_axis(z, kbest[..., None], 2)[..., 0]
        better = zbest < depth
        depth = jnp.where(better, zbest, depth)
        win_tri = jnp.where(
            better, jnp.take_along_axis(tri_idx, kbest, 1), win_tri)
        win_b0 = jnp.where(
            better, jnp.take_along_axis(b0, kbest[..., None], 2)[..., 0], win_b0)
        win_b1 = jnp.where(
            better, jnp.take_along_axis(b1, kbest[..., None], 2)[..., 0], win_b1)
        return (depth, win_tri, win_b0, win_b1), None

    carry0 = (depth_t, jnp.full((n_tiles, tpx), -1, jnp.int32),
              jnp.zeros((n_tiles, tpx), jnp.float32),
              jnp.zeros((n_tiles, tpx), jnp.float32))
    carry, _ = jax.lax.scan(step, carry0,
                            jnp.arange(n_steps, dtype=jnp.int32))
    depth = from_tiles(carry[0]).reshape(-1)
    win_tri = from_tiles(carry[1]).reshape(-1)
    win_b0 = from_tiles(carry[2]).reshape(-1)
    win_b1 = from_tiles(carry[3]).reshape(-1)

    # --- big-triangle residue through the brute scan (compacted) ---
    big_idx = jnp.argsort(~big, stable=True)[:big_capacity]
    big_valid = big[big_idx]
    n_big = jnp.sum(big)
    dropped = dropped + jnp.maximum(n_big - big_capacity, 0)
    px1 = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :].repeat(h, 0).reshape(-1)
    py1 = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None].repeat(w, 1).reshape(-1)
    # remap carry tri ids through big_idx afterwards: run the brute pass on
    # the gathered subset, whose local ids are positions in big_idx
    carry = (depth, win_tri, win_b0, win_b1)
    d2, wt2, b02, b12 = _resolve_brute(
        depth, sx, sy, sz, wclip, tris[big_idx], big_valid, znear,
        px1, py1, cull_backface, min(big_capacity, 256), carry=None)
    taken = (wt2 >= 0) & (d2 < depth)
    depth = jnp.where(taken, d2, depth)
    win_tri = jnp.where(taken, big_idx[jnp.clip(wt2, 0, big_capacity - 1)],
                        win_tri)
    win_b0 = jnp.where(taken, b02, win_b0)
    win_b1 = jnp.where(taken, b12, win_b1)
    return depth, win_tri, win_b0, win_b1, dropped


# Auto-switch to the tiled resolver above this triangle count (the brute
# path is O(pixels × tris); PARITY round-1 flagged ~50k as its limit).
_BINNED_TRI_THRESHOLD = 20_000


def draw_mesh(fb: Framebuffer, camera: Camera, mesh: DeviceMesh,
              model: Optional[jnp.ndarray] = None,
              texture: Optional[jnp.ndarray] = None,
              light: Optional[cfg.LightConfig] = None,
              mode: str = "phong",
              cull_backface: bool = True,
              chunk: int = 256,
              binned: Optional[bool] = None,
              tile: int = 16,
              window: int = 4096,
              cand_chunk: int = 256,
              big_capacity: int = 2048,
              return_stats: bool = False):
    """Z-buffered triangle rasterization with perspective-correct attribute
    interpolation — the general path matching the reference render pipeline
    state (depth Less, back-face culling, CCW front faces; cloth.rs:749-770).

    ``mode``: 'phong' (C6/C16 globe), 'diffuse' (C4 textured cube),
    'color' (C3 flat vertex colors), 'texture' (unlit, C10).

    ``binned`` picks the tile-binned resolver (None = auto above
    ~20k tris): work drops from O(pixels × tris) to O(pixels ×
    tris-per-tile). ``window`` bounds candidate tris per ``tile``×``tile``
    tile; ``return_stats=True`` additionally returns the dropped-candidate
    count (nonzero = undersized window/big_capacity, geometry lost).
    """
    h, w = fb.depth.shape
    verts = mesh.positions
    if model is not None:
        verts = verts @ model[:3, :3].T + model[:3, 3]
    # view/clip transforms
    vview = verts @ camera.view[:3, :3].T + camera.view[:3, 3]
    clip = vview @ camera.proj[:3, :3].T + camera.proj[:3, 3]
    wclip = -vview[:, 2]                              # proj[3] = (0,0,-1,0)
    ndc = clip / wclip[:, None]
    sx = (ndc[:, 0] + 1.0) * 0.5 * w
    sy = (1.0 - ndc[:, 1]) * 0.5 * h
    sz = ndc[:, 2]
    inv_w = 1.0 / wclip

    nview = mesh.normals @ camera.view[:3, :3].T
    if model is not None:
        nview = (mesh.normals @ model[:3, :3].T) @ camera.view[:3, :3].T

    p = h * w
    tris = mesh.tris
    t = tris.shape[0]
    if binned is None:
        binned = t >= _BINNED_TRI_THRESHOLD

    dropped = jnp.int32(0)
    if binned:
        depth, win_tri, win_b0, win_b1, dropped = _resolve_tiled(
            fb.depth.reshape(-1), sx, sy, sz, wclip, tris, camera.znear,
            h, w, cull_backface, tile, window, cand_chunk, big_capacity)
    else:
        px = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :].repeat(h, 0).reshape(-1)
        py = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None].repeat(w, 1).reshape(-1)
        tvalid = jnp.ones((t,), bool)
        depth, win_tri, win_b0, win_b1 = _resolve_brute(
            fb.depth.reshape(-1), sx, sy, sz, wclip, tris, tvalid,
            camera.znear, px, py, cull_backface, chunk)

    hit = win_tri >= 0
    tr = jnp.take(tris, jnp.where(hit, win_tri, 0), axis=0)   # [P,3]
    b0, b1 = win_b0, win_b1
    b2 = 1.0 - b0 - b1

    def interp(attr):
        a0 = jnp.take(attr, tr[:, 0], axis=0)
        a1 = jnp.take(attr, tr[:, 1], axis=0)
        a2 = jnp.take(attr, tr[:, 2], axis=0)
        w0 = (b0 * inv_w[tr[:, 0]])[:, None]
        w1 = (b1 * inv_w[tr[:, 1]])[:, None]
        w2 = (b2 * inv_w[tr[:, 2]])[:, None]
        denom = w0 + w1 + w2
        return (a0 * w0 + a1 * w1 + a2 * w2) / jnp.where(denom != 0, denom, 1.0)

    pv = interp(vview).T.reshape(3, h, w)
    nv = interp(nview).T.reshape(3, h, w)
    uv = interp(mesh.uvs)
    hitg = hit.reshape(h, w)

    if mode == "color":
        color = interp(mesh.colors).reshape(h, w, 3)
    else:
        if texture is not None:
            albedo = tex_mod.sample(
                texture, uv[:, 0].reshape(h, w), uv[:, 1].reshape(h, w))
        else:
            albedo = jnp.ones((h, w, 3), jnp.float32)
        if mode == "texture":
            color = albedo
        elif mode == "diffuse":
            color = shading.diffuse_only(pv, nv, albedo,
                                         _light_view(camera, light), light)
        else:
            color = shading.phong(pv, nv, albedo,
                                  _light_view(camera, light), light)

    zg = depth.reshape(h, w)
    win = hitg
    out = Framebuffer(
        color=jnp.where(win[..., None], color, fb.color),
        depth=jnp.where(win, zg, fb.depth),
    )
    if return_stats:
        return out, dropped
    return out


def draw_lines(fb: Framebuffer, camera: Camera, segments: jnp.ndarray,
               color=(0.0, 0.0, 1.0), px_width: float = 1.0) -> Framebuffer:
    """Line-list pass (wireframe bounds box, C10's wireframe_shader).

    ``segments``: [L, 2, 3] world-space endpoints. Screen-space distance
    test per pixel, depth-tested against the interpolated segment depth.
    """
    h, w = fb.depth.shape
    a = segments[:, 0, :]
    b = segments[:, 1, :]

    def project(v):
        vv = v @ camera.view[:3, :3].T + camera.view[:3, 3]
        wc = -vv[:, 2]
        cl = vv @ camera.proj[:3, :3].T + camera.proj[:3, 3]
        ndc = cl / wc[:, None]
        return (jnp.stack([(ndc[:, 0] + 1) * 0.5 * w,
                           (1 - ndc[:, 1]) * 0.5 * h], 1), ndc[:, 2], wc)

    pa, za, wa = project(a)
    pb, zb, wb = project(b)
    ok = (wa > camera.znear) & (wb > camera.znear)

    px = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :, None]
    py = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None, None]
    ab = pb - pa                                       # [L,2]
    ap_x = px - pa[None, None, :, 0]
    ap_y = py - pa[None, None, :, 1]
    ab2 = jnp.sum(ab * ab, axis=1)
    s = (ap_x * ab[None, None, :, 0] + ap_y * ab[None, None, :, 1]) / jnp.maximum(ab2, 1e-12)
    s = jnp.clip(s, 0.0, 1.0)
    dx = ap_x - s * ab[None, None, :, 0]
    dy = ap_y - s * ab[None, None, :, 1]
    dist2 = dx * dx + dy * dy
    on_line = (dist2 <= (0.5 + px_width / 2) ** 2) & ok[None, None, :]
    z = za[None, None, :] + s * (zb - za)[None, None, :]
    z = jnp.where(on_line, z, jnp.inf)
    zmin = jnp.min(z, axis=2)
    win = (zmin < fb.depth) & jnp.isfinite(zmin)
    c = jnp.asarray(color, jnp.float32)
    return Framebuffer(
        color=jnp.where(win[..., None], c, fb.color),
        depth=jnp.where(win, zmin, fb.depth),
    )
