"""Morton-order A/B for the self-collision broad-phase (VERDICT r3
item 7): does a space-filling-curve cell linearization tighten per-block
window hulls enough to shrink the dense [B, S] kernel math?

The contact kernel's per-substep cost is ~proportional to the DENSE
CANDIDATE MASS: sum over sorted blocks of block · (Σ_groups slab_g),
where slab_g must cover the hull of the block's group-g windows
(128-lane aligned). That mass is a pure data-structure property — it can
be measured exactly, for any ordering, WITHOUT building a kernel. This
probe computes it on the draped 256² cloth state (the production
workload where slab sizing is worst) for:

  A. production row-major cid + THIN 3-group merged windows
     (what the kernel runs today: 3 slabs/block, s640 default);
  B. Morton-on-(x,y) cid (z innermost, so z-triples stay contiguous)
     + full 9-group windows — per-group windows are still single
     contiguous sorted ranges (each (dx,dy) neighbor column is one
     Morton column), hulls via min/max (no monotonicity needed);
  C. row-major + full 9-group windows (context: what thin replaced).

Decision rule: Morton wins only if mass(B) < mass(A) with headroom for
its extra costs (9 DMA issues/block instead of 3, per-particle window
gathers at rebuild — CIV's cid-difference trick needs constant
per-group cid offsets, which Morton breaks, so B pays the
window-formulation rebuild).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state
from wgpu_physics_engine_tpu.models import broadphase, cloth

H = W = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BLOCK = 256
DRAPE = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

c = cfg.ClothConfig(height=H, width=W)
params = ClothParams.from_config(c)
state = init_cloth_state(c)
t0 = time.time()
state = cloth.multi_step(state, params, jnp.float32(1 / 480), DRAPE)
spec = cloth.default_self_collision_grid(c, skin=0.5 * c.particle_radius)
pos = np.asarray(state.pos.reshape(3, H * W))
print(f"draped {DRAPE} substeps in {time.time()-t0:.1f}s; "
      f"grid dims {spec.dims}", flush=True)

n = H * W
d0, d1, d2 = spec.dims
origin = pos.min(axis=1) - spec.cell_size
cell = np.clip(((pos - origin[:, None]) / spec.cell_size).astype(np.int64),
               0, np.array([d0 - 1, d1 - 1, d2 - 1])[:, None])
cx, cy, cz = cell


def interleave2(a, b, bits=16):
    """Morton code: interleave bits of a (even) and b (odd)."""
    out = np.zeros_like(a)
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
    return out


def hull_mass(order_key, col_of_cell, ncols, tag, groups, thin_merge):
    """Sort particles by (column-key, z); for each particle and group,
    the window is [cell_start[col_g*d2 + z0], cell_start[col_g*d2+z1+1])
    (z0/z1 = z-1/z+1 clipped; thin_merge widens to the 3-column y-merge
    of production thin mode). Returns total dense-candidate mass."""
    cid = order_key * d2 + cz
    order = np.argsort(cid, kind="stable")
    scid = cid[order]
    cell_start = np.searchsorted(scid, np.arange(ncols * d2 + 1))
    scx, scy, scz = cx[order], cy[order], cz[order]
    nb = -(-n // BLOCK)
    pad = nb * BLOCK - n
    total = 0
    nslabs = 0
    for g in groups:
        if thin_merge:
            dx = g
            okx = (scx + dx >= 0) & (scx + dx < d0)
            ncx = np.clip(scx + dx, 0, d0 - 1)
            y0 = np.maximum(scy - 1, 0)
            y1 = np.minimum(scy + 1, d1 - 1)
            z0 = np.maximum(scz - 1, 0)
            z1 = np.minimum(scz + 1, d2 - 1)
            lo = (ncx * d1 + y0) * d2 + z0
            hi = (ncx * d1 + y1) * d2 + z1
            s = np.where(okx, cell_start[lo], np.arange(n))
            e = np.where(okx, cell_start[hi + 1], np.arange(n))
        else:
            dx, dy = g
            ok = ((scx + dx >= 0) & (scx + dx < d0) &
                  (scy + dy >= 0) & (scy + dy < d1))
            colg = col_of_cell(np.clip(scx + dx, 0, d0 - 1),
                               np.clip(scy + dy, 0, d1 - 1))
            z0 = np.maximum(scz - 1, 0)
            z1 = np.minimum(scz + 1, d2 - 1)
            s = np.where(ok, cell_start[colg * d2 + z0], np.arange(n))
            e = np.where(ok, cell_start[colg * d2 + z1 + 1], np.arange(n))
        sp = np.pad(s, (0, pad), constant_values=n).reshape(nb, BLOCK)
        ep = np.pad(e, (0, pad), constant_values=n).reshape(nb, BLOCK)
        hull = ep.max(axis=1) - sp.min(axis=1)          # per-block width
        slab = np.maximum(-(-hull // 128) * 128, 128)   # aligned, >= 1 lane
        total += int(slab.sum()) * BLOCK
        nslabs += len(slab)
    print(f"{tag:34s} mass {total/1e9:8.3f} G pair-lanes "
          f"({total / n:8.0f}/particle, {nslabs} slabs)", flush=True)
    return total


# A: production thin 3-group, row-major columns
row_key = cx * d1 + cy
m_a = hull_mass(row_key, None, d0 * d1, "A row-major thin-3 (production)",
                (-1, 0, 1), True)
# C: row-major full 9-group
col_rm = lambda x, y: x * d1 + y
m_c = hull_mass(row_key, col_rm, d0 * d1, "C row-major full-9",
                broadphase.OFFSETS_XY, False)
# B: Morton(x, y) columns, full 9-group. Column index space = morton
# codes up to interleave2(d0-1, d1-1) (sparse but searchsorted handles).
mkey = interleave2(cx, cy)
ncols_m = int(interleave2(np.array([d0 - 1]), np.array([d1 - 1]))[0]) + 1
col_mo = lambda x, y: interleave2(x, y)
m_b = hull_mass(mkey, col_mo, ncols_m, "B morton-xy full-9",
                broadphase.OFFSETS_XY, False)

print(f"\nMorton/production mass ratio: {m_b / m_a:.2f}x "
      f"({'WIN candidate' if m_b < 0.8 * m_a else 'REFUTED'})", flush=True)
print(f"Morton/full-9-row-major ratio: {m_b / m_c:.2f}x", flush=True)
