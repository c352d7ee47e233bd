"""Probe: decompose the SC contact kernel's 1.47 ms into math vs fixed
(DMA-issue + launch) cost by sweeping slab WIDTH at fixed b256 — DMA
count is unchanged (one A slab + gated B slab per group), only the
dense [256, slab] pair math scales. A linear fit's slope gives
ms-per-column; the intercept is the irreducible DMA/launch floor. This
decides whether a two-level (row-sub-blocked) kernel is worth building:
it can only attack the slope, not the intercept.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state
from wgpu_physics_engine_tpu.models import broadphase, cloth
from wgpu_physics_engine_tpu.ops import granular_pallas

BLOCK = 256
ITERS = 256 if jax.default_backend() == "tpu" else 2
INTERP = jax.default_backend() != "tpu"

H = W = 256
c = cfg.ClothConfig(height=H, width=W)
params = ClothParams.from_config(c)
spec = cloth.default_self_collision_grid(c, skin=0.5 * c.particle_radius)
dt = jnp.float32(1 / 480)

state = cloth.multi_step_self_collide(
    init_cloth_state(c), params, dt,
    256 if not INTERP else 8, spec, rebuild_every=16)

n = H * W
flat_pos = state.pos.reshape(3, n)
flat_vel = state.vel.reshape(3, n)
origin = jnp.min(flat_pos, axis=1) - spec.cell_size
min_dist = 2.0 * params.particle_radius
civ = granular_pallas.civ_bounds(spec, thin=True)
grid = broadphase.build_sorted_grid(flat_pos, flat_vel, spec, origin)


def timeit(tag, fn, *args):
    f = jax.jit(lambda *a: jax.lax.scan(
        lambda carry, _: (fn(*carry), None), a, None, length=ITERS)[0])
    np.asarray(jax.tree.leaves(f(*args))[0])[:1]
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(jax.tree.leaves(f(*args))[0])[:1]
        best = min(best, time.time() - t0)
    per = (best - 0.046) / ITERS * 1e3
    print(f"{tag:32s} {per:8.4f} ms/iter", flush=True)


for slab in (384, 512, 640, 896, 1280):
    n_pad = -(-max(n, slab) // BLOCK) * BLOCK
    pad = n_pad - n
    cidf, off, _ = granular_pallas.build_offsets_civ(
        grid, spec, BLOCK, slab, n_pad, thin=True, stats=False)
    cidc = cidf[:, None]
    cid_row = cidf[None, :]
    sp0 = flat_pos[:, grid.order]
    posc0 = jnp.pad(sp0.T, ((0, pad), (0, 0)), constant_values=1e6)
    pos40 = jnp.concatenate(
        [jnp.pad(sp0, ((0, 0), (0, pad)), constant_values=1e6), cid_row])

    def kernel_only(pos4, posc, _off=off, _cidc=cidc, _cid_row=cid_row,
                    _slab=slab):
        f = granular_pallas.contact_forces_sorted(
            pos4, posc, _cidc, _off, min_dist, params.k_contact,
            block=BLOCK, slab=_slab, n_real=n, interpret=INTERP,
            thin=True, civ=civ)
        return (pos4 + 1e-30 * jnp.concatenate([f.T, _cid_row]),
                posc + 1e-30 * f)

    timeit(f"contact kernel s{slab}", kernel_only, pos40, posc0)

print("done", flush=True)
