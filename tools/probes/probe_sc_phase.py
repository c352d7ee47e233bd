"""SC phase profile at 256²: rebuild / contact kernel / glue / spring
kernel, each timed as a scan of ITERS calls inside ONE jit (amortizes the
~46 ms axon dispatch). Mirrors models/cloth._self_collide_block's layout
exactly — keep in sync when that changes.

Usage: python tools/probes/probe_sc_phase.py [block] [slab]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state
from wgpu_physics_engine_tpu.models import broadphase, cloth
from wgpu_physics_engine_tpu.ops import cloth_pallas, granular_pallas

BLOCK = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SLAB = int(sys.argv[2]) if len(sys.argv) > 2 else 640
ITERS = 256 if jax.default_backend() == "tpu" else 2
INTERP = jax.default_backend() != "tpu"

H = W = 256
c = cfg.ClothConfig(height=H, width=W)
params = ClothParams.from_config(c)
spec = cloth.default_self_collision_grid(c, skin=0.5 * c.particle_radius)
dt = jnp.float32(1 / 480)

# settle into a contact-rich draped state first (like the bench trajectory)
state = cloth.multi_step_self_collide(
    init_cloth_state(c), params, dt,
    256 if not INTERP else 8, spec, rebuild_every=16)

n = H * W
flat_pos = state.pos.reshape(3, n)
flat_vel = state.vel.reshape(3, n)
origin = jnp.min(flat_pos, axis=1) - spec.cell_size
n_pad = -(-max(n, SLAB) // BLOCK) * BLOCK
pad = n_pad - n
min_dist = 2.0 * params.particle_radius
civ = granular_pallas.civ_bounds(spec, thin=True)


def timeit(tag, fn, *args):
    f = jax.jit(lambda *a: jax.lax.scan(
        lambda carry, _: (fn(*carry), None), a, None, length=ITERS)[0])
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])[:1]
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(jax.tree.leaves(f(*args))[0])[:1]
        best = min(best, time.time() - t0)
    per = (best - 0.046) / ITERS * 1e3
    print(f"{tag:32s} {per:8.4f} ms/iter", flush=True)
    return out


# --- phase 1: rebuild (sorted grid + CIV offsets) --------------------------
def rebuild(p, v):
    grid = broadphase.build_sorted_grid(p, v, spec, origin)
    cidf, off, _ = granular_pallas.build_offsets_civ(
        grid, spec, BLOCK, SLAB, n_pad, thin=True, stats=False)
    # fold outputs back into carry shapes (dummy; keeps scan well-typed)
    return (p + 0.0 * cidf[0], v + 0.0 * off[0, 0])


timeit("rebuild (grid+CIV)", rebuild, flat_pos, flat_vel)

# fixed rebuild products for the per-substep phases
grid = broadphase.build_sorted_grid(flat_pos, flat_vel, spec, origin)
cidf, off, _ = granular_pallas.build_offsets_civ(
    grid, spec, BLOCK, SLAB, n_pad, thin=True, stats=False)
cidc = cidf[:, None]
cid_row = cidf[None, :]
order = grid.order
inv = jnp.argsort(order, stable=True)


# --- phase 2: glue only (permute in, build operands, permute out) ----------
def glue(p3hw):
    sp = p3hw.reshape(3, n)[:, order]
    posc = jnp.pad(sp.T, ((0, pad), (0, 0)), constant_values=1e6)
    pos4 = jnp.concatenate(
        [jnp.pad(sp, ((0, 0), (0, pad)), constant_values=1e6), cid_row])
    # stand-in for the kernel output (keeps both operands + the output
    # transpose/inverse-gather live; 1e-30 scale defeats DCE without
    # changing the carry)
    f_sorted = posc[:n] + pos4[:3, :n].T
    back = f_sorted.T[:, inv].reshape(3, H, W)
    return (p3hw + 1e-30 * back,)


timeit("glue (permutes+operands)", glue, state.pos)


# --- phase 3: contact kernel (operands prebuilt, kernel only) ---------------
sp0 = flat_pos[:, order]
posc0 = jnp.pad(sp0.T, ((0, pad), (0, 0)), constant_values=1e6)
pos40 = jnp.concatenate(
    [jnp.pad(sp0, ((0, 0), (0, pad)), constant_values=1e6), cid_row])


def kernel_only(pos4, posc):
    f = granular_pallas.contact_forces_sorted(
        pos4, posc, cidc, off, min_dist, params.k_contact,
        block=BLOCK, slab=SLAB, n_real=n, interpret=INTERP,
        thin=True, civ=civ)
    # recycle f into the carry so the scan can't hoist the kernel
    return (pos4 + 1e-30 * jnp.concatenate([f.T, cid_row]),
            posc + 1e-30 * f)


timeit("contact kernel", kernel_only, pos40, posc0)


# --- phase 4: fused spring kernel -------------------------------------------
f0 = jnp.zeros_like(state.pos)


def spring(s):
    return (cloth_pallas.substep_with_force(s, params, dt, f0,
                                            interpret=INTERP),)


timeit("spring kernel (substep)", spring, state)


# --- phase 5: whole substep (reference) --------------------------------------
def whole(s):
    sp = s.pos.reshape(3, n)[:, order]
    posc = jnp.pad(sp.T, ((0, pad), (0, 0)), constant_values=1e6)
    pos4 = jnp.concatenate(
        [jnp.pad(sp, ((0, 0), (0, pad)), constant_values=1e6), cid_row])
    f_sorted = granular_pallas.contact_forces_sorted(
        pos4, posc, cidc, off, min_dist, params.k_contact,
        block=BLOCK, slab=SLAB, n_real=n, interpret=INTERP,
        thin=True, civ=civ)
    f_self = f_sorted[:n].T[:, inv].reshape(3, H, W)
    return (cloth_pallas.substep_with_force(s, params, dt, f_self,
                                            interpret=INTERP),)


timeit("whole substep", whole, state)
print("done", flush=True)
