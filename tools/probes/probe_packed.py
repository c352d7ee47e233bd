"""Adopt-or-refute probe: PACKED CANDIDATE ENCODING (VERDICT r4 item 2,
the last untried lever against the granular/SC dense-mask walls).

The idea family: have the rebuild emit packed per-block candidate
structures so the substep touches exactly the real candidates instead of
masking a dense [B, S] slab (~15x padded at 1M granular).  Every variant
reduces to one of two per-substep index-resolution patterns, because
positions move every substep while the packing is only recomputed every
K-substep rebuild:

  (a) per-particle Verlet gather — idx [N, M]; substep gathers M
      candidates per particle (`granular._frozen_substep`, the round-2
      XLA path the slab kernel replaced);
  (b) block-ghost refresh — the rebuild materializes per-block candidate
      index lists (union of the block's windows, ~1.5x duplication at
      granular densities); each substep refreshes the ghost copies with
      ONE big near-sorted gather of ~1.5N rows, then the kernel does
      dense math on [B, ~B*1.5] packed slabs (~5x less VPU work than
      the current 3x640-column slabs).

Both stand or fall on the TPU gather floor. This probe measures it for
exactly these two shapes, on-chip, against the budget of the current
kernel (whole 1M substep ≈ 27 ms END-TO-END incl. amortized rebuild;
the dense-math share a packed slab could shave is only ~5-7 ms).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
key = jax.random.PRNGKey(0)
pos = jax.random.normal(key, (3, N), jnp.float32)
vel = jax.random.normal(jax.random.fold_in(key, 1), (3, N), jnp.float32)


def timeit(tag, fn, *args, iters=8):
    out = jax.jit(fn)(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
    f = jax.jit(fn)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
        best = min(best, (time.time() - t0) / iters)
    print(f"{tag:44s} {best*1e3:9.2f} ms", flush=True)
    return best


# (a) per-particle Verlet gather, M=32: window-local near-diagonal indices
M = 32
base = jnp.arange(N, dtype=jnp.int32)[:, None]
off = jax.random.randint(jax.random.fold_in(key, 2), (N, M), -384, 384)
idx_a = jnp.clip(base + off, 0, N - 1)


def verlet_gather(p, v, idx):
    # the 6-plane candidate fetch of a frozen-list substep
    return p[:, idx], v[:, idx]


ta = timeit(f"(a) Verlet gather idx[N,{M}] -> 6 planes", verlet_gather,
            pos, vel, idx_a, iters=2)
print(f"    = {ta / (N * M) * 1e9:.2f} ns/candidate-row; substep floor "
      f"{ta*1e3:.1f} ms vs 27 ms whole current step", flush=True)

# (b) block-ghost refresh: G = 1.5N near-sorted indices (block unions
# overlap their neighbors), one gather per substep
G = N + N // 2
gidx = jnp.sort(jax.random.randint(jax.random.fold_in(key, 3), (G,), 0,
                                   N).astype(jnp.int32))


def ghost_refresh(p, v, idx):
    return p[:, idx], v[:, idx]


tb = timeit("(b) ghost refresh idx[1.5N] sorted -> 6 planes",
            ghost_refresh, pos, vel, gidx, iters=2)
print(f"    = {tb / G * 1e9:.2f} ns/ghost-row; refresh alone "
      f"{tb*1e3:.1f} ms/substep vs the ~5-7 ms dense-math share it "
      "could save", flush=True)

# reference point: one contiguous 6-plane copy of the same volume (the
# slab DMA the current kernel does instead, as XLA ops)
def contiguous_copy(p, v):
    return p[:, :G] * 1.0, v[:, :G] * 1.0


pos_pad = jnp.concatenate([pos, pos], axis=1)
vel_pad = jnp.concatenate([vel, vel], axis=1)
tc = timeit("(c) contiguous 6-plane copy, same volume", contiguous_copy,
            pos_pad, vel_pad, iters=8)
print(f"    gather/contiguous ratio: (b)/(c) = {tb/tc:.1f}x", flush=True)
print("done", flush=True)
