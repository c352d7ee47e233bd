"""Probe: thin-only (no mxu) granular CIV at 1M — perf, drops, fidelity.

probe_mxu g2 measured thin+mxu s640 at 3.72e7 p-steps/s, but mxu's
recentered-matmul d2 is fidelity-broken (SC K=32+mxu maxdev 43.5 vs the
0.16 chaotic floor in probe_fid32). Before flipping bench to thin we
need thin WITHOUT mxu: perf at s512/s640, drops, and short+long-horizon
deviation vs the base 9-group CIV path (same K, so deviation isolates
the thin pair-sum reordering, not the frozen-window approximation).
"""
import time
import jax, jax.numpy as jnp
import numpy as np

from wgpu_physics_engine_tpu.models import granular

N = 1_000_000
DT = jnp.float32(1 / 240)

g = lambda **kw: granular.GranularConfig(num_particles=N, rebuild_every=16,
                                         **kw)


def time_g(tag, cfg, n_steps=64):
    state = granular.init_state(cfg, jax.random.PRNGKey(0))
    np.asarray(granular.multi_step(state, cfg, DT, n_steps).pos[:1, :1])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(granular.multi_step(state, cfg, DT, n_steps).pos[:1, :1])
        best = min(best, time.time() - t0)
    print(f"{tag:42s} {best/n_steps*1e3:7.2f} ms/step  rate {N*n_steps/best:.3e}",
          flush=True)


def drops_g(tag, cfg, n_steps=16):
    state = granular.init_state(cfg, jax.random.PRNGKey(0))
    _, d = granular.multi_step(state, cfg, DT, n_steps, return_stats=True)
    print(f"{tag:42s} dropped={int(d)}", flush=True)


time_g("g thin K16 s512", g(pallas_slab=512, thin=True))
time_g("g thin K16 s640", g(pallas_slab=640, thin=True))
drops_g("g thin s512 drops", g(pallas_slab=512, thin=True))
drops_g("g thin s640 drops", g(pallas_slab=640, thin=True))

# fidelity: thin vs base at identical K — short horizon (pre-chaos)
# should be tiny (pair-sum reordering only); long horizon should sit at
# the chaotic saturation level, NOT blow past the box scale like mxu.
base_cfg = g(pallas_slab=256)
thin_cfg = g(pallas_slab=640, thin=True)
state = granular.init_state(base_cfg, jax.random.PRNGKey(0))
for steps in (16, 128, 512):
    pb = np.asarray(granular.multi_step(state, base_cfg, DT, steps).pos)
    pt = np.asarray(granular.multi_step(state, thin_cfg, DT, steps).pos)
    d = np.abs(pb - pt)
    print(f"thin-vs-base {steps:4d} steps: maxdev={d.max():.3e} "
          f"meandev={d.mean():.3e}", flush=True)
print("done", flush=True)
