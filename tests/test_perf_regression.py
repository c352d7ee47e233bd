"""Performance regression floors (SURVEY §4.6): real-TPU throughput
floors for every headline metric, asserted conservatively.

The suite itself runs on the virtual CPU mesh (conftest), so the
measurements happen in clean subprocesses that keep the TPU platform.
The tests run automatically wherever the axon TPU tunnel is present
(``PALLAS_AXON_POOL_IPS`` in the env — the harness's TPU indicator) and
can be forced on/off with ``WPE_TPU_PERF=1`` / ``WPE_TPU_PERF=0``.

Process layout (round 5, tuned for suite wall-clock — each subprocess
start costs 15-40 s of tunnel handshake, so metrics share processes
wherever the co-compile pattern is safe):

* one KERNELS subprocess: cloth fused kernel + granular-1M + SC-256
  floors (same kernel family, safe to co-compile);
* one DATAGEN subprocess and one GRAD subprocess — kept isolated: the
  one-jit datagen pipeline co-compiled with the banded trace/transpose
  kernels is the documented worker-crash pattern (CLAUDE.md; bench.py
  isolates for the same reason);
* one cheap 180 s PREFLIGHT before any of them, cached module-wide —
  with a wedged axon worker every fresh python hangs at interpreter
  start, so without it each test would burn its full 1500 s timeout.

NOTE: never run two TPU processes concurrently (CLAUDE.md) — don't run
the suite while another TPU job is in flight.
"""

import os
import subprocess
import sys

import pytest

_SCRIPT_KERNELS = r"""
import time
import jax, jax.numpy as jnp
import numpy as np
import wgpu_physics_engine_tpu as eng
from wgpu_physics_engine_tpu.ops import cloth_pallas
from wgpu_physics_engine_tpu.models import cloth, granular

# --- fused cloth kernel, 256^2 (the headline) ---
c = eng.ClothConfig(height=256, width=256)
params = eng.ClothParams.from_config(c)
state = eng.init_cloth_state(c)
dt = jnp.float32(1 / 480)
# 6k substeps so the ~46 ms fixed tunnel dispatch doesn't dominate
np.asarray(cloth_pallas.multi_step(state, params, dt, 6_000).pos)
best = float("inf")
for t in range(2):
    st = state._replace(pos=state.pos + jnp.float32(t * 1e-3))
    t0 = time.time()
    np.asarray(cloth_pallas.multi_step(st, params, dt, 6_000).pos)
    best = min(best, time.time() - t0)
print("RATE", 256 * 256 * 6_000 / best, flush=True)

# --- granular 1M, tuned bench schedule ---
gcfg = granular.GranularConfig(num_particles=1_000_000, rebuild_every=16,
                               pallas_slab=640, thin=True)
gstate = granular.init_state(gcfg, jax.random.PRNGKey(0))
gdt = jnp.float32(1 / 240)
np.asarray(granular.multi_step(gstate, gcfg, gdt, 32).pos[:1, :1])
best = float("inf")
for _ in range(2):
    t0 = time.time()
    np.asarray(granular.multi_step(gstate, gcfg, gdt, 32).pos[:1, :1])
    best = min(best, time.time() - t0)
print("GRANULAR_RATE", 1_000_000 * 32 / best, flush=True)

# --- cloth self-collision 256^2, tuned bench schedule ---
spec = cloth.default_self_collision_grid(c, skin=0.5 * c.particle_radius)

def run_sc(s):
    return cloth.multi_step_self_collide(s, params, dt, 256, spec,
                                         rebuild_every=32, pallas_slab=640)

np.asarray(run_sc(state).pos[:1, :1, :1])
best = float("inf")
for t in range(2):
    st = state._replace(pos=state.pos + jnp.float32(t * 1e-3))
    t0 = time.time()
    np.asarray(run_sc(st).pos[:1, :1, :1])
    best = min(best, time.time() - t0)
print("SC_RATE", 256 * 256 * 256 / best, flush=True)
"""

_SCRIPT_GRAD = r"""
import time
import jax, jax.numpy as jnp
import numpy as np
import wgpu_physics_engine_tpu as eng
from wgpu_physics_engine_tpu.models import cloth

# --- banded 256^2 backward (rounds 4-5): grad at kernel rates ---
c = eng.ClothConfig(height=256, width=256)
params = eng.ClothParams.from_config(c)
state = eng.init_cloth_state(c)
dt = jnp.float32(1 / 480)
wp = jax.random.normal(jax.random.PRNGKey(1), state.pos.shape)

def loss(pos, vel):
    out = cloth.multi_step_diff(state._replace(pos=pos, vel=vel),
                                params, dt, 480, segment=64)
    return jnp.sum(out.pos * wp)

vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
g = vg(state.pos, state.vel)
np.asarray(g[1][0][:1, :1, :1])
best = float("inf")
for _ in range(3):
    t0 = time.time()
    g = vg(state.pos, state.vel)
    np.asarray(g[1][0][:1, :1, :1])
    best = min(best, time.time() - t0)
print("GRAD_RATE", 256 * 256 * 480 / best)
"""

_SCRIPT_DATAGEN = r"""
import time
import jax, jax.numpy as jnp
import numpy as np
import wgpu_physics_engine_tpu as eng

# --- datagen device pipeline (round 4): ms/world at 512 worlds ---
from wgpu_physics_engine_tpu.parallel import codec, datagen
from wgpu_physics_engine_tpu.render import texture as T

cd = eng.ClothConfig()
key = jax.random.key(0)
batch = datagen.randomized_worlds(cd, 512, key)
cams = datagen.randomized_cameras(512, jax.random.fold_in(key, 7))
tex = T.pack_rgb8(T.get("mesh", max_size=256))
base = datagen.globe_base_fbs(cams, batch.params, tex)
np.asarray(jax.tree.leaves(base)[0][:1, :1, :1])

def run():
    return codec.encode(datagen.step_and_render(
        batch, jnp.float32(1 / cd.hz), 24, cams, tex, base_fb=base)[1],
        k=16)

o = run(); np.asarray(o[:1, :1, :1, :1, :1])
best = float("inf")
for _ in range(3):
    t0 = time.time(); o = run(); np.asarray(o[:1, :1, :1, :1, :1])
    best = min(best, time.time() - t0)
print("DATAGEN_MS", best / 512 * 1e3)
"""


def _tpu_available() -> bool:
    """Detect the TPU environment WITHOUT initializing a jax backend in
    this (CPU-forced) process: the harness exposes the axon tunnel via
    PALLAS_AXON_POOL_IPS."""
    flag = os.environ.get("WPE_TPU_PERF")
    if flag is not None:
        return flag == "1"
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


_PREFLIGHT: dict = {}


def _tpu_preflight() -> str:
    """One cheap shared health probe before any floor test spends its full
    subprocess timeout: with a WEDGED axon worker every fresh python hangs
    at interpreter start (sitecustomize register()), so each TPU-gated
    test would independently burn its 1500 s timeout (~75 min of suite
    stall). A tiny jax.devices() subprocess with a short timeout, cached
    module-wide, turns that into one 180 s skip. Returns '' when healthy,
    else the skip reason."""
    if "reason" not in _PREFLIGHT:
        env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print('NDEV', len(jax.devices()))"],
                env=env, capture_output=True, text=True, timeout=180)
            if out.returncode == 0 and "NDEV" in out.stdout:
                _PREFLIGHT["reason"] = ""
            else:
                _PREFLIGHT["reason"] = (
                    "TPU preflight failed: " + out.stderr.strip()[-300:])
        except subprocess.TimeoutExpired:
            _PREFLIGHT["reason"] = (
                "TPU preflight hung 180 s — axon tunnel/worker wedged; "
                "rerun when the chip is healthy")
    return _PREFLIGHT["reason"]


_RESULTS: dict = {}


def _run_tpu_script(name, script):
    """Run one floor subprocess, cached by name so multiple tests can
    assert different metrics from one process."""
    if name in _RESULTS:
        return _RESULTS[name]
    reason = _tpu_preflight()
    if reason:
        pytest.skip(reason)
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    # share bench.py's persistent TPU executable cache: repeat suite runs
    # on the same host skip the 30-90 s compiles
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/wpe_tpu_cache"))
    try:
        # generous timeout, and skip (don't fail) if it still trips:
        # SIGKILLing a TPU client mid-compile/execution can crash the
        # shared axon worker for HOURS (observed round 3) and a timeout
        # here means the tunnel/worker is wedged — an environment
        # condition, not a perf regression (the floor assertion is the
        # actual regression check)
        out = subprocess.run([sys.executable, "-c", script], env=env,
                             capture_output=True, text=True, timeout=1500,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__))))
    except subprocess.TimeoutExpired:
        pytest.skip("TPU subprocess exceeded 1500s — tunnel/worker wedged "
                    "or mid-recovery; rerun when the chip is healthy")
    assert out.returncode == 0, out.stderr[-2000:]
    _RESULTS[name] = {l.split()[0]: float(l.split()[1])
                      for l in out.stdout.splitlines()
                      if l.startswith(("RATE", "GRAD_RATE", "DATAGEN_MS",
                                       "GRANULAR_RATE", "SC_RATE"))}
    return _RESULTS[name]


@pytest.mark.skipif(not _tpu_available(),
                    reason="no TPU detected (set WPE_TPU_PERF=1 to force)")
def test_cloth_kernel_regression_floor():
    vals = _run_tpu_script("kernels", _SCRIPT_KERNELS)
    # measured ~5.2e9 sustained on v5e (reads lower at short launches due
    # to the fixed dispatch cost); floor at the 1e9 BASELINE north star
    assert vals["RATE"] >= 1.0e9, \
        f"regression: {vals['RATE']:.3e} particle-steps/s"


@pytest.mark.skipif(not _tpu_available(),
                    reason="no TPU detected (set WPE_TPU_PERF=1 to force)")
def test_granular_1m_regression_floor():
    """Granular 1M floor: 3.0e7 particle-steps/s (headline 3.71e7; the
    pre-round-3 XLA path was 1.2e6, the 9-group CIV config 2.66e7 — a
    fall back to either FAILS)."""
    vals = _run_tpu_script("kernels", _SCRIPT_KERNELS)
    assert vals["GRANULAR_RATE"] >= 3.0e7, \
        f"granular-1M regression: {vals['GRANULAR_RATE']:.3e}"


@pytest.mark.skipif(not _tpu_available(),
                    reason="no TPU detected (set WPE_TPU_PERF=1 to force)")
def test_self_collide_256_regression_floor():
    """Self-collide 256² floor: 3.0e7 particle-steps/s (headline 3.92e7;
    round 2's frozen path was 7.3e6)."""
    vals = _run_tpu_script("kernels", _SCRIPT_KERNELS)
    assert vals["SC_RATE"] >= 3.0e7, \
        f"self-collide regression: {vals['SC_RATE']:.3e}"


@pytest.mark.skipif(not _tpu_available(),
                    reason="no TPU detected (set WPE_TPU_PERF=1 to force)")
def test_banded_grad_regression_floor():
    """Banded 256² backward floor: 3e8 particle-steps/s — above the
    2.15e8 XLA fallback, so a silent VMEM-triggered fallback FAILS
    (measured 5.8-6.4e8)."""
    vals = _run_tpu_script("grad", _SCRIPT_GRAD)
    assert vals["GRAD_RATE"] >= 3.0e8, \
        f"banded-grad regression (or XLA fallback): {vals['GRAD_RATE']:.3e}"


@pytest.mark.skipif(not _tpu_available(),
                    reason="no TPU detected (set WPE_TPU_PERF=1 to force)")
def test_datagen_regression_floor():
    """One-jit datagen pipeline floor: 2.5 ms/world at 512 worlds (the
    VERDICT target; measured 1.16)."""
    vals = _run_tpu_script("datagen", _SCRIPT_DATAGEN)
    assert vals["DATAGEN_MS"] <= 2.5, \
        f"datagen regression: {vals['DATAGEN_MS']:.2f} ms/world"
