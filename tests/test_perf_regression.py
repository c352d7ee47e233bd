"""Performance regression floor (SURVEY §4.6): particle-steps/sec/chip on
the 256×256 cloth, asserted against a conservative floor.

The suite itself runs on the virtual CPU mesh (conftest), so the
measurement happens in a clean subprocess that keeps the TPU platform.
The test runs automatically wherever the axon TPU tunnel is present
(``PALLAS_AXON_POOL_IPS`` in the env — the harness's TPU indicator) and
can be forced on/off with ``WPE_TPU_PERF=1`` / ``WPE_TPU_PERF=0``.

NOTE: never run two TPU processes concurrently (CLAUDE.md) — don't run
this while another TPU job is in flight.
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import time
import jax, jax.numpy as jnp
import numpy as np
import wgpu_physics_engine_tpu as eng
from wgpu_physics_engine_tpu.ops import cloth_pallas

c = eng.ClothConfig(height=256, width=256)
params = eng.ClothParams.from_config(c)
state = eng.init_cloth_state(c)
dt = jnp.float32(1 / 480)
# 10k substeps so the ~46 ms fixed tunnel dispatch doesn't dominate
np.asarray(cloth_pallas.multi_step(state, params, dt, 10_000).pos)
best = float("inf")
for t in range(3):
    st = state._replace(pos=state.pos + jnp.float32(t * 1e-3))
    t0 = time.time()
    np.asarray(cloth_pallas.multi_step(st, params, dt, 10_000).pos)
    best = min(best, time.time() - t0)
print("RATE", 256 * 256 * 10_000 / best)
"""


def _tpu_available() -> bool:
    """Detect the TPU environment WITHOUT initializing a jax backend in
    this (CPU-forced) process: the harness exposes the axon tunnel via
    PALLAS_AXON_POOL_IPS."""
    flag = os.environ.get("WPE_TPU_PERF")
    if flag is not None:
        return flag == "1"
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


@pytest.mark.skipif(not _tpu_available(),
                    reason="no TPU detected (set WPE_TPU_PERF=1 to force)")
def test_cloth_kernel_regression_floor():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    try:
        # generous timeout, and skip (don't fail) if it still trips:
        # SIGKILLing a TPU client mid-compile/execution can crash the
        # shared axon worker for HOURS (observed round 3) and a timeout
        # here means the tunnel/worker is wedged — an environment
        # condition, not a kernel perf regression (the floor assertion
        # below is the actual regression check)
        out = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                             capture_output=True, text=True, timeout=1500,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__))))
    except subprocess.TimeoutExpired:
        pytest.skip("TPU subprocess exceeded 1500s — tunnel/worker wedged "
                    "or mid-recovery; rerun when the chip is healthy")
    assert out.returncode == 0, out.stderr[-2000:]
    rate = float([l for l in out.stdout.splitlines()
                  if l.startswith("RATE")][0].split()[1])
    # measured ~5.2e9 sustained on v5e (reads lower at short launches due
    # to the fixed dispatch cost); floor at the 1e9 BASELINE north star
    assert rate >= 1.0e9, f"regression: {rate:.3e} particle-steps/s"


# NOTE: the grad and datagen measurements run in SEPARATE subprocesses —
# compiling the one-jit datagen pipeline while the banded trace/transpose
# kernels are resident is the documented worker-crash pattern (CLAUDE.md;
# bench.py isolates its metrics for the same reason).
_SCRIPT_GRAD = r"""
import time
import jax, jax.numpy as jnp
import numpy as np
import wgpu_physics_engine_tpu as eng
from wgpu_physics_engine_tpu.models import cloth

# --- banded 256^2 backward (round 4): grad at kernel rates ---
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


def _run_tpu_script(script):
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    try:
        out = subprocess.run([sys.executable, "-c", script], env=env,
                             capture_output=True, text=True, timeout=1500,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__))))
    except subprocess.TimeoutExpired:
        pytest.skip("TPU subprocess exceeded 1500s — tunnel/worker wedged "
                    "or mid-recovery; rerun when the chip is healthy")
    assert out.returncode == 0, out.stderr[-2000:]
    return {l.split()[0]: float(l.split()[1])
            for l in out.stdout.splitlines()
            if l.startswith(("GRAD_RATE", "DATAGEN_MS"))}


@pytest.mark.skipif(not _tpu_available(),
                    reason="no TPU detected (set WPE_TPU_PERF=1 to force)")
def test_banded_grad_regression_floor():
    """Banded 256² backward floor: 3e8 particle-steps/s — above the
    2.15e8 XLA fallback, so a silent VMEM-triggered fallback FAILS
    (measured 5.8e8)."""
    vals = _run_tpu_script(_SCRIPT_GRAD)
    assert vals["GRAD_RATE"] >= 3.0e8, \
        f"banded-grad regression (or XLA fallback): {vals['GRAD_RATE']:.3e}"


@pytest.mark.skipif(not _tpu_available(),
                    reason="no TPU detected (set WPE_TPU_PERF=1 to force)")
def test_datagen_regression_floor():
    """One-jit datagen pipeline floor: 2.5 ms/world at 512 worlds (the
    VERDICT target; measured 1.16)."""
    vals = _run_tpu_script(_SCRIPT_DATAGEN)
    assert vals["DATAGEN_MS"] <= 2.5, \
        f"datagen regression: {vals['DATAGEN_MS']:.2f} ms/world"
