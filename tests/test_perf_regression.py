"""Performance regression floor (SURVEY §4.6): particle-steps/sec/chip on
the 256×256 cloth, asserted against a conservative floor.

Runs ONLY when real TPU hardware is available (the suite itself defaults to
the virtual CPU mesh, so the measurement happens in a clean subprocess):

    WPE_TPU_PERF=1 python -m pytest tests/test_perf_regression.py -q
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
np.asarray(cloth_pallas.multi_step(state, params, dt, 2000).pos)
best = float("inf")
for t in range(3):
    st = state._replace(pos=state.pos + jnp.float32(t * 1e-3))
    t0 = time.time()
    np.asarray(cloth_pallas.multi_step(st, params, dt, 2000).pos)
    best = min(best, time.time() - t0)
print("RATE", 256 * 256 * 2000 / best)
"""


@pytest.mark.skipif(os.environ.get("WPE_TPU_PERF") != "1",
                    reason="TPU perf test; set WPE_TPU_PERF=1 on a TPU host")
def test_cloth_kernel_regression_floor():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    out = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                         capture_output=True, text=True, timeout=900,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    rate = float([l for l in out.stdout.splitlines()
                  if l.startswith("RATE")][0].split()[1])
    # measured ~1.8-2.2e9 on v5e; floor at the 1e9 BASELINE north star
    assert rate >= 1.0e9, f"regression: {rate:.3e} particle-steps/s"
