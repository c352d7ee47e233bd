"""Headline benchmark: particle-steps/sec/chip on the 256×256 cloth +
sphere collision scene (BASELINE.json north star: >= 1e9).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is value / 1e9 (the driver-set target; the reference itself
publishes no numbers — its implied realtime ceiling is 1.73e6, see
BASELINE.md).

Process structure: the parent imports no jax and never touches the TPU;
each metric group (cloth / granular / self-collide) runs in its OWN
subprocess, sequentially. Isolation matters on the shared axon worker:
compiling a second very large program while one is resident can crash the
remote TPU worker (~5-10 min recovery), and a crash then only loses one
metric instead of the whole bench.

Notes:
* under the axon TPU platform ``block_until_ready`` does not reliably
  synchronize, so timing forces a device→host readback of one array;
* each launch pays a ~46 ms fixed dispatch cost through the axon tunnel, so
  benchmarks run sustained many-substep launches (the engine's intended
  usage — the reference steps continuously at 480 Hz) to measure the true
  kernel rate rather than the tunnel.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

TARGET = 1.0e9
H = W = 256
SUBSTEPS = 30_000
DT = 1.0 / 480.0

_CHILD_ENV = "_WPE_BENCH_CHILD"


# ---------------------------------------------------------------------------
# Child metric implementations (each runs in its own TPU process)
# ---------------------------------------------------------------------------

def _best_multi_step():
    """Pick the fastest available multi-substep implementation."""
    from wgpu_physics_engine_tpu.models import cloth

    impls = {"xla": cloth.multi_step}
    try:
        import functools

        from wgpu_physics_engine_tpu.ops import cloth_pallas

        impls["pallas"] = cloth_pallas.multi_step
        # rsqrt variant: deviates from the exact kernel by ~1 ulp/step
        # (9e-14 max over 300 steps) — far inside the 1e-4 fidelity bar
        impls["pallas_fast"] = functools.partial(
            cloth_pallas.multi_step, fast_math=True)
    except Exception:
        pass
    return impls


def _time_impl(fn, state, params, n_steps) -> float:
    import jax.numpy as jnp
    import numpy as np

    dt = jnp.float32(DT)

    def _sync(out):
        # eager device slice -> 4-byte host read: fences the producer
        # without timing the tunnel (a full [3,256,256] readback adds
        # ~40-60 ms/trial, -5% on the headline; probe_readback.py Aug 19)
        np.asarray(out.pos[:1, :1, :1])

    out = fn(state, params, dt, n_steps)
    _sync(out)  # compile + sync
    best = float("inf")
    for trial in range(3):
        st = state._replace(pos=state.pos + jnp.float32(trial * 1e-3))
        t0 = time.time()
        out = fn(st, params, dt, n_steps)
        _sync(out)  # force execution
        best = min(best, time.time() - t0)
    return best


def _child_cloth() -> dict:
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state

    c = cfg.ClothConfig(height=H, width=W)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)

    results = {}
    for name, fn in _best_multi_step().items():
        try:
            el = _time_impl(fn, state, params, SUBSTEPS)
            results[name] = H * W * SUBSTEPS / el
        except Exception as e:  # an impl failing must not kill the bench
            print(f"# {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
    return results


def _child_granular(n: int = 1_000_000, n_steps: int = 64) -> dict:
    """Secondary metric: end-to-end 1M-particle granular contact
    (BASELINE configs[2] extension), slab-DMA Pallas kernel. Tuned
    schedule: rebuild-every-16 frozen windows (Verlet skin documented in
    GranularConfig) + THIN 3-group CIV with slab 640 — 3.70e7 p-steps/s
    vs 2.66e7 for the 9-group s256 config (tools/probes/probe_thin.py,
    Aug 19): one merged contiguous slab per dx replaces the 3 per-(dx,dy)
    slabs, 1/3 the DMA issues. Zero dropped window entries at s640 (s512
    also zero but 24% slower — narrower slabs fire the B-pass more);
    thin-vs-base deviation is bitwise ZERO over one rebuild block and
    chaotic-saturation-scale over 512 substeps (pair-sum reassociation
    only — same contract as changing slab width). mxu modes measured
    fidelity-broken (SC maxdev 43.5 vs the 0.16 floor) and are NOT used.
    Defaults stay at the conservative K=8/s384."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wgpu_physics_engine_tpu.models import granular

    cfg = granular.GranularConfig(num_particles=n, rebuild_every=16,
                                  pallas_slab=640, thin=True)
    state = granular.init_state(cfg, jax.random.PRNGKey(0))
    dt = jnp.float32(1 / 240)
    np.asarray(granular.multi_step(state, cfg, dt, n_steps).pos[:1, :1])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(granular.multi_step(state, cfg, dt, n_steps).pos[:1, :1])
        best = min(best, time.time() - t0)
    return {"granular_1m": n * n_steps / best}


def _child_self_collide(n_steps: int = 512) -> dict:
    """Secondary metric: cloth self-collision at 256² (BASELINE
    configs[3]), frozen-window schedule.

    Round-3 tuning: rebuild_every=32 with slab 640 — zero dropped window
    entries over this trajectory (verified in stats mode), and deviation
    from the exact per-substep-rebuild path saturates at the same level
    as K=8/K=16 (maxdev 0.163 vs 0.162/0.164 after 512 substeps —
    contact dynamics are chaotic and divergence saturates regardless of
    K; tools/probes/probe_fid32.py). K=32 vs K=16 interleaved A/B:
    1.786 vs 1.862 ms/substep (probe_sc3, Aug 19). Small blocks LOSE
    here (b128 drops millions of window entries — fold hulls exceed the
    proportional slab), unlike granular."""
    import jax.numpy as jnp
    import numpy as np

    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state
    from wgpu_physics_engine_tpu.models import cloth

    c = cfg.ClothConfig(height=H, width=W)
    params = ClothParams.from_config(c)
    state = init_cloth_state(c)
    spec = cloth.default_self_collision_grid(
        c, skin=0.5 * c.particle_radius)
    dt = jnp.float32(DT)

    def run(s):
        return cloth.multi_step_self_collide(s, params, dt, n_steps, spec,
                                             rebuild_every=32,
                                             pallas_slab=640)

    np.asarray(run(state).pos[:1, :1, :1])
    best = float("inf")
    for trial in range(3):
        st = state._replace(pos=state.pos + jnp.float32(trial * 1e-3))
        t0 = time.time()
        np.asarray(run(st).pos[:1, :1, :1])
        best = min(best, time.time() - t0)
    return {"self_collide_256": H * W * n_steps / best}


_CHILDREN = {
    "cloth": _child_cloth,
    "granular": _child_granular,
    "self_collide": _child_self_collide,
}


# ---------------------------------------------------------------------------
# Parent orchestration (no jax, no TPU)
# ---------------------------------------------------------------------------

def _run_child(name: str) -> dict:
    env = dict(os.environ)
    env[_CHILD_ENV] = name
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True,
                           timeout=1800)
    except subprocess.TimeoutExpired as e:
        # a downed TPU worker hangs children on the first device op; the
        # bench must still emit its JSON line (with whatever completed)
        if e.stderr:
            sys.stderr.write(e.stderr if isinstance(e.stderr, str)
                             else e.stderr.decode(errors="replace"))
        print(f"# {name} child timed out (TPU worker down?)",
              file=sys.stderr)
        return None
    sys.stderr.write(r.stderr)
    if r.returncode != 0:
        print(f"# {name} child failed (rc={r.returncode})", file=sys.stderr)
        return {}
    try:
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as e:
        print(f"# {name} child output unparseable: {e}", file=sys.stderr)
        return {}


def _preflight() -> bool:
    """Cheap backend health check before launching any 30-min child.

    A downed axon worker hangs every fresh python at interpreter start
    (the sitecustomize registers the TPU plugin), so a tiny subprocess
    that just initializes the backend distinguishes healthy (seconds)
    from down (hangs) without paying a full child timeout.
    """
    code = "import jax; print(len(jax.devices()))"
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=300)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    child = os.environ.get(_CHILD_ENV)
    if child:
        print(json.dumps(_CHILDREN[child]()))
        return

    if not _preflight():
        print("# preflight failed: backend unreachable (TPU worker down?); "
              "emitting empty bench", file=sys.stderr)
        print(json.dumps({
            "metric": "particle-steps/sec/chip (256x256 cloth + sphere collide)",
            "value": 0.0,
            "unit": "particle-steps/s",
            "vs_baseline": 0.0,
            "error": "backend unreachable at preflight",
        }))
        return

    results = {}
    for name in _CHILDREN:
        r = _run_child(name)
        if r is None:
            # timeout killed the child mid-TPU-op — the worker is down
            # or wedged, and every further child would hang 30 min and
            # add another kill-mid-compile event against it (the
            # documented worker-crash pattern). Report what we have.
            print("# skipping remaining children after a timeout",
                  file=sys.stderr)
            break
        results.update(r)

    # headline = the fidelity-contract (exact sqrt) kernel; if it ever
    # fails to compile, fall back to the XLA path — NEVER the fast_math
    # rsqrt variant (that would silently report the wrong contract)
    value = results.get("pallas", results.get("xla", 0.0))
    for name, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"# {name}: {v:.3e} particle-steps/s", file=sys.stderr)
    out = {
        "metric": "particle-steps/sec/chip (256x256 cloth + sphere collide)",
        "value": value,
        "unit": "particle-steps/s",
        "vs_baseline": value / TARGET,
    }
    for key in ("pallas_fast", "xla", "granular_1m", "self_collide_256"):
        if key in results:
            out["fast_math" if key == "pallas_fast" else key] = results[key]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
