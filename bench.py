"""Headline benchmark: particle-steps/sec/chip on the 256×256 cloth +
sphere collision scene (BASELINE.json north star: >= 1e9).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

vs_baseline is value / 1e9 (the driver-set target; the reference itself
publishes no numbers — its implied realtime ceiling is 1.73e6, see
BASELINE.md).

Driver-proofing (VERDICT r3 item 1): the round-3 bench artifact came back
empty because on a degraded-compile day (542 s/kernel vs the usual 30-60 s)
the old structure — three compiles before any output, 1800 s child budgets,
nothing trapping SIGTERM — could never emit inside the driver's window.
This version survives ANY day:

* the parent traps SIGTERM/SIGINT/SIGALRM and immediately prints the JSON
  line with every result gathered so far before dying;
* the headline exact-Pallas kernel child runs FIRST and ALONE (xla /
  fast_math comparisons are a separate, last, optional child);
* children stream one JSON line per metric as each lands, and the parent
  merges every parseable line even from a killed child;
* budgets fit a ~10-min window: preflight 120 s, per-child cap 420 s,
  global deadline WPE_BENCH_BUDGET (default 540 s) — children are skipped
  (and listed under "degraded") rather than blowing the window;
* children get a persistent compile cache (JAX_COMPILATION_CACHE_DIR) so a
  rerun on the same host can skip big compiles (headline child measured
  70 s cold / 60 s warm on a healthy day — the big win is degraded days,
  where compiles are 10x; see docs/performance.md).

Process structure: the parent imports no jax and never touches the TPU;
each metric group runs in its OWN subprocess, sequentially. Isolation
matters on the shared axon worker: compiling a second very large program
while one is resident can crash the remote TPU worker (~5-10 min
recovery), and a crash then only loses one metric instead of the whole
bench.

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
import signal
import subprocess
import sys
import time

TARGET = 1.0e9
H = W = 256
SUBSTEPS = 30_000
DT = 1.0 / 480.0

_CHILD_ENV = "_WPE_BENCH_CHILD"
_RESULTS_ENV = "_WPE_BENCH_RESULTS"    # side-channel file: the parent's
# signal handler cannot safely drain the in-flight child's stdout pipe
# (communicate() owns it), so children ALSO append each metric line here
PREFLIGHT_S = 120
CHILD_CAP_S = 420
DEFAULT_BUDGET_S = 540.0
_TPU_CACHE = os.path.expanduser("~/.cache/wpe_tpu_cache")


def _emit(obj) -> None:
    line = json.dumps(obj)
    print(line, flush=True)
    path = os.environ.get(_RESULTS_ENV)
    if path:
        try:
            with open(path, "a") as f:
                f.write(line + "\n")
                f.flush()
        except OSError:
            pass  # the side channel is best-effort; stdout is canonical


# ---------------------------------------------------------------------------
# Child metric implementations (each runs in its own TPU process).
# Every child prints one JSON line PER metric as soon as it lands, so a
# killed child still contributes whatever finished.
# ---------------------------------------------------------------------------

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


def _cloth_setup():
    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.core.state import ClothParams, init_cloth_state

    c = cfg.ClothConfig(height=H, width=W)
    return c, ClothParams.from_config(c), init_cloth_state(c)


def _child_cloth() -> None:
    """HEADLINE: the exact (sqrt) fused Pallas kernel, nothing else —
    one compile before the first emitted number."""
    from wgpu_physics_engine_tpu.ops import cloth_pallas

    _, params, state = _cloth_setup()
    el = _time_impl(cloth_pallas.multi_step, state, params, SUBSTEPS)
    _emit({"pallas": H * W * SUBSTEPS / el})


def _child_cloth_extras() -> None:
    """Optional comparison points: XLA stencil path and the fast_math
    (rsqrt, ~1 ulp/step deviation) kernel variant. Runs LAST."""
    import functools

    from wgpu_physics_engine_tpu.models import cloth
    from wgpu_physics_engine_tpu.ops import cloth_pallas

    _, params, state = _cloth_setup()
    for name, fn in (
            ("fast_math", functools.partial(cloth_pallas.multi_step,
                                            fast_math=True)),
            ("xla", cloth.multi_step)):
        try:
            el = _time_impl(fn, state, params, SUBSTEPS)
            _emit({name: H * W * SUBSTEPS / el})
        except Exception as e:  # an extra failing must not kill the bench
            print(f"# {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)


def _child_granular(n: int = 1_000_000, n_steps: int = 64) -> None:
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
    only — same contract as changing slab width). Defaults stay at the
    conservative K=8/s384."""
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
    _emit({"granular_1m": n * n_steps / best})


def _child_self_collide(n_steps: int = 512) -> None:
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

    from wgpu_physics_engine_tpu.models import cloth

    c, params, state = _cloth_setup()
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
    _emit({"self_collide_256": H * W * n_steps / best})


def _child_datagen(n_worlds: int = 512, n_substeps: int = 24) -> None:
    """Secondary metric: batched datagen DEVICE ms/world at 512 worlds
    (BASELINE configs[4] shape at the 60×60 reference scene — the binned
    sphere raster is active): 24 substeps + cached-globe packed-RGB8
    render + DCT codec k=16, the full production pipeline in one jit.
    Target ≤2.5 ms/world (VERDICT r3 item 3).

    Sync discipline (round 4, tools/probes/probe_dg_split.py): the
    pipeline is timed against a 4-byte slice readback. A full-output
    fetch would time the axon tunnel instead — its 2-15 MB/s egress
    turns the codec's 48 KB/world into 3-7 ms/world of pure transfer,
    which is (a) an artifact of this tunnel, not the engine or any real
    TPU host link, and (b) hidden in production anyway:
    generate_trajectory_dataset dispatches frame f+1 before fetching
    frame f, so steady state is max(compute, egress), not their sum.
    The measured tunnel rate is emitted alongside as
    ``datagen_egress_mbps`` for transparency."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wgpu_physics_engine_tpu.core import config as cfg
    from wgpu_physics_engine_tpu.parallel import codec, datagen
    from wgpu_physics_engine_tpu.render import texture as T

    c = cfg.ClothConfig()  # 60×60 — the BASELINE datagen scene
    key = jax.random.key(0)
    batch = datagen.randomized_worlds(c, n_worlds, key)
    cams = datagen.randomized_cameras(n_worlds, jax.random.fold_in(key, 7))
    dt = jnp.float32(1 / c.hz)
    tex = T.pack_rgb8(T.get("mesh", max_size=256))
    base = datagen.globe_base_fbs(cams, batch.params, tex)
    np.asarray(jax.tree.leaves(base)[0][:1, :1, :1])

    def run():
        return codec.encode(
            datagen.step_and_render(batch, dt, n_substeps, cams, tex,
                                    base_fb=base)[1], k=16)

    out = run()
    np.asarray(out[:1, :1, :1, :1, :1])        # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = run()
        np.asarray(out[:1, :1, :1, :1, :1])    # 4-byte fence
        best = min(best, time.time() - t0)
    _emit({"datagen_ms_per_world": best / n_worlds * 1e3})
    t0 = time.time()
    arr = np.asarray(out)                      # tunnel egress rate
    _emit({"datagen_egress_mbps": arr.nbytes / (time.time() - t0) / 1e6})


def _child_contact() -> None:
    """Granular-1M + self-collide-256 in ONE child (round 5): each child
    pays the tunnel handshake/load tax — 15 s on a quiet phase, MINUTES
    on degraded ones — and on degraded days five children overflow the
    driver's budget, dropping metrics. The two contact workloads share a
    kernel family and co-compile safely (tests/test_perf_regression.py's
    consolidated floor process proved the pattern). Each metric streams
    to the side channel the moment it lands, so a crash in the second
    half cannot lose the first."""
    _child_granular()
    _child_self_collide()


# Execution order matters: headline first (the one number the round
# cannot lose), extras last (pure comparison points).
_CHILDREN = {
    "cloth": _child_cloth,
    "contact": _child_contact,
    "datagen": _child_datagen,
    "cloth_extras": _child_cloth_extras,
}


# ---------------------------------------------------------------------------
# Parent orchestration (no jax, no TPU)
# ---------------------------------------------------------------------------

class _Bench:
    def __init__(self, budget_s: float):
        self.deadline = time.time() + budget_s
        self.results: dict = {}
        self.degraded: list = []
        self.proc: subprocess.Popen | None = None
        self.emitted = False
        import tempfile
        fd, self.results_path = tempfile.mkstemp(prefix="wpe_bench_",
                                                 suffix=".jsonl")
        os.close(fd)

    def _merge_results_file(self) -> None:
        """Fold in metrics the in-flight child streamed to the side
        channel — the only safe source when a signal interrupts
        communicate() (the pipe belongs to that call's reader threads)."""
        try:
            with open(self.results_path) as f:
                self._merge_lines(f.read())
        except OSError:
            pass

    def remaining(self) -> float:
        return self.deadline - time.time()

    # -- output ------------------------------------------------------------
    def emit_final(self) -> None:
        if self.emitted:
            return
        self.emitted = True
        self._merge_results_file()
        r = self.results
        # headline = the fidelity-contract (exact sqrt) kernel; if it ever
        # fails to compile, fall back to the XLA path — NEVER the fast_math
        # rsqrt variant (that would silently report the wrong contract)
        value = r.get("pallas", r.get("xla", 0.0))
        for name, v in sorted(r.items(), key=lambda kv: -kv[1]):
            print(f"# {name}: {v:.4g}", file=sys.stderr, flush=True)
        out = {
            "metric": "particle-steps/sec/chip (256x256 cloth + sphere collide)",
            "value": value,
            "unit": "particle-steps/s",
            "vs_baseline": value / TARGET,
        }
        for key in ("fast_math", "xla", "granular_1m", "self_collide_256",
                    "datagen_ms_per_world", "datagen_egress_mbps"):
            if key in r:
                out[key] = r[key]
        if self.degraded:
            out["degraded"] = self.degraded
        _emit(out)
        try:   # side channel is merged; don't leave /tmp litter behind
            os.unlink(self.results_path)
        except OSError:
            pass

    def _on_signal(self, signum, frame):
        print(f"# signal {signum}: flushing partial results",
              file=sys.stderr, flush=True)
        if self.proc is not None and self.proc.poll() is None:
            try:
                self.proc.terminate()
            except OSError:
                pass
        self.emit_final()
        # skip normal shutdown paths — the line is out, that's all that counts
        os._exit(0)

    def install_handlers(self) -> None:
        for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
            signal.signal(sig, self._on_signal)

    # -- children ----------------------------------------------------------
    def _merge_lines(self, stdout: str) -> bool:
        ok = False
        for line in (stdout or "").splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                self.results.update(json.loads(line))
                ok = True
            except ValueError:
                pass
        return ok

    def run_child(self, name: str) -> str:
        """Returns 'ok' | 'failed' | 'timeout' | 'skipped'."""
        budget = min(CHILD_CAP_S, self.remaining() - 15)
        if budget < 60:
            print(f"# {name}: skipped (out of budget)", file=sys.stderr,
                  flush=True)
            self.degraded.append(name)
            return "skipped"
        env = dict(os.environ)
        env[_CHILD_ENV] = name
        env[_RESULTS_ENV] = self.results_path
        # persistent executable cache: reruns on the same host skip the big
        # compiles (the axon backend serializes fine — docs/performance.md)
        env.setdefault("JAX_COMPILATION_CACHE_DIR", _TPU_CACHE)
        t0 = time.time()
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        status = "ok"
        try:
            out, err = self.proc.communicate(timeout=budget)
        except subprocess.TimeoutExpired:
            self.proc.terminate()
            try:
                out, err = self.proc.communicate(timeout=10)
            except subprocess.TimeoutExpired:
                self.proc.kill()
                out, err = self.proc.communicate()
            status = "timeout"
            self.degraded.append(name)
            print(f"# {name}: timed out after {budget:.0f}s",
                  file=sys.stderr, flush=True)
        rc = self.proc.returncode
        self.proc = None
        sys.stderr.write(err or "")
        got = self._merge_lines(out)
        if status == "ok" and rc != 0:
            status = "failed"
            print(f"# {name}: child failed (rc={rc})", file=sys.stderr,
                  flush=True)
            if not got:
                self.degraded.append(name)
        print(f"# {name}: {status} in {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)
        return status


def _preflight() -> bool:
    """Cheap backend health check before launching any long child.

    A downed axon worker hangs every fresh python at interpreter start
    (the sitecustomize registers the TPU plugin), so a tiny subprocess
    that just initializes the backend distinguishes healthy (seconds)
    from down (hangs) without paying a full child timeout.
    """
    code = "import jax; print(len(jax.devices()))"
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=PREFLIGHT_S)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    child = os.environ.get(_CHILD_ENV)
    if child:
        _CHILDREN[child]()
        return

    bench = _Bench(float(os.environ.get("WPE_BENCH_BUDGET",
                                        DEFAULT_BUDGET_S)))
    bench.install_handlers()

    if not _preflight():
        print("# preflight failed: backend unreachable (TPU worker down?); "
              "emitting empty bench", file=sys.stderr, flush=True)
        bench.degraded = ["preflight"]
        bench.results = {}
        bench.emit_final()
        return

    for name in _CHILDREN:
        status = bench.run_child(name)
        if status == "timeout":
            # the worker is down or wedged mid-op — every further child
            # would burn its whole budget and add another kill-mid-compile
            # event against the shared worker (the documented crash
            # pattern). Report what we have.
            bench.degraded.extend(n for n in _CHILDREN
                                  if n not in bench.degraded
                                  and list(_CHILDREN).index(n) >
                                  list(_CHILDREN).index(name))
            print("# skipping remaining children after a timeout",
                  file=sys.stderr, flush=True)
            break

    bench.emit_final()


if __name__ == "__main__":
    main()
