"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware. Must run before any
jax import (SURVEY §4 / task environment notes)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the harness presets axon (TPU); tests run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter start, so env vars alone
# are too late; the config update below works as long as no backend has been
# initialized yet (XLA_FLAGS is still read at backend init).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compile cache: the suite is compile-bound on the 1-CPU CI
# host (~150 jit programs), and the programs are identical run-to-run.
# First run populates ~/.cache/wpe_xla_cache; repeat runs cut most of the
# compile wall-time. Delete the directory to force clean compiles.
# WPE_XLA_CACHE=0 disables it entirely — the in-suite segfault hunt
# (round 4) uses this to isolate cache serialize/deserialize crashes.
if os.environ.get("WPE_XLA_CACHE", "1") != "0":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/wpe_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert len(jax.devices()) >= 8, (
    "tests expect the 8-device virtual CPU mesh; got "
    f"{jax.devices()}"
)

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _reclaim_jit_maps():
    """Release each module's live XLA CPU executables (round 4).

    ROOT CAUSE of the round-3 in-suite segfaults (which moved between
    tests and crash sites — compile, cache write, cache read): every
    live jitted executable holds hundreds of tiny 4-16 KiB JIT section
    mmaps, and one full-suite process accumulates ~56k of them by the
    ~180th test — crossing vm.max_map_count (65,530), after which the
    next mmap fails and whatever is allocating (LLVM, the cache
    serializer) segfaults. Plenty of free RAM, so it never looked like
    OOM, and any single module stays far under the limit — which is why
    every standalone repro passed. Measured: test_broadphase alone maps
    8,547 -> 578 after clear_caches().

    Clearing jax's caches after each module releases the executables;
    cross-module recompiles hit the persistent disk cache (above), so
    the wall-time cost is small.
    """
    yield
    jax.clear_caches()
    gc.collect()
