"""ctypes bindings for the native host runtime (native/libwpe_host.so).

Auto-builds the library with g++ on first use if missing (the image ships
the toolchain but no pybind11; plain C ABI + ctypes keeps it dependency-
free). Every entry point has a pure-Python equivalent elsewhere in the
package, so :func:`available` gating keeps the framework fully functional
without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native")
_SO = os.path.join(_DIR, "libwpe_host.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.wpe_uv_sphere_counts.argtypes = [ctypes.c_int, ctypes.c_int,
                                         ctypes.POINTER(ctypes.c_int),
                                         ctypes.POINTER(ctypes.c_int)]
    lib.wpe_generate_uv_sphere.argtypes = [ctypes.c_float, ctypes.c_int,
                                           ctypes.c_int, f32p, u32p]
    lib.wpe_spring_counts.argtypes = [ctypes.c_int, ctypes.c_int, i32p]
    lib.wpe_spring_topology.argtypes = [ctypes.c_int, ctypes.c_int, i32p, i32p]
    lib.wpe_cloth_substep.argtypes = [ctypes.c_int, ctypes.c_int, f32p, f32p,
                                      f32p, f32p]
    lib.wpe_cloth_simulate.argtypes = [ctypes.c_int, ctypes.c_int, f32p, f32p,
                                       f32p, f32p, ctypes.c_int]
    lib.wpe_writer_open.restype = ctypes.c_void_p
    lib.wpe_writer_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p, f32p,
                                      i64p, ctypes.c_int]
    lib.wpe_writer_submit2.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_void_p, i64p, ctypes.c_int,
                                       ctypes.c_char_p, ctypes.c_int]
    lib.wpe_writer_pending.argtypes = [ctypes.c_void_p]
    lib.wpe_writer_pending.restype = ctypes.c_int64
    lib.wpe_writer_close.argtypes = [ctypes.c_void_p]
    lib.wpe_writer_close.restype = ctypes.c_int64
    lib.wpe_now.restype = ctypes.c_double
    lib.wpe_sleep_until.argtypes = [ctypes.c_double]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# Geometry / topology
# ---------------------------------------------------------------------------

def generate_uv_sphere(radius: float, stacks: int, sectors: int):
    """Native UV sphere → (verts [V, 8] = pos|normal|uv, indices [I])."""
    lib = _load()
    nv, ni = ctypes.c_int(), ctypes.c_int()
    lib.wpe_uv_sphere_counts(stacks, sectors, ctypes.byref(nv), ctypes.byref(ni))
    verts = np.empty((nv.value, 8), np.float32)
    idx = np.empty((ni.value,), np.uint32)
    lib.wpe_generate_uv_sphere(radius, stacks, sectors, verts.reshape(-1), idx)
    return verts, idx


def spring_topology(h: int, w: int):
    """Native topology → (p0, p1, counts[3]); struct|shear|bend concatenated."""
    lib = _load()
    counts = np.empty(3, np.int32)
    lib.wpe_spring_counts(h, w, counts)
    total = int(counts.sum())
    p0 = np.empty(total, np.int32)
    p1 = np.empty(total, np.int32)
    lib.wpe_spring_topology(h, w, p0, p1)
    return p0, p1, counts


# ---------------------------------------------------------------------------
# C++ oracle stepper
# ---------------------------------------------------------------------------

def pack_params(scene) -> np.ndarray:
    """OracleScene → native param vector (layout documented in wpe_host.cpp)."""
    return np.array([
        scene.k[0], scene.k[1], scene.k[2],
        scene.c[0], scene.c[1], scene.c[2],
        scene.rest[0], scene.rest[1], scene.rest[2],
        scene.k_contact, scene.mu, scene.mass, scene.gravity,
        scene.speed_damp,
        np.float32(scene.globe_radius) + np.float32(scene.particle_radius),
        0.0,  # dt slot, set per call
    ], np.float32)


def cloth_simulate(scene, pos: np.ndarray, vel: np.ndarray, dt: float,
                   n_steps: int) -> Tuple[np.ndarray, np.ndarray]:
    """Run the native oracle: ``pos``/``vel`` [N, 3] float32 (copied)."""
    lib = _load()
    h, w = scene.height, scene.width
    pos = np.ascontiguousarray(pos, np.float32).copy()
    vel = np.ascontiguousarray(vel, np.float32).copy()
    scratch = np.zeros_like(pos)
    prm = pack_params(scene)
    prm[15] = np.float32(dt)
    lib.wpe_cloth_simulate(h, w, pos.reshape(-1), vel.reshape(-1),
                           scratch.reshape(-1), prm, n_steps)
    return pos, vel


# ---------------------------------------------------------------------------
# Async shard writer
# ---------------------------------------------------------------------------

class ShardWriter:
    """Background-thread .npy writer for datagen egress.

    Accepts any C-contiguous array of the dtypes below (uint8 is the
    datagen default — device→host egress is 4× smaller than fp32)."""

    _DESCR = {
        np.dtype(np.float32): b"<f4", np.dtype(np.float64): b"<f8",
        np.dtype(np.uint8): b"|u1", np.dtype(np.int32): b"<i4",
        np.dtype(np.int64): b"<i8", np.dtype(np.uint32): b"<u4",
        np.dtype(np.float16): b"<f2", np.dtype(np.bool_): b"|b1",
        np.dtype(np.int8): b"|i1", np.dtype(np.int16): b"<i2",
    }

    def __init__(self):
        self._lib = _load()
        self._h = self._lib.wpe_writer_open()

    def submit(self, path: str, array: np.ndarray) -> None:
        arr = np.ascontiguousarray(array)
        descr = self._DESCR.get(arr.dtype)
        if descr is None:
            arr = np.ascontiguousarray(array, np.float32)
            descr = b"<f4"
        shape = np.asarray(arr.shape, np.int64)
        self._lib.wpe_writer_submit2(
            self._h, path.encode(), arr.ctypes.data_as(ctypes.c_void_p),
            shape, arr.ndim, descr, arr.itemsize)

    def pending(self) -> int:
        return int(self._lib.wpe_writer_pending(self._h))

    def close(self) -> int:
        """Drain and join; returns shards written (negative = error count)."""
        n = int(self._lib.wpe_writer_close(self._h))
        self._h = None
        return n

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self._h is not None:
            self.close()


def now() -> float:
    return float(_load().wpe_now())


def sleep_until(t: float) -> None:
    _load().wpe_sleep_until(t)
