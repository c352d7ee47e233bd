"""Native C++ host runtime vs the Python implementations."""

import os
import tempfile

import numpy as np
import pytest

from wgpu_physics_engine_tpu import native
from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.models import oracle
from wgpu_physics_engine_tpu.render import geometry

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++?)")


def test_uv_sphere_matches_python():
    verts, idx = native.generate_uv_sphere(10.0, 16, 32)
    m = geometry.generate_uv_sphere(10.0, 16, 32)
    assert verts.shape[0] == m.positions.shape[0]
    np.testing.assert_allclose(verts[:, :3], m.positions, atol=1e-5)
    np.testing.assert_allclose(verts[:, 3:6], m.normals, atol=1e-5)
    np.testing.assert_allclose(verts[:, 6:], m.uvs, atol=1e-6)
    np.testing.assert_array_equal(idx.astype(np.int32), m.indices)


def test_spring_topology_matches_python():
    from wgpu_physics_engine_tpu.core import topology as topo

    c = cfg.ClothConfig(height=9, width=7)
    scene, pos, _ = oracle.make_scene(c)
    p0, p1, counts = native.spring_topology(9, 7)
    s = scene.springs
    assert tuple(counts) == topo.spring_counts(9, 7)
    np.testing.assert_array_equal(p0[:counts[0]], s.struct_p0)
    np.testing.assert_array_equal(p1[:counts[0]], s.struct_p1)
    np.testing.assert_array_equal(p0[counts[0]:counts[0] + counts[1]], s.shear_p0)
    np.testing.assert_array_equal(p0[counts[0] + counts[1]:], s.bend_p0)


def test_cpp_oracle_matches_numpy_oracle():
    """The C++ stepper (edge-list order) matches the NumPy edge-list oracle
    through free fall + impact at fp32 tolerance."""
    c = cfg.ClothConfig(height=12, width=12, center=(0.0, 12.0, 0.0),
                        cloth_size=6.0)
    scene, pos0, vel0 = oracle.make_scene(c)
    dt = 1.0 / 480.0

    ref_pos, ref_vel = pos0.copy(), vel0.copy()
    for _ in range(330):
        ref_pos, ref_vel = oracle.substep(scene, ref_pos, ref_vel, dt,
                                          accumulation="edges")
    got_pos, got_vel = native.cloth_simulate(scene, pos0, vel0, dt, 330)
    np.testing.assert_allclose(got_pos, ref_pos, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(got_vel, ref_vel, atol=1e-3, rtol=1e-3)


def test_shard_writer_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        arrays = {f"s{i}": np.random.rand(4, 5, 3).astype(np.float32)
                  for i in range(5)}
        with native.ShardWriter() as wtr:
            for name, a in arrays.items():
                wtr.submit(os.path.join(d, name + ".npy"), a)
            n = wtr.close()
        assert n == 5
        for name, a in arrays.items():
            b = np.load(os.path.join(d, name + ".npy"))
            np.testing.assert_array_equal(a, b)


def test_frame_clock():
    t0 = native.now()
    native.sleep_until(t0 + 0.02)
    assert native.now() - t0 >= 0.019
