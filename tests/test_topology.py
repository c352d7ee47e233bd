"""Spring topology tests (SURVEY §4.3): closed-form counts, canonical
ordering, and geometric rest lengths for H×W grids."""

import numpy as np
import pytest

from wgpu_physics_engine_tpu.core import config as cfg
from wgpu_physics_engine_tpu.core import topology as topo
from wgpu_physics_engine_tpu.models import oracle


@pytest.mark.parametrize("n", [3, 4, 16, 60])
def test_square_grid_counts(n):
    s, h, b = topo.spring_counts(n, n)
    assert s == 2 * n * (n - 1)
    assert h == 2 * (n - 1) ** 2
    assert b == 2 * n * (n - 2)


def test_reference_60x60_counts():
    # cloth.rs:388-392 → 7,080 structural + 6,962 shear + 6,960 bend = 21,002
    s, h, b = topo.spring_counts(60, 60)
    assert (s, h, b) == (7080, 6962, 6960)
    assert s + h + b == 21002


@pytest.mark.parametrize("hw", [(3, 5), (5, 3), (4, 4)])
def test_built_lists_match_counts(hw):
    h, w = hw
    c = cfg.ClothConfig(height=h, width=w)
    scene, pos, _ = oracle.make_scene(c)
    s = scene.springs
    es, eh, eb = topo.spring_counts(h, w)
    assert len(s.struct_p0) == es
    assert len(s.shear_p0) == eh
    assert len(s.bend_p0) == eb
    # canonicalized: p0 < p1 (push_unique, cloth.rs:928)
    for p0, p1 in ((s.struct_p0, s.struct_p1), (s.shear_p0, s.shear_p1),
                   (s.bend_p0, s.bend_p1)):
        assert np.all(p0 < p1)


def test_rest_lengths_flat_grid():
    """On the flat spawn grid, geometric rest lengths equal the uniform
    rest lengths the force kernel actually uses (cloth.rs:557-559)."""
    c = cfg.ClothConfig(height=8, width=8)
    scene, pos, _ = oracle.make_scene(c)
    s = scene.springs
    sp = np.float32(c.spacing)
    np.testing.assert_allclose(s.struct_rest0, sp, rtol=1e-6)
    np.testing.assert_allclose(s.shear_rest0, sp * np.sqrt(np.float32(2)), rtol=1e-6)
    np.testing.assert_allclose(s.bend_rest0, sp * 2, rtol=1e-6)


def test_grid_index_layout():
    """Initial positions follow generate_instances (cloth.rs:848-893):
    index i = r*W + c; x from row, z from col, offset by n/2 (not (n-1)/2)."""
    c = cfg.ClothConfig(height=4, width=4, cloth_size=3.0, center=(0.0, 40.0, 0.0))
    _, pos, _ = oracle.make_scene(c)
    sp = c.spacing
    # particle (r=1, c=2) → index 6
    np.testing.assert_allclose(pos[6], [(1 - 2.0) * sp, 40.0, (2 - 2.0) * sp], rtol=1e-6)
    assert np.all(pos[:, 1] == np.float32(40.0))
