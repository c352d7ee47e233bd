"""wgpu_physics_engine_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
capabilities of Muten-Roshi-Sama/wgpu_physics_engine.

The reference is a Rust + wgpu/WGSL GPU physics playground whose flagship is
a mass-spring cloth draped over a lit/textured globe. This package provides
the same capabilities designed TPU-first:

* physics state as functional pytrees of SoA arrays (``[3, H, W]`` grids),
* spring forces as O(N) grid stencils instead of edge-list scans,
* one fused jitted substep (springs → accumulate → contact → friction →
  integrate → project), with a Pallas multi-substep kernel for the hot path,
* ``vmap``/``shard_map`` batching of thousands of independent worlds across
  a TPU mesh for datagen,
* a headless batched renderer (analytic sphere raster + mesh rasterizer with
  Phong shading and texture sampling) replacing the wgpu render pipelines.
"""

__version__ = "0.1.0"

from . import native
from .core import config
from .core.config import (
    CameraConfig,
    ClothConfig,
    FreeParticleConfig,
    GlobeConfig,
    LightConfig,
)
from .core.state import (
    ClothParams,
    ClothState,
    ParticleParams,
    ParticleState,
    init_cloth_state,
)

__all__ = [
    "config",
    "CameraConfig",
    "ClothConfig",
    "FreeParticleConfig",
    "GlobeConfig",
    "LightConfig",
    "ClothParams",
    "ClothState",
    "ParticleParams",
    "ParticleState",
    "init_cloth_state",
]
