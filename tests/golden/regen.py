"""Regenerate the golden render frames (SURVEY §4.5 golden-image tests).

Run from the repo root ON THE CPU TEST PLATFORM (the same one CI uses):

    JAX_PLATFORMS=cpu python tests/golden/regen.py

Only regenerate when a rendering change is INTENDED; the point of these
artifacts is that an unintended shading/color change (e.g. a flipped
luminosity constant) flips a test even when analytic property checks
still pass.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

from wgpu_physics_engine_tpu.core import config as cfg  # noqa: E402
from wgpu_physics_engine_tpu.models import scenes  # noqa: E402

OUT = os.path.dirname(os.path.abspath(__file__))
SIZE = (64, 64)


def golden_scenes():
    """The three committed golden frames. Static states only (no long
    physics horizons) so the artifacts pin SHADING, not trajectories."""
    yield "globe", scenes.GlobeScene()
    yield "cube", scenes.CubeScene()
    cloth = scenes.ClothScene(config=cfg.ClothConfig(height=12, width=12),
                              use_pallas=False)
    cloth.simulate(0.5)     # short drop so cloth + globe both visible
    yield "cloth", cloth


def main():
    for name, scene in golden_scenes():
        img = scene.render(*SIZE)
        u8 = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        path = os.path.join(OUT, f"{name}.png")
        Image.fromarray(u8).save(path)
        print(f"wrote {path} mean={u8.mean():.2f}")


if __name__ == "__main__":
    main()
