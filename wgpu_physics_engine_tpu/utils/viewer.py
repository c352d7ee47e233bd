"""Headless viewer: PNG frames / animated GIF / simple interactive loop.

Replaces the reference's winit window + egui panel (L0/L6) for a headless
TPU host: render frames to disk, or drive a scene interactively from a
terminal REPL. (An on-machine GUI makes no sense on a TPU pod; artifacts
are files.)
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(img: np.ndarray, path: str) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(to_uint8(img)).save(path)


def save_gif(frames: Iterable[np.ndarray], path: str, fps: int = 30) -> None:
    from PIL import Image

    ims = [Image.fromarray(to_uint8(f)) for f in frames]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    ims[0].save(path, save_all=True, append_images=ims[1:],
                duration=int(1000 / fps), loop=0)


def record(scene, seconds: float, fps: int = 30, size=(256, 256),
           path: Optional[str] = None, realtime_physics: bool = True):
    """Drive a scene's update/render loop headless and collect frames.

    ``scene``: any object with ``update(dt)`` and ``render(h, w)``.
    """
    frames = []
    n = int(seconds * fps)
    for _ in range(n):
        scene.update(1.0 / fps if realtime_physics else None)
        frames.append(scene.render(*size))
    if path:
        save_gif(frames, path, fps=fps)
    return frames
