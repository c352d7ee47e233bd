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


def ansi_frame(img: np.ndarray, max_cols: int = 80) -> str:
    """Render an image as ANSI 24-bit half-block characters (two pixels per
    character cell) — a live 'window' for any truecolor terminal."""
    h, w = img.shape[:2]
    step = max(1, w // max_cols)
    small = to_uint8(img[::step, ::step])           # 2 small rows per char
    top = small[0::2]
    bot = small[1::2][: top.shape[0]]
    top = top[: bot.shape[0]]
    lines = []
    for tr, br in zip(top, bot):
        cells = [
            f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
            for t, b in zip(tr, br)
        ]
        lines.append("".join(cells) + "\x1b[0m")
    return "\n".join(lines)


def live(scene, seconds: float = 5.0, fps: int = 10, size=(128, 128),
         max_cols: int = 64) -> None:
    """Interactive terminal viewer: runs the scene's update/render loop and
    streams ANSI frames in place (the headless stand-in for the reference's
    winit window)."""
    import sys
    import time as _time

    n = int(seconds * fps)
    for i in range(n):
        t0 = _time.time()
        scene.update(1.0 / fps)
        frame = ansi_frame(scene.render(*size), max_cols)
        rows = frame.count("\n") + 1
        if i:
            sys.stdout.write(f"\x1b[{rows + 1}F")   # cursor back up
        sys.stdout.write(frame + f"\nfps {scene.clock.fps:5.1f}\x1b[K\n")
        sys.stdout.flush()
        _time.sleep(max(0.0, 1.0 / fps - (_time.time() - t0)))


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
