"""Generate the repo's committed texture assets, procedurally and
reproducibly (fixed seeds) — ORIGINAL art, not copies of the reference's
``textures/`` binaries (which we must not ship). The reference consumes
``mesh.jpg`` + ``red.png`` in the cloth app (cloth.rs:60-61) and
``moon1024.bmp`` in the globe app (globe.rs texture load); these two files
play those roles:

* ``planet_equirect.png`` — 512×1024 equirectangular planet: fBm value-noise
  continents with altitude coloring, polar ice, latitude-banded oceans.
* ``grid.png``            — 512×512 grid cloth texture (the mesh.jpg role).

Run from the repo root:  python tools/gen_assets.py
"""

import os

import numpy as np
from PIL import Image

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "wgpu_physics_engine_tpu", "assets")


def _value_noise(h, w, freq, rng):
    """Periodic-in-x value noise at lattice frequency ``freq``."""
    lat = rng.random((freq + 1, freq + 1)).astype(np.float32)
    lat[:, -1] = lat[:, 0]                      # wrap east-west seam
    y = np.linspace(0, freq, h, endpoint=False)
    x = np.linspace(0, freq, w, endpoint=False)
    y0 = y.astype(int)
    x0 = x.astype(int)
    fy = (y - y0)[:, None]
    fx = (x - x0)[None, :]
    fy = fy * fy * (3 - 2 * fy)                 # smoothstep
    fx = fx * fx * (3 - 2 * fx)
    a = lat[np.ix_(y0, x0)]
    b = lat[np.ix_(y0, x0 + 1)]
    c = lat[np.ix_(y0 + 1, x0)]
    d = lat[np.ix_(y0 + 1, x0 + 1)]
    return (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy


def fbm(h, w, octaves=6, seed=0):
    rng = np.random.default_rng(seed)
    out = np.zeros((h, w), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        out += amp * _value_noise(h, w, 4 << o, rng)
        total += amp
        amp *= 0.5
    return out / total


def planet(h=512, w=1024, seed=12) -> np.ndarray:
    elev = fbm(h, w, octaves=7, seed=seed)
    lat = np.abs(np.linspace(-1.0, 1.0, h))[:, None]        # 0 eq, 1 poles
    # push land away from the poles a little, then threshold
    sea = 0.55 + 0.05 * lat
    land = elev > sea
    depth = np.clip((sea - elev) / 0.25, 0.0, 1.0)          # ocean depth
    alt = np.clip((elev - sea) / 0.18, 0.0, 1.0)            # land altitude

    img = np.zeros((h, w, 3), np.float32)
    # oceans: deep navy → coastal teal
    img[..., 0] = 0.05 + 0.10 * (1 - depth)
    img[..., 1] = 0.22 + 0.25 * (1 - depth)
    img[..., 2] = 0.45 + 0.25 * (1 - depth)
    # land: green lowlands → brown highlands
    lr = 0.13 + 0.38 * alt
    lg = 0.42 - 0.10 * alt
    lb = 0.13 + 0.06 * alt
    img[land] = np.stack([lr, lg, lb], -1)[land]
    # polar ice caps (latitude + a noisy edge), over land and sea
    ice = lat + 0.07 * fbm(h, w, octaves=4, seed=seed + 1) > 0.93
    img[ice[..., 0] if ice.ndim == 3 else ice] = (0.92, 0.94, 0.97)
    # subtle relief shading from the east elevation gradient
    shade = np.clip(1.0 + 2.0 * np.gradient(elev, axis=1), 0.75, 1.2)
    img *= shade[..., None]
    return np.clip(img, 0.0, 1.0)


def grid(size=512, n=12, line=3) -> np.ndarray:
    """Woven-cloth grid: warm background with darker grid lines
    (the mesh.jpg role)."""
    img = np.full((size, size, 3), (0.82, 0.78, 0.72), np.float32)
    step = size // n
    yy, xx = np.mgrid[0:size, 0:size]
    on_line = ((yy % step) < line) | ((xx % step) < line)
    img[on_line] = (0.30, 0.32, 0.38)
    # thread texture: faint per-row/column brightness variation
    rng = np.random.default_rng(5)
    rowv = 1.0 + 0.04 * rng.standard_normal(size).astype(np.float32)
    colv = 1.0 + 0.04 * rng.standard_normal(size).astype(np.float32)
    img *= (rowv[:, None] * colv[None, :])[..., None]
    return np.clip(img, 0.0, 1.0)


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, arr in [("planet_equirect.png", planet()),
                      ("grid.png", grid())]:
        path = os.path.join(OUT, name)
        Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8)).save(
            path, optimize=True)
        print(f"wrote {path} ({os.path.getsize(path)//1024} KiB)")


if __name__ == "__main__":
    main()
