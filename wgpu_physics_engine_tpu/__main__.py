"""CLI entry points — the analog of the reference's five binary crates
(``simulations/*/src/main.rs``): run a scene headless, write PNG/GIF
artifacts, or benchmark.

    python -m wgpu_physics_engine_tpu cube        --out cube.png
    python -m wgpu_physics_engine_tpu textured    --out tex.png
    python -m wgpu_physics_engine_tpu globe       --out globe.png
    python -m wgpu_physics_engine_tpu particles   --seconds 4 --gif box.gif
    python -m wgpu_physics_engine_tpu granular    --particles 100000 --gif pile.gif
    python -m wgpu_physics_engine_tpu cloth       --seconds 5 --gif cloth.gif
    python -m wgpu_physics_engine_tpu datagen     --worlds 64 --frames 8
    python -m wgpu_physics_engine_tpu datagen     --family granular --worlds 32
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="wgpu_physics_engine_tpu")
    p.add_argument("scene", choices=["cube", "textured", "globe", "particles",
                                     "granular", "cloth", "datagen", "decode"])
    p.add_argument("--out", default=None, help="PNG path for a single frame")
    p.add_argument("--gif", default=None, help="animated GIF path")
    p.add_argument("--live", action="store_true",
                   help="stream frames to the terminal (ANSI truecolor)")
    p.add_argument("--seconds", type=float, default=3.0,
                   help="simulated seconds (cloth/particles)")
    p.add_argument("--fps", type=int, default=20, help="GIF frames/sec")
    p.add_argument("--size", type=int, nargs=2, default=(256, 256),
                   metavar=("H", "W"))
    p.add_argument("--grid", type=int, default=None,
                   help="cloth particles per side (default 60)")
    p.add_argument("--particles", type=int, default=None,
                   help="granular: particle count (default 20000)")
    p.add_argument("--self-collide", action="store_true",
                   help="cloth: enable cloth-cloth contact (spatial hash)")
    p.add_argument("--worlds", type=int, default=64)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--family", choices=["cloth", "granular"],
                   default="cloth",
                   help="datagen: model family (granular = per-world "
                        "material constants via the traced params vector)")
    p.add_argument("--outdir", default="datagen_out")
    p.add_argument("--random-cameras", action="store_true",
                   help="datagen: randomize viewpoint per world")
    p.add_argument("--codec-k", type=int, default=None, metavar="K",
                   help="datagen: compress frames on device with the "
                        "fixed-rate DCT codec, keeping K of 64 coefficients "
                        "(64/K x less egress; decode with parallel.codec)")
    p.add_argument("--indir", default="datagen_out",
                   help="decode: directory of encoded frame_*.npy shards")
    p.add_argument("--png", action="store_true",
                   help="decode: also write per-world PNGs (else .npy only)")
    p.add_argument("--quality", type=float, default=None,
                   help="codec quality (encode: quantization scale, default "
                        "1.0; decode: normally read from the run's "
                        "codec_meta.json sidecar)")
    p.add_argument("--force-quality", action="store_true",
                   help="decode: trust --quality even when the sidecar is "
                        "missing or disagrees")
    args = p.parse_args(argv)

    from .core import config as cfg
    from .models import scenes
    from .utils import viewer

    t0 = time.time()
    if args.scene == "decode":
        import glob
        import os

        import numpy as np

        from .parallel import codec

        os.makedirs(args.outdir, exist_ok=True)
        paths = sorted(glob.glob(os.path.join(args.indir, "frame_*.npy")))
        if not paths:
            print(f"no frame_*.npy shards in {args.indir}")
            return 1
        # header-only peek (mmap loads no data): raw-uint8 runs (datagen
        # without --codec-k) have nothing to decode and need no sidecar
        def _is_codec(p):
            a = np.load(p, mmap_mode="r")
            return a.dtype == np.int8 and a.ndim == 5
        if not any(_is_codec(p) for p in paths):
            for path in paths:
                print(f"skip {path}: not a codec shard")
            print("decode: 0 world-frames (no codec shards)")
            return 0
        # quality comes from the run's sidecar — a wrong value silently
        # rescales every decoded pixel, so refuse to guess
        try:
            meta = codec.read_meta(args.indir)
        except FileNotFoundError:
            meta = None
        except ValueError as e:
            print(f"{args.indir}: {e}")
            return 1
        if meta is None:
            if not args.force_quality:
                print(f"{args.indir}: no codec_meta.json sidecar; pass "
                      "--quality Q --force-quality to decode anyway")
                return 1
            quality = args.quality if args.quality is not None else 1.0
        else:
            quality = meta["quality"]
            if (args.quality is not None and args.quality != quality
                    and not args.force_quality):
                print(f"--quality {args.quality} disagrees with the sidecar "
                      f"({quality}); drop the flag or pass --force-quality")
                return 1
            if args.force_quality and args.quality is not None:
                quality = args.quality
        n = 0
        for path in paths:
            enc = np.load(path)
            if enc.dtype != np.int8 or enc.ndim != 5:
                print(f"skip {path}: not a codec shard "
                      f"({enc.dtype}, {enc.shape})")
                continue
            imgs = codec.decode(enc, quality=quality)
            stem = os.path.splitext(os.path.basename(path))[0]
            np.save(os.path.join(args.outdir, f"{stem}_rgb.npy"), imgs)
            if args.png:
                from PIL import Image

                for w in range(imgs.shape[0]):
                    Image.fromarray(imgs[w]).save(os.path.join(
                        args.outdir, f"{stem}_w{w:04d}.png"))
            n += imgs.shape[0]
            print(f"{path} -> {stem}_rgb.npy {imgs.shape}")
        print(f"decode: {n} world-frames in {time.time()-t0:.1f}s")
        return 0

    if args.scene == "datagen":
        import jax
        import numpy as np
        import os

        from .parallel import datagen
        from . import native

        quality = args.quality if args.quality is not None else 1.0
        if args.family == "granular":
            from .models.granular import GranularConfig
            from .parallel import datagen_granular

            gc = GranularConfig(num_particles=args.particles or 20_000)
            gen = datagen_granular.generate_granular_dataset(
                gc, n_worlds=args.worlds, n_frames=args.frames,
                steps_per_frame=12, key=jax.random.key(0),
                fb_size=tuple(args.size),
                randomize_cameras=args.random_cameras,
                codec_k=args.codec_k, codec_quality=quality)
        else:
            c = cfg.ClothConfig() if args.grid is None else cfg.ClothConfig(
                height=args.grid, width=args.grid)
            gen = datagen.generate_trajectory_dataset(
                c, n_worlds=args.worlds, n_frames=args.frames,
                steps_per_frame=24, key=jax.random.key(0),
                fb_size=tuple(args.size),
                randomize_cameras=args.random_cameras, codec_k=args.codec_k,
                codec_quality=quality)
        os.makedirs(args.outdir, exist_ok=True)
        if args.codec_k is not None:
            from .parallel import codec

            codec.write_meta(args.outdir, args.codec_k, quality, args.size)
        writer = native.ShardWriter() if native.available() else None
        n = 0
        for f, imgs, _ in gen:
            path = os.path.join(args.outdir, f"frame_{f:05d}.npy")
            if writer is not None:
                # async C++ writer: disk IO overlaps the next TPU launch
                writer.submit(path, imgs)
            else:
                np.save(path, imgs)
            n += imgs.shape[0]
            print(f"frame {f}: {imgs.shape} -> {path}")
        if writer is not None:
            written = writer.close()
            print(f"async writer: {written} shards")
        print(f"datagen: {n} world-frames in {time.time()-t0:.1f}s")
        return 0

    if args.scene == "cube":
        s = scenes.CubeScene()
    elif args.scene == "textured":
        s = scenes.TexturedCubeScene()
    elif args.scene == "globe":
        s = scenes.GlobeScene()
    elif args.scene == "particles":
        s = scenes.FreeParticleScene(
            config=cfg.FreeParticleConfig(num_particles=10))
    elif args.scene == "granular":
        from .models.granular import GranularConfig

        s = scenes.GranularScene(
            config=GranularConfig(num_particles=args.particles or 20_000))
    else:
        c = cfg.ClothConfig() if args.grid is None else cfg.ClothConfig(
            height=args.grid, width=args.grid)
        s = scenes.ClothScene(config=c, self_collide=args.self_collide)

    h, w = args.size
    # App::resize before the first frame: sync the camera aspect to the
    # output size (the reference's fixed 800x600 window matches its
    # default aspect; arbitrary --size otherwise stretches the scene)
    s.resize(w, h)
    if args.live:
        from .utils import viewer as V

        V.live(s, seconds=args.seconds, fps=args.fps, size=(h, w))
        return 0
    if args.gif:
        frames = []
        n = int(args.seconds * args.fps)
        for i in range(n):
            s.update(1.0 / args.fps)
            frames.append(s.render(h, w))
        viewer.save_gif(frames, args.gif, fps=args.fps)
        print(f"wrote {args.gif}: {n} frames in {time.time()-t0:.1f}s")
    else:
        if args.scene in ("cloth", "particles", "granular"):
            if hasattr(s, "simulate"):
                s.simulate(args.seconds)
            else:
                s.update(args.seconds)
        out = args.out or f"{args.scene}.png"
        viewer.save_png(s.render(h, w), out)
        print(f"wrote {out} in {time.time()-t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
