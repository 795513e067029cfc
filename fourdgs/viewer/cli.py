"""Headless scene viewer: render demo scenes to PNG frames.

Replaces the reference's GLFW/ImGui interactive app (Application.cpp +
DebugMenus.h) with a CLI: pick a scene, a time (or a time sweep), camera
overrides, and get frames on disk.

    python -m fourdgs.viewer.cli --scene linear --t 12 --out frame.png
    python -m fourdgs.viewer.cli --scene rotation --sweep 0:90:16 --out anim
    python -m fourdgs.viewer.cli --list
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(prog="fourdgs-view", description=__doc__)
    p.add_argument("--scene", default="linear",
                   help="scene name (see --list)")
    p.add_argument("--list", action="store_true", help="list scenes and exit")
    p.add_argument("--t", type=float, default=0.0, help="scene time")
    p.add_argument("--sweep", default=None,
                   help="render a sweep start:stop:frames instead of one t")
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--out", default="frame.png",
                   help="output PNG (or directory prefix for sweeps)")
    p.add_argument("--backend", default="xla", choices=["xla", "pallas", "dense"])
    p.add_argument("--min-opacity", type=float, default=0.0)
    p.add_argument("--no-sort", action="store_true",
                   help="draw in splat-index order (reference's sort toggle)")
    p.add_argument("--cam-pos", default=None, help="x,y,z camera override")
    p.add_argument("--cam-dir", default=None, help="x,y,z orientation override")
    p.add_argument("--background", default="0,0,0,1")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--grid", action="store_true",
                   help="overlay the reference's ground grid (Scenes.h:303)")
    p.add_argument("--axis", action="store_true",
                   help="overlay the xyz axis cross (Scenes.h:304)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from fourdgs.core.camera import Camera
    from fourdgs.io.png import write_png
    from fourdgs.render import dense as dense_mod
    from fourdgs.render import pipeline as pipe_mod
    from fourdgs.render.pipeline import RenderConfig
    from fourdgs.scenes.scenes import SCENES
    from fourdgs.splats.gaussians import Splats2D, Splats3D

    if args.list:
        for name in SCENES:
            print(name)
        return 0

    if args.scene not in SCENES:
        print(f"unknown scene {args.scene!r}; use --list", file=sys.stderr)
        return 2

    splats, st = SCENES[args.scene]()
    campos = tuple(map(float, args.cam_pos.split(","))) if args.cam_pos else st.camera_position
    camdir = tuple(map(float, args.cam_dir.split(","))) if args.cam_dir else st.camera_orientation
    bg = tuple(map(float, args.background.split(",")))
    cam = Camera.create(position=campos, orientation=camdir,
                        width=args.width, height=args.height)

    if args.backend == "pallas":
        cfg = RenderConfig(tile_h=8, tile_w=128, backend="pallas", background=bg)
    else:
        cfg = RenderConfig(background=bg)

    def render_at(t):
        if isinstance(splats, Splats2D):
            img = dense_mod.render_splats2d(splats, cam, background=bg)
        elif isinstance(splats, Splats3D):
            if args.backend == "dense":
                img = dense_mod.render_splats3d(splats, cam, background=bg,
                                                sort=not args.no_sort,
                                                premultiplied=True)
            else:
                img = pipe_mod.render_splats3d(splats, cam, cfg=cfg)
        elif args.backend == "dense":
            img = dense_mod.render_splats4d(splats, cam, t, args.min_opacity,
                                            background=bg, sort=not args.no_sort)
        else:
            img = pipe_mod.render_splats4d(splats, cam, t, args.min_opacity, cfg=cfg)
        if args.grid or args.axis:
            from fourdgs.render import overlay
            if args.grid:
                img = overlay.draw_grid(img, cam)
            if args.axis:
                img = overlay.draw_axis(img, cam)
        return img

    render = jax.jit(render_at)

    if args.sweep:
        start, stop, frames = args.sweep.split(":")
        ts = np.linspace(float(start), float(stop), int(frames))
        os.makedirs(args.out, exist_ok=True)
        for i, t in enumerate(ts):
            t0 = time.time()
            img = np.asarray(render(float(t)))
            path = os.path.join(args.out, f"frame_{i:04d}.png")
            write_png(path, img)
            print(f"{path}  t={t:.2f}  {time.time()-t0:.3f}s")
    else:
        t0 = time.time()
        img = np.asarray(render(args.t))
        write_png(args.out, img)
        print(f"{args.out}  t={args.t:.2f}  {img.shape}  {time.time()-t0:.3f}s "
              f"(mean rgb {img[..., :3].mean():.4f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
