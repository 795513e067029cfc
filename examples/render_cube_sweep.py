"""Render the headline 10M-splat cube from a camera orbit — the visual
counterpart of the reference's Screenshots/screenshot_05.png (README.md:
20-21: "10,000,000 splats ... interactively"), as frames on disk.

    python examples/render_cube_sweep.py [--frames 6] [--n 10000000]

Writes examples/gallery/cube/frame_XX.png using the shipped converged
configuration (exact head + streaming banded-OIT tail, zero truncation).
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "gallery", "cube"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_cube_scene, _force
    from fourdgs.core.camera import Camera
    from fourdgs.io.png import write_png
    from fourdgs.render.autoconfig import auto_render_config
    from fourdgs.render.pipeline import render_params4d_packed
    from fourdgs.splats.packed import morton_order, pad_packed_params

    os.makedirs(args.out, exist_ok=True)
    cfg = auto_render_config(args.n, args.width, args.height)
    params = _force(pad_packed_params(
        morton_order(build_cube_scene(args.n)), cfg.tail_chunk))

    for k in range(args.frames):
        ang = 2 * math.pi * k / args.frames
        r, y = 580.0, 300.0
        pos = (r * math.cos(ang), y, r * math.sin(ang))
        cam = Camera.create(position=pos,
                            orientation=(-pos[0], -y * 0.7, -pos[2]),
                            far=5000.0, width=args.width,
                            height=args.height)
        t0 = time.time()
        img, aux = jax.jit(lambda p: render_params4d_packed(
            p, cam, 0.0, cfg=cfg, return_aux=True))(params)
        img = np.asarray(img)
        path = os.path.join(args.out, f"frame_{k:02d}.png")
        write_png(path, img)
        print(f"{path} mean_rgb={img[..., :3].mean():.4f} "
              f"resid={float(aux['resid_transmittance']):.1e} "
              f"overflow={int(aux['overflowed'])} "
              f"({time.time() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
