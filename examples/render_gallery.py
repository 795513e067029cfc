"""Render every demo scene to a PNG gallery (examples/gallery/).

The visual-regression analog of the reference's Screenshots/ directory —
run after changes to eyeball all 11 scenes:

    python examples/render_gallery.py [--size 320] [--out examples/gallery]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "gallery"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--capped", action="store_true",
                    help="use the fixed-capacity compositor instead of "
                         "the converged exact-head + banded-tail stack")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from fourdgs.core.camera import Camera
    from fourdgs.io.png import write_png
    from fourdgs.render import dense, overlay, pipeline
    from fourdgs.render.pipeline import RenderConfig
    from fourdgs.scenes.scenes import SCENES
    from fourdgs.splats.gaussians import Splats2D, Splats3D

    from fourdgs.render.autoconfig import auto_render_config

    os.makedirs(args.out, exist_ok=True)
    if args.capped:
        cfg = RenderConfig(max_splats_per_tile=1024, splat_chunk=64)
    else:
        # CONVERGED default (round 5): every pair composited — exact head
        # + streaming banded-OIT tail, matching the reference's
        # no-depth-cap blend (Splat4DFragShader.GLSL:22-31). At gallery
        # scene sizes the head composites nearly everything; the tail
        # guarantees zero truncation for the deep scenes.
        cfg = auto_render_config(400_000, args.size, args.size,
                                 tail_chunk=1024)

    # A mid-animation time per scene (where the 4D structure shows).
    times = {"linear": 20.0, "nonlinear": 30.0, "rotation": 30.0,
             "combined": 20.0, "clouds": 10.0, "broken": 30.0,
             "square": 30.0, "gaussians4d": 0.5}

    # Closer viewpoints for the dotted surface scenes (the reference's
    # "Cam_2" menu preset, Scenes.h:389-393).
    cam_override = {"linear": ((12.0, 40.0, 40.0), (0.0, -1.0, -1.0)),
                    "broken": ((30.0, 40.0, 40.0), (0.0, -1.0, -1.0)),
                    "square": ((0.0, 40.0, 40.0), (0.0, -1.0, -1.0))}

    for name, fn in SCENES.items():
        t0 = time.time()
        splats, st = fn()
        pos, ori = cam_override.get(
            name, (st.camera_position, st.camera_orientation))
        cam = Camera.create(position=pos, orientation=ori,
                            width=args.size, height=args.size)
        t = times.get(name, 0.0)
        if isinstance(splats, Splats2D):
            img = dense.render_splats2d(splats, cam)
        elif isinstance(splats, Splats3D):
            img = dense.render_splats3d(splats, cam, premultiplied=True)
        elif splats.count == 0:
            import jax.numpy as jnp
            img = jnp.zeros((args.size, args.size, 4)).at[..., 3].set(1.0)
            img = overlay.draw_grid(img, cam, x_count=20, z_count=20)
            img = overlay.draw_axis(img, cam)
        else:
            img = pipeline.render_splats4d(splats, cam, t,
                                           st.min_opacity, cfg=cfg)
        path = os.path.join(args.out, f"{name}.png")
        write_png(path, np.asarray(img))
        print(f"| {name} | {splats.count:,} | {t:.1f} | "
              f"{float(np.asarray(img)[..., :3].mean()):.4f} |",
              f"({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
