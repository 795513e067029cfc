"""Experiment: tail_block coarseness vs 1M parity error + 10M frame time.

Not part of the shipped suite — a measurement harness for picking
RenderConfig.tail_block (results recorded in ARCHITECTURE/ROADMAP).
"""
import json
import sys
import time

import numpy as np


def parity(block, chunk=2048):
    import jax
    from bench import build_cube_scene
    from fourdgs.core.camera import Camera
    from fourdgs.render.pipeline import RenderConfig, render_params4d_packed
    from fourdgs.splats.packed import morton_order

    n = 1_000_000
    params = morton_order(build_cube_scene(n, seed=2))
    cam = Camera.create(position=(420.0, 300.0, 420.0),
                        orientation=(-1.0, -0.7, -1.0),
                        far=5000.0, width=1024, height=512)
    kw = dict(tile_h=16, tile_w=128, max_tiles_per_splat=8,
              splat_chunk=128, big_splat_budget=16)
    cfg_exact = RenderConfig(backend="pallas", **kw,
                             max_splats_per_tile=512,
                             quantized_depth_sort=True,
                             deepening_fraction=1.0, deepening_passes=80)
    cfg_tail = RenderConfig(backend="pallas", **kw,
                            max_splats_per_tile=384,
                            quantized_depth_sort=True,
                            depth_prune_cap=384, depth_prune_safety=1.2,
                            deepening_fraction=1.0,
                            tail_mode="banded", tail_bands=8,
                            tail_block=block, tail_chunk=chunk)
    img_x, _ = jax.jit(lambda p: render_params4d_packed(
        p, cam, 0.0, cfg=cfg_exact, return_aux=True))(params)
    img_t, _ = jax.jit(lambda p: render_params4d_packed(
        p, cam, 0.0, cfg=cfg_tail, return_aux=True))(params)
    ix = np.asarray(img_x)[..., :3]
    it = np.asarray(img_t)[..., :3]
    d = np.abs(it - ix)
    return dict(block=list(block),
                mean_rel_err=float(abs(it.mean() - ix.mean())
                                   / max(ix.mean(), 1e-6)),
                mean_abs_err=float(d.mean()),
                p99_abs_err=float(np.percentile(d, 99)),
                max_abs_err=float(d.max()))


def frame_time(block):
    import os
    os.environ["FOURDGS_BENCH_TAIL_BLOCK"] = f"{block[0]},{block[1]}"
    import jax.numpy as jnp
    from bench import bench_setup, _force
    render, params, env = bench_setup()
    img, aux = render(params, jnp.asarray(0.0))
    _force(img)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [render(params, jnp.asarray(0.0)) for _ in range(6)]
        _force(outs[-1][0])
        best = min(best, (time.time() - t0) / 6)
    return best * 1000


if __name__ == "__main__":
    mode = sys.argv[1]
    by, bx = int(sys.argv[2]), int(sys.argv[3])
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 2048
    if mode == "parity":
        r = parity((by, bx), chunk)
        r["chunk"] = chunk
        print(json.dumps(r))
    else:
        print(json.dumps({"block": [by, bx],
                          "frame_ms": round(frame_time((by, bx)), 2)}))
