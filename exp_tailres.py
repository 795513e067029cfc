"""Parity vs tail coarse-block resolution + upsample variants."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from bench import build_cube_scene, _force
from fourdgs.core.camera import Camera
from fourdgs.render.pipeline import RenderConfig, render_params4d_packed
from fourdgs.splats.packed import morton_order


def main():
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
    img_x = np.asarray(jax.jit(lambda p: render_params4d_packed(
        p, cam, 0.0, cfg=cfg_exact))(params))[..., :3]
    print(f"exact mean {img_x.mean():.4f}", flush=True)
    for blk in ((16, 16), (8, 16), (4, 16), (2, 16), (16, 8), (8, 8), (4, 8), (2, 4)):
        cfg_tail = RenderConfig(backend="pallas", **kw,
                                max_splats_per_tile=384,
                                quantized_depth_sort=True,
                                depth_prune_cap=384,
                                depth_prune_safety=1.2,
                                deepening_fraction=1.0,
                                tail_mode="banded", tail_bands=8,
                                tail_block=blk)
        f = jax.jit(lambda p: render_params4d_packed(p, cam, 0.0,
                                                     cfg=cfg_tail))
        img_t = _force(f(params))
        t0 = time.time()
        outs = [f(params) for _ in range(8)]
        _force(outs[-1])
        ms = (time.time() - t0) / 8 * 1000
        it = np.asarray(img_t)[..., :3]
        d = np.abs(it - img_x)
        print(f"block {blk}: {ms:6.1f} ms  mean|err| {d.mean():.4f} "
              f"p99 {np.percentile(d, 99):.3f} max {d.max():.3f}",
              flush=True)


if __name__ == "__main__":
    main()
