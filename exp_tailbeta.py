"""Measurement harness: tail parity (vs exhausted exact composite) as a
function of the within-band depth-weight beta (ask: p99 0.257 -> <= 0.08)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_cube_scene
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
    img_x, aux_x = jax.jit(lambda p: render_params4d_packed(
        p, cam, 0.0, cfg=cfg_exact, return_aux=True))(params)
    ix = np.asarray(img_x)[..., :3]
    print(f"exact resid {float(aux_x['resid_transmittance']):.2e} "
          f"mean {ix.mean():.4f}", flush=True)
    betas = [float(b) for b in (sys.argv[1:] or [0, 4, 8, 12, 16, 20])]
    for beta in betas:
        cfg_tail = RenderConfig(backend="pallas", **kw,
                                max_splats_per_tile=384,
                                quantized_depth_sort=True,
                                depth_prune_cap=384, depth_prune_safety=1.2,
                                deepening_fraction=1.0,
                                tail_mode="banded", tail_bands=8,
                                tail_block=(16, 16), tail_depth_beta=beta)
        img_t, aux_t = jax.jit(lambda p: render_params4d_packed(
            p, cam, 0.0, cfg=cfg_tail, return_aux=True))(params)
        it = np.asarray(img_t)[..., :3]
        d = np.abs(it - ix)
        print(f"beta {beta:5.1f}: mean_rgb {it.mean():.4f} "
              f"(rel {abs(it.mean()-ix.mean())/ix.mean()*100:.2f}%) "
              f"mean|err| {d.mean():.4f} p99 {np.percentile(d, 99):.3f} "
              f"max {d.max():.3f} resid "
              f"{float(aux_t['resid_transmittance']):.1e}", flush=True)


if __name__ == "__main__":
    main()
