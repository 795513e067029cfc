"""Diagnose WHERE the tail's local error lives: vs head transmittance,
vs image gradient, vs coarse-block position, vs tile borders."""
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
    img_x = np.asarray(jax.jit(lambda p: render_params4d_packed(
        p, cam, 0.0, cfg=cfg_exact))(params))
    cfg_tail = RenderConfig(backend="pallas", **kw,
                            max_splats_per_tile=384,
                            quantized_depth_sort=True,
                            depth_prune_cap=384, depth_prune_safety=1.2,
                            deepening_fraction=1.0,
                            tail_mode="banded", tail_bands=8,
                            tail_block=(16, 16))
    img_t = np.asarray(jax.jit(lambda p: render_params4d_packed(
        p, cam, 0.0, cfg=cfg_tail))(params))
    ix, it = img_x[..., :3], img_t[..., :3]
    d = np.abs(it - ix).mean(-1)
    p99v = np.percentile(d, 99)
    hot = d > p99v
    print(f"p99 {p99v:.3f}  hot pixels {hot.sum()}")
    # alpha channel as proxy for head opacity: exact img alpha
    a_x = img_x[..., 3]
    print("alpha(exact) overall mean %.3f | at hot %.3f" % (a_x.mean(), a_x[hot].mean()))
    # image gradient magnitude of the exact image
    gy, gx = np.gradient(ix.mean(-1))
    g = np.hypot(gx, gy)
    print("grad overall mean %.4f | at hot %.4f" % (g.mean(), g[hot].mean()))
    # position within the 16x16 coarse block
    ys, xs = np.nonzero(hot)
    print("hot by y%%16 hist:", np.bincount(ys % 16, minlength=16))
    print("hot by x%%16 hist:", np.bincount(xs % 16, minlength=16))
    # tile borders (16x128 tiles)
    border = (ys % 16 == 0) | (ys % 16 == 15)
    print("hot at tile row borders: %.2f%% (expect 12.5%% if uniform)" %
          (100 * border.mean()))
    # brightness: exact vs tail at hot pixels
    print("exact mean at hot %.3f, tail mean at hot %.3f" %
          (ix.mean(-1)[hot].mean(), it.mean(-1)[hot].mean()))
    # sign: is the tail too bright or too dark at hot pixels?
    sgn = (it.mean(-1) - ix.mean(-1))[hot]
    print("tail-exact at hot: mean %+0.3f, frac positive %.2f" %
          (sgn.mean(), (sgn > 0).mean()))
    # err histogram by exact-image brightness deciles
    b = ix.mean(-1)
    qs = np.quantile(b, np.linspace(0, 1, 11))
    for i in range(10):
        m = (b >= qs[i]) & (b <= qs[i+1])
        print(f"brightness decile {i}: mean err {d[m].mean():.4f}")


if __name__ == "__main__":
    main()
