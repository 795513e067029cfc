"""Incremental timing of the PRODUCTION pipeline at the exact bench config.

bench_stages.py times stage *approximations* in isolation (and its pair
emission is the old (N, S) layout, not the production slot-major one) —
useful for comparing sort algorithms, misleading for attributing the real
frame. This script times nested prefixes of the actual
render_params4d_packed path, so stage cost = difference of adjacent
prefixes, fusion included:

  P0 project            packed params -> Projected
  P1 + bin/sort/csr     bin_splats (slot-major emit + fused kv sort + CSR)
  P2 + slab1 gather     first-slab pair rows + pack_records
  P3 + slab1 composite  first composite_records call
  P4 full frame         all deepening passes + assemble

Prints one JSON line per prefix. Usage: python bench_prod.py [--splats N]
[--tile-h H] [--tile-w W] [--slab M] [--passes K] [--reps R]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _force(out):
    import jax
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[-1])
    jax.block_until_ready(out)
    return out


def timed(fn, *args, reps=5):
    t0 = time.time()
    out = _force(fn(*args))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [fn(*args) for _ in range(reps)]
        _force(outs[-1])
        best = min(best, (time.time() - t0) / reps)
    return out, best, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=10_000_000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tile-h", type=int, default=16)
    ap.add_argument("--tile-w", type=int, default=128)
    ap.add_argument("--slab", type=int, default=512)
    ap.add_argument("--passes", type=int, default=6)
    ap.add_argument("--budget", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_cube_scene
    from fourdgs.core.camera import Camera
    from fourdgs.render import tiles as T
    from fourdgs.render.pipeline import (RenderConfig, _gather_pair_rows,
                                         _pad_pairs, render_params4d_packed)
    from fourdgs.render.project import project_components
    from fourdgs.splats import packed as PK

    n = args.splats
    width, height = 1920, 1088
    camera = Camera.create(position=(420.0, 300.0, 420.0),
                           orientation=(-1.0, -0.7, -1.0),
                           far=5000.0, width=width, height=height)
    cfg = RenderConfig(tile_h=args.tile_h, tile_w=args.tile_w,
                       backend="pallas", max_splats_per_tile=args.slab,
                       max_tiles_per_splat=args.budget, splat_chunk=128,
                       quantized_depth_sort=True,
                       deepening_passes=args.passes,
                       deepening_fraction=0.34)
    pmat = camera.proj_matrix()
    p00, p11 = pmat[0, 0], pmat[1, 1]

    params = _force(build_cube_scene(n))
    t = jnp.asarray(0.0)

    def project(p, t):
        cov4 = PK.cov4_motion(p)
        mx, my, mz, cov3, opacity, sort_mean = PK.slice4d(p, cov4, t, 0.0)
        colors = (p["cr"], p["cg"], p["cb"], p["ca"])
        return project_components(mx, my, mz, cov3, colors, opacity, camera,
                                  sort_mean=sort_mean)

    def binsort(p, t):
        proj = project(p, t)
        return T.bin_splats(proj, p00, p11, width, height,
                            tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                            max_tiles_per_splat=cfg.max_tiles_per_splat,
                            quantized_depth=True)

    def slab1_gather(p, t):
        from fourdgs.ops.composite_pallas import pack_records
        proj = project(p, t)
        binning = T.bin_splats(proj, p00, p11, width, height,
                               tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                               max_tiles_per_splat=cfg.max_tiles_per_splat,
                               quantized_depth=True)
        m = cfg.max_splats_per_tile
        starts = binning.tile_start[:-1]
        counts = binning.tile_start[1:] - starts
        rows0 = _gather_pair_rows(_pad_pairs(binning.pair_splat, m), starts, m)
        live0 = jnp.arange(m, dtype=jnp.int32)[None, :] < counts[:, None]
        return pack_records(proj, rows0, live0, p00, p11)

    def slab1_composite(p, t):
        from fourdgs.ops.composite_pallas import (composite_records,
                                                  identity_carry,
                                                  pack_records)
        proj = project(p, t)
        binning = T.bin_splats(proj, p00, p11, width, height,
                               tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                               max_tiles_per_splat=cfg.max_tiles_per_splat,
                               quantized_depth=True)
        m = cfg.max_splats_per_tile
        starts = binning.tile_start[:-1]
        counts = binning.tile_start[1:] - starts
        rows0 = _gather_pair_rows(_pad_pairs(binning.pair_splat, m), starts, m)
        live0 = jnp.arange(m, dtype=jnp.int32)[None, :] < counts[:, None]
        rec0 = pack_records(proj, rows0, live0, p00, p11)
        px, py, _ = T.tile_pixel_ndc(width, height, cfg.tile_h, cfg.tile_w)
        t_tiles, pix = px.shape
        kx = (px / p00).reshape(t_tiles, 1, pix)
        ky = (py / p11).reshape(t_tiles, 1, pix)
        return composite_records(rec0, jnp.minimum(counts, m).astype(jnp.int32),
                                 kx, ky, identity_carry(t_tiles, px.dtype, pix))

    def frame(p, t):
        return render_params4d_packed(p, camera, t, cfg=cfg)

    prev = 0.0
    for name, fn in [("P0_project", project), ("P1_binsort", binsort),
                     ("P2_slab1_gather", slab1_gather),
                     ("P3_slab1_composite", slab1_composite),
                     ("P4_frame", frame)]:
        out, best, comp = timed(jax.jit(fn), params, t, reps=args.reps)
        print(json.dumps({"prefix": name, "ms": round(best * 1000, 2),
                          "delta_ms": round((best - prev) * 1000, 2),
                          "compile_s": round(comp, 1)}))
        sys.stdout.flush()
        prev = best
        if name == "P1_binsort":
            counts = out.tile_start[1:] - out.tile_start[:-1]
            print(json.dumps({
                "live_pairs": int(out.tile_start[-1]),
                "overflowed": int(out.overflowed),
                "max_tile_pairs": int(jnp.max(counts)),
                "mean_tile_pairs": round(float(jnp.mean(counts)), 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
