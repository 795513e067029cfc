"""Per-stage timing harness for the render pipeline.

The reference's only performance tooling is an ImGui FPS readout
(DebugMenus.h:114) plus optional RenderDoc hooks in the sorter
(radix_sort.hpp:16-21). Here every pipeline stage can be timed as its own
jit (device-synchronized, best-of-k) and a whole frame can be captured with
jax.profiler for trace viewing.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Tuple

import jax


def time_fn(fn: Callable, *args, reps: int = 5, warmup: int = 1) -> float:
    """Best-of-reps wall time of jit(fn)(*args), synchronized."""
    jfn = jax.jit(fn)
    for _ in range(warmup):
        jax.block_until_ready(jfn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(jfn(*args))
        best = min(best, time.time() - t0)
    return best


def profile_pipeline(params: Dict, camera, t, cfg, reps: int = 3) -> List[Tuple[str, float]]:
    """Cumulative stage timings of the packed 4D pipeline. Each entry times
    a jit that runs the pipeline *up to* that stage, so differences between
    consecutive rows approximate per-stage cost (fusion means stages are not
    perfectly separable — treat as a guide)."""
    from fourdgs.render.pipeline import (_gather_tile_lists,
                                         render_params4d_packed)
    from fourdgs.render.project import project_components
    from fourdgs.render.sort import front_to_back_order
    from fourdgs.render.tiles import bin_splats
    from fourdgs.splats import packed as PK

    pmat = camera.proj_matrix()
    p00, p11 = pmat[0, 0], pmat[1, 1]

    def upto_project(ps):
        cov4 = PK.cov4_motion(ps)
        mx, my, mz, cov3, opacity, sort_mean = PK.slice4d(ps, cov4, t)
        colors = (ps["cr"], ps["cg"], ps["cb"], ps["ca"])
        return project_components(mx, my, mz, cov3, colors, opacity, camera,
                                  sort_mean=sort_mean)

    quant = getattr(cfg, "quantized_depth_sort", False)

    def upto_order(ps):
        proj = upto_project(ps)
        if quant:
            return proj
        order = front_to_back_order(proj.depth)
        return jax.tree_util.tree_map(lambda a: a[order], proj)

    def upto_bin(ps):
        proj = upto_order(ps)
        return bin_splats(proj, p00, p11, camera.width, camera.height,
                          tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                          max_tiles_per_splat=cfg.max_tiles_per_splat,
                          quantized_depth=quant)

    def upto_gather(ps):
        proj = upto_order(ps)
        binning = bin_splats(proj, p00, p11, camera.width, camera.height,
                             tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                             max_tiles_per_splat=cfg.max_tiles_per_splat,
                             quantized_depth=quant)
        return _gather_tile_lists(proj, binning, cfg, None)

    def full(ps):
        return render_params4d_packed(ps, camera, t, cfg=cfg)

    out = []
    for name, fn in [("project", upto_project), ("depth-order", upto_order),
                     ("tile-sort", upto_bin), ("tile-gather", upto_gather),
                     ("full-frame", full)]:
        out.append((name, time_fn(fn, params, reps=reps)))
    return out


def trace(fn: Callable, *args, log_dir: str = "/tmp/fourdgs_trace"):
    """Capture a jax.profiler trace of one call (view with tensorboard or
    xprof)."""
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(*args))  # compile outside the trace
    with jax.profiler.trace(log_dir):
        jax.block_until_ready(jfn(*args))
    return log_dir
