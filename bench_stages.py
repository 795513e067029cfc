"""Per-stage timing of the 10M-splat headline frame on real TPU.

Times each pipeline stage in isolation (own jit, donated inputs where it
matters) so optimization work is aimed at measured numbers, not guesses:

  project   packed params -> Projected (EWA + slice + cull)
  emit      pair key construction (no sort)
  sort      the (tile|depth, splat) pair sort             <- round-1: ~40%
  gather    pack_records (random gather into tile lists)  <- round-1: ~11%
  composite pallas tile compositor                        <- round-1: ~30%
  frame     the whole thing in one jit

Also reports per-stage compile seconds (the 699 s round-1 compile needs an
owner). Prints one JSON line per stage; artifact-friendly.

Usage: python bench_stages.py [--splats N] [--reps R]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _force(out):
    """Force completion with a host fetch: on the tunneled TPU backend,
    block_until_ready alone can return before lazily-enqueued work runs —
    fetching one scalar flushes the queue and gives honest timings."""
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
        # Chain `reps` back-to-back dispatches between forces so the fixed
        # flush/dispatch overhead amortizes out of the per-call number.
        t0 = time.time()
        outs = [fn(*args) for _ in range(reps)]
        _force(outs[-1])
        best = min(best, (time.time() - t0) / reps)
    return out, best, compile_s


# Speed-of-light peaks, TPU v5e (public spec): 819 GB/s HBM, 197 bf16
# TFLOP/s MXU; VPU f32 elementwise ~= 8x128 lanes x 4 ALUs x 0.94 GHz.
HBM_GBPS = 819.0
VPU_TFLOPS = 3.85
MXU_TFLOPS_BF16 = 197.0


def emit(name, ms, compile_s, note="", gb=None, gflop=None):
    """Per-stage record; with a bytes/flops model attached, also reports
    the roofline time (max of the HBM and VPU bounds) and the fraction of
    speed-of-light achieved — the 'is 65M splats/s good?' answer
    (VERDICT round 2, missing #4)."""
    rec = {"stage": name, "ms": round(ms * 1000, 2),
           "compile_s": round(compile_s, 1), "note": note}
    if gb is not None:
        sol_ms = max(gb / HBM_GBPS,
                     (gflop or 0.0) / (VPU_TFLOPS * 1000.0)) * 1000.0
        rec["model_gb"] = round(gb, 3)
        if gflop:
            rec["model_gflop"] = round(gflop, 2)
        rec["sol_ms"] = round(sol_ms, 3)
        rec["sol_frac"] = round(sol_ms / (ms * 1000.0 + 1e-9), 3)
    print(json.dumps(rec))
    sys.stdout.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=10_000_000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--stages", default="project,emit,sort,gather,composite,frame")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_cube_scene
    from fourdgs.core.camera import Camera
    from fourdgs.render.pipeline import (RenderConfig, _gather_tile_lists,
                                         render_params4d_packed)
    from fourdgs.render import tiles as T
    from fourdgs.render.project import project_components
    from fourdgs.splats import packed as PK

    n = args.splats
    width, height = 1920, 1088
    stages = set(args.stages.split(","))

    t0 = time.time()
    params = _force(build_cube_scene(n))
    print(json.dumps({"stage": "build_scene", "ms": round((time.time() - t0) * 1000, 2)}))
    camera = Camera.create(position=(420.0, 300.0, 420.0),
                           orientation=(-1.0, -0.7, -1.0),
                           far=5000.0, width=width, height=height)
    # The shipped bench configuration (bench.py round 3).
    cfg = RenderConfig(tile_h=16, tile_w=128, backend="pallas",
                       max_splats_per_tile=512, max_tiles_per_splat=4,
                       splat_chunk=128, quantized_depth_sort=True,
                       sort_compact_keep_cols=512, big_splat_budget=16,
                       deepening_passes=6, deepening_fraction=0.34,
                       depth_prune_cap=3072)

    pmat = camera.proj_matrix()
    p00, p11 = pmat[0, 0], pmat[1, 1]

    # ---- stage: project ----------------------------------------------------
    def f_project(p, t):
        cov4 = PK.cov4_motion(p)
        mx, my, mz, cov3, opacity, sort_mean = PK.slice4d(p, cov4, t, 0.0)
        colors = (p["cr"], p["cg"], p["cb"], p["ca"])
        return project_components(mx, my, mz, cov3, colors, opacity, camera,
                                  sort_mean=sort_mean)

    jp = jax.jit(f_project)
    proj = None
    if "project" in stages or not {"emit", "sort", "gather", "composite"}.isdisjoint(stages):
        proj, best, comp = timed(jp, params, jnp.asarray(0.0), reps=args.reps)
        # 20 param components read + ~14 Projected fields written; ~350
        # flops/splat (cov4 + slice + EWA + eigen).
        emit("project", best, comp, gb=34 * n * 4 / 1e9,
             gflop=350 * n / 1e9)

    # ---- stage: emit (pair keys, no sort) ----------------------------------
    def f_pairs(pr):
        nlocal = pr.count
        ny, nx = T.tile_grid(width, height, cfg.tile_h, cfg.tile_w)
        num_tiles = ny * nx
        hx_ndc, hy_ndc = pr.half_extent_ndc(p00, p11)
        cx = (pr.mx + 1.0) * 0.5 * width
        cy = (1.0 - pr.my) * 0.5 * height
        hx = hx_ndc * 0.5 * width
        hy = hy_ndc * 0.5 * height
        tx0 = jnp.clip(jnp.floor((cx - hx) / cfg.tile_w), 0, nx - 1).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor((cx + hx) / cfg.tile_w), 0, nx - 1).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor((cy - hy) / cfg.tile_h), 0, ny - 1).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor((cy + hy) / cfg.tile_h), 0, ny - 1).astype(jnp.int32)
        on_screen = ((cx + hx >= 0) & (cx - hx <= width) &
                     (cy + hy >= 0) & (cy - hy <= height))
        alive = pr.valid & on_screen
        nx_span = tx1 - tx0 + 1
        ny_span = ty1 - ty0 + 1
        span = nx_span * ny_span
        mts = cfg.max_tiles_per_splat
        slot = jnp.arange(mts, dtype=jnp.int32)
        sy = slot[None, :] // jnp.maximum(nx_span, 1)[:, None]
        sx = slot[None, :] % jnp.maximum(nx_span, 1)[:, None]
        pair_live = alive[:, None] & (slot[None, :] < span[:, None]) & (sy < ny_span[:, None])
        tid = (ty0[:, None] + sy) * nx + (tx0[:, None] + sx)
        tid = jnp.where(pair_live, tid, num_tiles)
        dist = 1.0 / jnp.maximum(pr.depth, 1e-30)
        dbits = jax.lax.bitcast_convert_type(dist, jnp.int32) >> (32 - T.QUANT_DEPTH_BITS)
        dbits = jnp.clip(dbits, 0, (1 << T.QUANT_DEPTH_BITS) - 1)
        key = (tid << T.QUANT_DEPTH_BITS) | dbits[:, None]
        key = jnp.where(pair_live, key, jnp.iinfo(jnp.int32).max)
        sidx = jnp.broadcast_to(jnp.arange(nlocal, dtype=jnp.int32)[:, None], tid.shape)
        return key.reshape(-1), sidx.reshape(-1), jnp.sum(pair_live)

    key = sidx = None
    if not {"emit", "sort", "gather", "composite"}.isdisjoint(stages):
        jf = jax.jit(f_pairs)
        (key, sidx, live), best, comp = timed(jf, proj, reps=args.reps)
        s_slots = key.shape[0]
        emit("emit", best, comp,
             note=f"live_pairs={int(live):,} of {s_slots:,}",
             gb=(8 * n + 2 * s_slots) * 4 / 1e9, gflop=40 * s_slots / 1e9)

    # ---- stage: prune + rowsort-compaction ---------------------------------
    if "sort" in stages:
        ny0, nx0 = T.tile_grid(width, height, cfg.tile_h, cfg.tile_w)

        def f_prune(k):
            from fourdgs.ops.lookup_pallas import apply_cutkeys
            cut = T.depth_prune_cutkeys(k, ny0 * nx0, cfg.depth_prune_cap)
            return apply_cutkeys(k, cut)
        key_pruned, best, comp = timed(jax.jit(f_prune), key, reps=args.reps)
        emit("prune", best, comp,
             note=f"live after prune "
                  f"{int(jnp.sum(key_pruned != jnp.iinfo(jnp.int32).max)):,}",
             gb=key.shape[0] * 4 * 2 / 1e9,
             gflop=key.shape[0] * 50 / 1e9)

        def f_rowsort(k, v):
            return T.compact_pairs(k, v, jnp.iinfo(jnp.int32).max,
                                   cfg.sort_compact_keep_cols)
        (ck, cv, dropped), best, comp = timed(jax.jit(f_rowsort), key_pruned,
                                              sidx, reps=args.reps)
        emit("rowsort_compact", best, comp,
             note=f"-> {ck.shape[0]:,} slots, dropped {int(dropped)}",
             gb=key.shape[0] * 2 * 4 * 2 / 1e9)

        f_gsort = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1,
                                                    is_stable=False))
        _, best, comp = timed(f_gsort, ck, cv, reps=args.reps)
        emit("sort.global_compacted", best, comp,
             gb=ck.shape[0] * 2 * 4 * 2 / 1e9)

    # ---- stage: sort variants ----------------------------------------------
    if "sortvariants" in stages:
        f_sort = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=False))
        (_, _), best, comp = timed(f_sort, key, sidx, reps=args.reps)
        # SOL for any sort: kv read once + written once.
        emit("sort.kv_unstable_i32", best, comp,
             gb=key.shape[0] * 2 * 4 * 2 / 1e9)

        f_sort_st = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=True))
        _, best, comp = timed(f_sort_st, key, sidx, reps=args.reps)
        emit("sort.kv_stable_i32", best, comp)

        def f_sort64(k, v):
            packed = (k.astype(jnp.int64) << 24) | v.astype(jnp.int64)
            s = jax.lax.sort(packed, is_stable=False)
            return (s >> 24).astype(jnp.int32), (s & 0xFFFFFF).astype(jnp.int32)
        _, best, comp = timed(jax.jit(f_sort64), key, sidx, reps=args.reps)
        emit("sort.packed_i64", best, comp)

        # key-only sort (lower bound for the sort primitive itself)
        f_k = jax.jit(lambda k: jax.lax.sort(k, is_stable=False))
        _, best, comp = timed(f_k, key, reps=args.reps)
        emit("sort.key_only_i32", best, comp)

        # smaller array: budget-2 pairs (what compaction would buy)
        k2 = key.reshape(-1, 4)[:, :2].reshape(-1)
        v2 = sidx.reshape(-1, 4)[:, :2].reshape(-1)
        _, best, comp = timed(f_sort, k2, v2, reps=args.reps)
        emit("sort.kv_unstable_i32_half", best, comp, note="20M pairs")

    # ---- stage: gather + composite ------------------------------------------
    if not {"gather", "composite"}.isdisjoint(stages):
        f_sorted = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=False))
        key_s, splat_s = jax.block_until_ready(f_sorted(key, sidx))
        ny, nx = T.tile_grid(width, height, cfg.tile_h, cfg.tile_w)
        num_tiles = ny * nx

        def f_csr(ks):
            tile_ids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
            bounds = jnp.minimum(tile_ids, num_tiles) << T.QUANT_DEPTH_BITS
            return jnp.searchsorted(ks, bounds, side="left").astype(jnp.int32)
        tile_start, best, comp = timed(jax.jit(f_csr), key_s, reps=args.reps)
        emit("csr_searchsorted", best, comp)

        binning = T.TileBinning(pair_splat=splat_s, pair_tile=key_s,
                                tile_start=tile_start,
                                overflowed=jnp.int32(0))

        def f_gather(pr, b):
            return _gather_tile_lists(pr, b, cfg, num_tiles)
        (tile_splat, tile_live), best, comp = timed(jax.jit(f_gather), proj,
                                                    binning, reps=args.reps)
        tm = tile_splat.size
        emit("gather_tile_lists", best, comp, gb=tm * 4 * 3 / 1e9)

        if "composite" in stages:
            from fourdgs.ops.composite_pallas import (composite_records,
                                                      identity_carry,
                                                      pack_records)

            def f_pack(pr, ts, tl):
                return pack_records(pr, ts, tl, p00, p11)
            rec, best, comp = timed(jax.jit(f_pack), proj, tile_splat,
                                    tile_live, reps=args.reps)
            emit("pack_records", best, comp,
                 note=f"records {tuple(rec.shape)}",
                 gb=(rec.size * 4 + rec.size // 16 * 40) / 1e9)

            px, py, _ = T.tile_pixel_ndc(width, height, cfg.tile_h, cfg.tile_w)
            t_tiles = px.shape[0]
            kx = (px / p00).reshape(t_tiles, 1, -1)
            ky = (py / p11).reshape(t_tiles, 1, -1)
            counts = jnp.sum(tile_live, axis=1).astype(jnp.int32)

            def f_comp(r, c, x, y):
                return composite_records(r, c, x, y,
                                         identity_carry(t_tiles, jnp.float32))
            out, best, comp = timed(jax.jit(f_comp), rec, counts, kx, ky,
                                    reps=args.reps)
            mean_cnt = float(jnp.mean(counts))
            max_cnt = int(jnp.max(counts))
            # ~30 VPU flops per (record, pixel) over the live records
            # of every tile, 2048-pixel tiles at this config.
            npix = kx.shape[-1]
            emit("composite_pallas", best, comp,
                 note=f"counts mean={mean_cnt:.0f} max={max_cnt}",
                 gb=rec.size * 4 / 1e9,
                 gflop=float(jnp.sum(counts)) * npix * 30 / 1e9)

    # ---- full frame ----------------------------------------------------------
    if "frame" in stages:
        render = jax.jit(lambda s, t: render_params4d_packed(s, camera, t, cfg=cfg))
        img, best, comp = timed(render, params, jnp.asarray(0.0), reps=args.reps)
        emit("frame", best, comp,
             note=f"mean rgb {float(jnp.mean(img[..., :3])):.4f}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
