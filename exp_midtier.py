"""Measure the pieces of the three-tier pair emission (ROADMAP r5 gap 1).

At the 10M bench the span histogram is ~42/54/4% for spans 1/2/3-4 while
every splat pays budget(4) slots through rowsort AND the tail kernel's
in-kernel slot walk. A budget-2 main emission + a compacted mid tier
(span 3..4, ~4% of splats) would cut sorted slots 40.9M -> ~23M and halve
the tail walk. This harness measures, on the real bench scene/camera:

  span        exact span histogram among alive splats
  compact2/3  compact_pairs over N with 2 vs 3 sorted operands
              (3 operands = carry packed (spans,idx)+(tid0,dbits) values
              through the sort -> no post-compaction field gather needed
              for EMISSION)
  gatherK     stacked K-row gather at mid capacity (the tail's mid-stream
              field fetch): K = 5 / 8 / 10 / 16 rows of a (K, N) f32
  tail_b4/b2  the main tail stream standalone at budget 4 (status quo)
              vs budget 2 (span window <= 2)
  rowsort     rowsort_compact at 40.9M vs 23M slots
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_cube_scene, bench_setup  # noqa: F401 (env config)


def _force(o):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(o)[0])[-1])
    return o


def timeit(f, *a, reps=8):
    o = _force(jax.jit(f)(*a))
    fj = jax.jit(f)
    ts = []
    for _ in range(3):
        t0 = time.time()
        outs = [fj(*a) for _ in range(reps)]
        _force(outs[-1])
        ts.append((time.time() - t0) / reps)
    return min(ts) * 1000, o


def main():
    from fourdgs.core.camera import Camera
    from fourdgs.render.autoconfig import auto_render_config
    from fourdgs.render.project import project_components
    from fourdgs.render.tiles import (compact_pairs, quantized_depth_bits,
                                      splat_tile_bbox, tile_grid)
    from fourdgs.splats import packed as PK
    from fourdgs.splats.packed import morton_order, pad_packed_params

    n = 10_000_000
    w, h = 1920, 1088
    params = pad_packed_params(morton_order(build_cube_scene(n)), 16384)
    n_pad = params["px"].shape[0]
    camera = Camera.create(position=(420.0, 300.0, 420.0),
                           orientation=(-1.0, -0.7, -1.0),
                           far=5000.0, width=w, height=h)
    cfg = auto_render_config(n, w, h, converged=True)
    pmat = camera.proj_matrix()
    p00, p11 = float(pmat[0, 0]), float(pmat[1, 1])

    @jax.jit
    def project(params):
        cov4 = PK.cov4_motion(params)
        mx, my, mz, cov3, opacity, sort_mean = PK.slice4d(
            params, cov4, jnp.asarray(0.0), 0.0)
        colors = (params["cr"], params["cg"], params["cb"], params["ca"])
        return project_components(mx, my, mz, cov3, colors, opacity, camera,
                                  sort_mean=sort_mean)

    proj = _force(project(params))
    ny, nx = tile_grid(w, h, cfg.tile_h, cfg.tile_w)

    @jax.jit
    def bbox(proj):
        return splat_tile_bbox(proj, p00, p11, w, h, cfg.tile_h, cfg.tile_w)

    alive, tx0, tx1, ty0, ty1 = _force(bbox(proj))
    span = jnp.where(alive, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
    hist = {s: int(jnp.sum(span == s)) for s in range(1, 6)}
    hist["6+"] = int(jnp.sum(span > 5))
    n_alive = int(jnp.sum(alive))
    n_mid = int(jnp.sum((span > 2) & (span <= 4)))
    print(f"alive {n_alive:,} of {n_pad:,}; span hist {hist}; "
          f"mid(3..4) {n_mid:,} = {n_mid / max(n_alive,1):.4f} of alive")

    dead = jnp.iinfo(jnp.int32).max
    dbits = quantized_depth_bits(proj.depth)
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    is_mid = (span > 2) & (span <= 4)

    # Mid population per 8192-row: keep_cols sizing.
    rows = -(-n_pad // 8192)
    frac = n_mid / n_pad
    keep = int(np.ceil((8192 * frac + 6 * np.sqrt(8192 * frac)) / 64) * 64)
    print(f"rows {rows}, mid live frac {frac:.4f}, keep_cols {keep} "
          f"-> capacity {rows * keep:,}")

    # --- compact over N: 2 vs 3 operands -------------------------------
    def compact2(is_mid):
        k = jnp.where(is_mid, iota, dead)
        return compact_pairs(k, k, dead, keep)

    (t2, (ids2, _, drop2)) = timeit(compact2, is_mid)
    print(f"compact 2-op over {n_pad / 1e6:.1f}M: {t2:.2f} ms "
          f"(dropped {int(drop2)})")

    def compact3(is_mid, tx0, ty0, tx1, ty1, dbits):
        k = jnp.where(is_mid, iota, dead)
        v1 = ((tx1 - tx0) << 28) | ((ty1 - ty0) << 26) | iota
        v2 = (((ty0 * nx + tx0) << 20) | dbits)
        # 3-operand row sort (mirrors compact_pairs internals).
        s = k.shape[0]
        row_len = -(-s // rows)
        pad = rows * row_len - s
        kr = k.reshape(row_len, rows).T
        v1r = v1.reshape(row_len, rows).T
        v2r = v2.reshape(row_len, rows).T
        ks, v1s, v2s = jax.lax.sort((kr, v1r, v2r), dimension=1, num_keys=1,
                                    is_stable=False)
        return ks[:, :keep], v1s[:, :keep], v2s[:, :keep]

    t3, _ = timeit(compact3, is_mid, tx0, ty0, tx1, ty1, dbits)
    print(f"compact 3-op over {n_pad / 1e6:.1f}M: {t3:.2f} ms")

    # --- stacked K-row gathers at mid capacity -------------------------
    cap = rows * keep
    idx = jnp.sort(jax.random.randint(jax.random.PRNGKey(1), (cap,), 0,
                                      n_pad))
    for k_rows in (5, 8, 10, 16):
        mat = jnp.zeros((k_rows, n_pad), jnp.float32) + tx0[None, :]
        mat = _force(mat)

        def g(mat, idx):
            return mat[:, idx] * 1.0

        tg, _ = timeit(g, mat, idx)
        print(f"stacked gather {k_rows} rows x {cap:,} idx: {tg:.2f} ms "
              f"({tg * 1e6 / cap:.1f} ns/idx)")

    # --- tail main stream at budget 4 vs 2 -----------------------------
    from fourdgs.ops import tail_pallas as TPL
    from fourdgs.ops.composite_pallas import record_fields

    fields = _force(jax.jit(
        lambda pr: record_fields(pr, p00, p11, pad_to=n_pad))(proj))
    cut = jnp.zeros((ny * nx,), jnp.int32)  # no head: whole image is tail
    chunk = cfg.tail_chunk
    params_row = TPL.tail_params_row(cfg.tile_h, cfg.tile_w, cfg.tail_block,
                                     w, h, p00, p11, 0)
    s_cy, s_cx = cfg.tile_h // 16, cfg.tile_w // 16

    def tail_at(budget):
        def run(fields, alive, tx0, tx1, ty0, ty1, dbits):
            meta, mrows = TPL.tail_meta(alive, tx0, tx1, ty0, ty1, dbits,
                                        chunk, return_rows=True)
            db_s = dbits[: (n_pad // 8192) * 8192].reshape(-1, 8192)[:, :128]
            al_s = alive[: (n_pad // 8192) * 8192].reshape(-1, 8192)[:, :128]
            cuts = TPL.global_band_cuts(
                jnp.where(al_s, db_s, dead).reshape(-1), cfg.tail_bands)
            band, rect, mask = TPL.tail_prepass(mrows, cuts, chunk, budget,
                                                k_bands=cfg.tail_bands)
            return TPL.tail_accumulate(
                fields, meta, band, rect, cut, params_row,
                k_bands=cfg.tail_bands, nx=nx, ny=ny, chunk=chunk,
                budget=budget, s_cy=s_cy, s_cx=s_cx, slot_mask=mask,
                exact_clip=True)
        return run

    for b in (4, 2):
        tb, acc = timeit(tail_at(b), fields, alive, tx0, tx1, ty0, ty1,
                         dbits, reps=4)
        print(f"tail prep+prepass+main @budget {b}: {tb:.2f} ms "
              f"(acc sum {float(jnp.sum(acc)):.3e})")

    # --- rowsort at full vs reduced slot volume ------------------------
    from fourdgs.ops.sort_pallas import rowsort_compact

    def emit_keys(budget):
        tids = []
        sx = jnp.zeros_like(tx0)
        sy = jnp.zeros_like(ty0)
        nxs = tx1 - tx0 + 1
        nys = ty1 - ty0 + 1
        keys = []
        for s in range(budget):
            live = alive & (s < span) & (span <= budget) & (sy < nys)
            tid = (ty0 + sy) * nx + (tx0 + sx)
            keys.append(jnp.where(live, (tid << 20) | dbits, dead))
            sx2 = sx + 1
            wrap = sx2 >= nxs
            sx = jnp.where(wrap, 0, sx2)
            sy = jnp.where(wrap, sy + 1, sy)
        return jnp.concatenate(keys)

    for budget, label in ((4, "40.9M (budget4)"), (2, "20.5M (budget2)")):
        key = _force(jax.jit(emit_keys, static_argnums=())(budget)
                     if False else jax.jit(lambda b=budget: emit_keys(b))())
        val = jnp.broadcast_to(iota, (budget,) + iota.shape).reshape(-1)

        def rs(key, val):
            ck, cv, dr = rowsort_compact(key, val, 48, row_len=512,
                                         key_shift=20)
            return ck

        tr, _ = timeit(rs, key, val, reps=4)
        print(f"rowsort_compact {label}: {tr:.2f} ms")


if __name__ == "__main__":
    main()
