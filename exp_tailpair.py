"""Parity: per-PAIR depth banding vs the shipped per-CHUNK banding.

The r4/r5 parity-envelope hunt falsified every single-factor fix (beta,
alpha_pow, head depth, block resolution, quad clip) and found band count
FLAT — suspicious, because if within-band OIT mixing were the whole error,
more bands must reduce it. Hypothesis here: the flat response is an
artifact of CHUNK-mean banding — a 2048-splat Morton chunk spans ~11% of
the cube depth (~1 band at K=8), so whole chunks are misassigned by up to
half a band and finer global bands cannot help (smaller bands, more
boundary misassignment: the two effects cancel).

This measures, at the 1M parity-gate scene, against the exhausted exact
composite:

  chunk-K8        the shipped scheme (baseline; reproduces p99 ~0.25)
  pair-K{8,16,32} per-PAIR banding (band from each pair's own dbits)
  exact-coarse    ordered (exact) compositing AT the coarse samples,
                  then the same upsample+blend — the FLOOR any banding
                  scheme can reach at this block size

All variants run through the real head (pallas pass-1 on the post-sort
re-cut) + the XLA tail twin (modified banding) + the real
fold_upsample_tail / blend_tail_under_head, so the deltas are pure
banding deltas.
"""
import jax
import jax.numpy as jnp
import numpy as np

from bench import build_cube_scene, _force
from fourdgs.core.camera import Camera
from fourdgs.ops import tail_pallas as TPL
from fourdgs.ops.composite_pallas import (composite_records, identity_carry,
                                          pack_records, record_fields)
from fourdgs.render.pipeline import RenderConfig, render_params4d_packed
from fourdgs.render.project import project_components
from fourdgs.render.tiles import (assemble_image, bin_splats,
                                  quantized_depth_bits, splat_tile_bbox,
                                  tile_grid, tile_pixel_ndc)
from fourdgs.splats import packed as PK
from fourdgs.splats.packed import morton_order

N = 1_000_000
W, H = 1024, 512
TILE_H, TILE_W = 16, 128
BUDGET = 8
BIG_BUDGET = 16
SLAB = 384
DEAD = np.iinfo(np.int32).max


def accumulate_xla(fields, meta, band_step, band_cuts, cut, params_row,
                   k_bands, nx, ny, chunk, budget, budget_lo, s_cy, s_cx,
                   band_mode):
    """tail_accumulate_xla with selectable banding granularity."""
    n_samp = s_cy * s_cx
    npts = meta.shape[1]
    if fields.shape[1] != npts:
        fields = jnp.pad(fields, ((0, 0), (0, npts - fields.shape[1])))
    ny_pad = -(-(ny + TPL.WIN_TY) // 8) * 8
    rows_per_band = nx * ny_pad
    acc = jnp.zeros((k_bands * rows_per_band, TPL.N_PLANES * n_samp),
                    jnp.float32)
    (sx, sy, v0x, v0y, il0, il1, cr, cg, cb, a_eff) = fields
    tx0, tx1, ty0, ty1, dbits, span = meta
    kx_t, kx_j, kx_0, ky_t, ky_j, ky_0, bx2, by2 = [params_row[i]
                                                    for i in range(8)]
    m0 = 1.0 / jnp.sqrt(1.0 + (bx2 * v0x ** 2 + by2 * v0y ** 2) * il0 ** 2)
    m1 = 1.0 / jnp.sqrt(1.0 + (bx2 * v0y ** 2 + by2 * v0x ** 2) * il1 ** 2)
    il0w = il0 * m0 * TPL._QSCALE
    il1w = il1 * m1 * TPL._QSCALE
    mass = m0 * m1
    if band_mode == "chunk":
        band_full = jnp.repeat(band_step, chunk)
    else:   # per-pair: each pair banded by its own dbits
        band_full = jnp.sum((-dbits)[:, None] >= band_cuts[None, :],
                            axis=1).astype(jnp.int32)
    nx_span = tx1 - tx0 + 1
    jy = jnp.arange(n_samp) // s_cx
    jx = jnp.arange(n_samp) % s_cx
    ox = jnp.zeros_like(tx0)
    oy = jnp.zeros_like(ty0)
    cut_pad = jnp.concatenate(
        [cut, jnp.full((TPL.CUT_ROWS * 128 - cut.shape[0],), DEAD,
                       jnp.int32)])
    for s in range(budget):
        live = ((s < span) & (span > budget_lo) & (span <= budget)
                & (oy < (ty1 - ty0 + 1)))
        tx = tx0 + ox
        ty = ty0 + oy
        tid = ty * nx + tx
        key = (tid << 20) | dbits
        live = live & (key > cut_pad[jnp.clip(tid, 0, TPL.CUT_ROWS * 128 - 1)])
        gate = live.astype(jnp.float32) * a_eff * mass
        kxs = kx_t * tx[:, None] + kx_j * jx[None, :] + kx_0
        kys = ky_t * ty[:, None] + ky_j * jy[None, :] + ky_0
        dx = kxs - sx[:, None]
        dy = kys - sy[:, None]
        n0 = (v0x[:, None] * dx + v0y[:, None] * dy) * il0w[:, None]
        n1 = (v0y[:, None] * dx - v0x[:, None] * dy) * il1w[:, None]
        w = jnp.exp(-(n0 * n0 + n1 * n1))
        cov = ((w >= 1e-4)
               & (jnp.abs(n0) <= (0.5 * TPL._QSCALE) * m0[:, None])
               & (jnp.abs(n1) <= (0.5 * TPL._QSCALE) * m1[:, None]))
        alpha = jnp.minimum(jnp.where(cov, gate[:, None] * w, 0.0),
                            TPL.ALPHA_MAX)
        planes = jnp.concatenate([
            alpha, alpha * cr[:, None], alpha * cg[:, None],
            alpha * cb[:, None], alpha * alpha, jnp.log1p(-alpha)], axis=1)
        row = band_full * rows_per_band + tx * ny_pad + ty
        row = jnp.where(live, row, 0)
        acc = acc.at[row].add(jnp.where(live[:, None], planes, 0.0))
        if s + 1 < budget:
            wrap = ox + 1 >= nx_span
            ox = jnp.where(wrap, 0, ox + 1)
            oy = jnp.where(wrap, oy + 1, oy)
    return acc


def exact_coarse_tail(proj, p00, p11, cut, params_row, nx, ny, s_cy, s_cx):
    """Ordered (exact) tail composite at the coarse samples: the floor of
    any banding scheme at this block size. Uses an unpruned full-depth
    binning; tail pairs selected by key > cut[tile]."""
    bfull = bin_splats(proj, p00, p11, W, H, tile_h=TILE_H, tile_w=TILE_W,
                       max_tiles_per_splat=BIG_BUDGET, quantized_depth=True)
    starts = bfull.tile_start[:-1]
    counts = bfull.tile_start[1:] - starts
    m = int(-(-int(jnp.max(counts)) // 128) * 128)
    pair_pad = jnp.concatenate([bfull.pair_splat, jnp.zeros((m,), jnp.int32)])
    rows = jax.vmap(lambda s: jax.lax.dynamic_slice_in_dim(pair_pad, s, m)
                    )(starts)                                    # (T, M)
    live = jnp.arange(m)[None, :] < counts[:, None]
    dbits = quantized_depth_bits(proj.depth)
    fields = record_fields(proj, p00, p11)
    (sx, sy, v0x, v0y, il0, il1, cr, cg, cb, a_eff) = [f[rows]
                                                       for f in fields]
    db = dbits[rows]
    t_ids = jnp.arange(nx * ny, dtype=jnp.int32)
    key = (t_ids[:, None] << 20) | db
    tail_live = live & (key > cut[t_ids][:, None])
    kx_t, kx_j, kx_0, ky_t, ky_j, ky_0, bx2, by2 = [params_row[i]
                                                    for i in range(8)]
    m0 = 1.0 / jnp.sqrt(1.0 + (bx2 * v0x ** 2 + by2 * v0y ** 2) * il0 ** 2)
    m1 = 1.0 / jnp.sqrt(1.0 + (bx2 * v0y ** 2 + by2 * v0x ** 2) * il1 ** 2)
    il0w = il0 * m0 * TPL._QSCALE
    il1w = il1 * m1 * TPL._QSCALE
    gate = tail_live.astype(jnp.float32) * a_eff * m0 * m1     # (T, M)
    n_samp = s_cy * s_cx
    jy = (jnp.arange(n_samp) // s_cx).astype(jnp.float32)
    jx = (jnp.arange(n_samp) % s_cx).astype(jnp.float32)
    txs = (t_ids % nx).astype(jnp.float32)
    tys = (t_ids // nx).astype(jnp.float32)
    kxs = kx_t * txs[:, None] + kx_j * jx[None, :] + kx_0      # (T, S)
    kys = ky_t * tys[:, None] + ky_j * jy[None, :] + ky_0

    def per_chunk(carry, io):
        rgb, aac, logt = carry
        sl = io
        take = lambda f: jax.lax.dynamic_slice_in_dim(f, sl, 512, axis=1)
        dx = kxs[:, None, :] - take(sx)[..., None]             # (T, C, S)
        dy = kys[:, None, :] - take(sy)[..., None]
        n0 = (take(v0x)[..., None] * dx + take(v0y)[..., None] * dy) \
            * take(il0w)[..., None]
        n1 = (take(v0y)[..., None] * dx - take(v0x)[..., None] * dy) \
            * take(il1w)[..., None]
        w = jnp.exp(-(n0 * n0 + n1 * n1))
        cov = ((w >= 1e-4)
               & (jnp.abs(n0) <= (0.5 * TPL._QSCALE) * take(m0)[..., None])
               & (jnp.abs(n1) <= (0.5 * TPL._QSCALE) * take(m1)[..., None]))
        alpha = jnp.minimum(
            jnp.where(cov, take(gate)[..., None] * w, 0.0), TPL.ALPHA_MAX)
        log1m = jnp.log1p(-alpha)
        t_excl = jnp.exp(logt[:, None, :] + jnp.cumsum(log1m, axis=1)
                         - log1m)
        wgt = alpha * t_excl
        rgb = rgb + jnp.stack(
            [jnp.sum(wgt * take(c)[..., None], axis=1)
             for c in (cr, cg, cb)], axis=1)                   # (T, 3, S)
        aac = aac + jnp.sum(alpha * wgt, axis=1)
        logt = logt + jnp.sum(log1m, axis=1)
        return (rgb, aac, logt), None

    t_tiles = nx * ny
    init = (jnp.zeros((t_tiles, 3, n_samp)), jnp.zeros((t_tiles, n_samp)),
            jnp.zeros((t_tiles, n_samp)))
    (rgb, aac, logt), _ = jax.lax.scan(per_chunk, init,
                                       jnp.arange(0, m, 512))
    return jnp.concatenate([rgb, aac[:, None], jnp.exp(logt)[:, None]],
                           axis=1)                             # (T, 5, S)


def upsample_blend(coarse, out, nx, ny, s_cy, s_cx, dtype):
    img_c = coarse.reshape(ny, nx, 5, s_cy, s_cx).transpose(
        2, 0, 3, 1, 4).reshape(5, ny * s_cy, nx * s_cx)
    up = jax.image.resize(img_c, (5, ny * TILE_H, nx * TILE_W),
                          method="bilinear")
    upt = up.reshape(5, ny, TILE_H, nx, TILE_W).transpose(
        1, 3, 0, 2, 4).reshape(ny * nx, 5, TILE_H * TILE_W).astype(dtype)
    return TPL.blend_tail_under_head(out, upt)


def main():
    params = morton_order(build_cube_scene(N, seed=2))
    cam = Camera.create(position=(420.0, 300.0, 420.0),
                        orientation=(-1.0, -0.7, -1.0),
                        far=5000.0, width=W, height=H)
    kw = dict(tile_h=TILE_H, tile_w=TILE_W, max_tiles_per_splat=BUDGET,
              splat_chunk=128, big_splat_budget=BIG_BUDGET)
    cfg_exact = RenderConfig(backend="pallas", **kw,
                             max_splats_per_tile=512,
                             quantized_depth_sort=True,
                             deepening_fraction=1.0, deepening_passes=80)
    img_x = np.asarray(jax.jit(lambda p: render_params4d_packed(
        p, cam, 0.0, cfg=cfg_exact))(params))[..., :3]
    print(f"exact mean {img_x.mean():.4f}", flush=True)
    # shipped-pipeline reference point (per-chunk pallas kernel)
    cfg_tail = RenderConfig(backend="pallas", **kw,
                            max_splats_per_tile=SLAB,
                            quantized_depth_sort=True,
                            depth_prune_cap=SLAB, depth_prune_safety=1.2,
                            deepening_fraction=1.0, tail_mode="banded",
                            tail_bands=8, tail_block=(16, 16),
                            tail_exact_clip=True)
    it = np.asarray(jax.jit(lambda p: render_params4d_packed(
        p, cam, 0.0, cfg=cfg_tail))(params))[..., :3]
    d = np.abs(it - img_x)
    print(f"shipped pallas chunk-K8: mean|err| {d.mean():.4f} "
          f"p99 {np.percentile(d, 99):.3f} max {d.max():.3f}", flush=True)

    # --- experiment scaffold: real head + XLA tail twin variants --------
    ny, nx = tile_grid(W, H, TILE_H, TILE_W)
    cfg = cfg_tail
    pmat = cam.proj_matrix()
    p00, p11 = pmat[0, 0], pmat[1, 1]

    @jax.jit
    def head_and_bits(params):
        cov4 = PK.cov4_motion(params)
        mx, my, mz, cov3, opacity, sort_mean = PK.slice4d(
            params, cov4, jnp.asarray(0.0), 0.0)
        colors = (params["cr"], params["cg"], params["cb"], params["ca"])
        proj = project_components(mx, my, mz, cov3, colors, opacity, cam,
                                  sort_mean=sort_mean)
        binning = bin_splats(
            proj, p00, p11, W, H, tile_h=TILE_H, tile_w=TILE_W,
            max_tiles_per_splat=BUDGET, quantized_depth=True,
            big_splat_budget=BIG_BUDGET, big_splat_keep_cols=128,
            depth_prune_cap=SLAB, depth_prune_safety=1.2, head_cap=SLAB)
        px, py, _ = tile_pixel_ndc(W, H, TILE_H, TILE_W, jnp.float32)
        kx = (px / p00).reshape(ny * nx, 1, px.shape[1])
        ky = (py / p11).reshape(ny * nx, 1, px.shape[1])
        starts = binning.tile_start[:-1]
        counts = binning.head_counts
        pair_pad = jnp.concatenate([binning.pair_splat,
                                    jnp.zeros((SLAB,), jnp.int32)])
        rows0 = jax.vmap(lambda s: jax.lax.dynamic_slice_in_dim(
            pair_pad, s, SLAB))(starts)
        live0 = jnp.arange(SLAB)[None, :] < counts[:, None]
        rec0 = pack_records(proj, rows0, live0, p00, p11)
        out = composite_records(rec0, jnp.minimum(counts, SLAB).astype(
            jnp.int32), kx, ky, identity_carry(ny * nx, jnp.float32,
                                               px.shape[1]))
        return proj, binning, out

    proj, binning, out = _force(head_and_bits(params))
    alive, tx0, tx1, ty0, ty1 = splat_tile_bbox(proj, p00, p11, W, H,
                                                TILE_H, TILE_W)
    dbits = quantized_depth_bits(proj.depth)
    fields = record_fields(proj, p00, p11)
    cut = binning.prune_cut
    chunk = cfg.tail_chunk
    s_cy, s_cx = TILE_H // 16, TILE_W // 16
    params_row = TPL.tail_params_row(TILE_H, TILE_W, (16, 16), W, H,
                                     p00, p11, 0)
    bg = jnp.asarray((0.0, 0.0, 0.0, 1.0))

    def finish(out5):
        rgb = out5[:, 0:3, :] + out5[:, 4:5, :] * bg[:3, None]
        a = out5[:, 3, :] + out5[:, 4, :] * bg[3]
        tiles = jnp.concatenate([rgb, a[:, None, :]],
                                axis=1).transpose(0, 2, 1)
        return assemble_image(tiles, W, H, TILE_H, TILE_W)

    def run_banded(k_bands, band_mode):
        meta, mrows = TPL.tail_meta(alive, tx0, tx1, ty0, ty1, dbits,
                                    chunk, return_rows=True)
        db_s = jnp.where(alive, dbits, DEAD)
        cuts = TPL.global_band_cuts(db_s, k_bands)
        band_step, _ = TPL.step_bands_rects(meta, chunk, cuts, 0, BUDGET)
        acc = accumulate_xla(fields, meta, band_step, cuts, cut, params_row,
                             k_bands, nx, ny, chunk, BUDGET, 0, s_cy, s_cx,
                             band_mode)
        # big stream (gathered ids)
        ids = binning.big_ids
        n = dbits.shape[0]
        safe = jnp.minimum(ids, n - 1)
        bdead = ids == DEAD
        meta_g = jnp.where(bdead[None, :], 0, meta[:, safe])
        nb = -(-ids.shape[0] // 512) * 512
        meta_g = jnp.pad(meta_g, ((0, 0), (0, nb - ids.shape[0])))
        fields_g = jnp.pad(fields[:, safe], ((0, 0), (0, nb - ids.shape[0])))
        band_b, _ = TPL.step_bands_rects(meta_g, 512, cuts, BUDGET,
                                         BIG_BUDGET)
        acc = acc + accumulate_xla(fields_g, meta_g, band_b, cuts, cut,
                                   params_row, k_bands, nx, ny, 512,
                                   BIG_BUDGET, BUDGET, s_cy, s_cx,
                                   band_mode)
        upt = TPL.fold_upsample_tail(acc, k_bands, nx, ny, TILE_H, TILE_W,
                                     s_cy, s_cx, jnp.float32)
        out5 = TPL.blend_tail_under_head(out, upt)
        return finish(out5)

    for k_bands, mode in ((8, "chunk"), (8, "pair"), (16, "pair"),
                          (32, "pair"), (64, "pair")):
        img = np.asarray(_force(jax.jit(
            lambda: run_banded(k_bands, mode))()))[..., :3]
        d = np.abs(img - img_x)
        print(f"xla-twin {mode}-K{k_bands}: mean|err| {d.mean():.4f} "
              f"p99 {np.percentile(d, 99):.3f} max {d.max():.3f}",
              flush=True)

    coarse = exact_coarse_tail(proj, p00, p11, cut, params_row, nx, ny,
                               s_cy, s_cx)
    img = np.asarray(_force(jax.jit(
        lambda: finish(upsample_blend(coarse, out, nx, ny, s_cy, s_cx,
                                      jnp.float32)))()))[..., :3]
    d = np.abs(img - img_x)
    print(f"exact-coarse floor: mean|err| {d.mean():.4f} "
          f"p99 {np.percentile(d, 99):.3f} max {d.max():.3f}", flush=True)


if __name__ == "__main__":
    main()
