"""Parity decomposition: coarse-block size x banding granularity.

exp_tailpair.py established that at 16x16 blocks the EXACT-ordered coarse
tail already has p99 0.271 — i.e. banding contributes nothing there; the
coarse sampling itself binds. But the r5 block sweep measured banded 2x4
blocks at p99 0.250 — nearly flat — so there must be a SECOND ~0.25 error
source that takes over as blocks shrink. This measures the full grid
(floor vs per-chunk vs per-pair banding at several block sizes, plus a
no-widening floor) to find which combination, if any, actually converges
— the design question for a quality mode.
"""
import jax
import jax.numpy as jnp
import numpy as np

import exp_tailpair as XP
from bench import build_cube_scene, _force
from fourdgs.core.camera import Camera
from fourdgs.ops import tail_pallas as TPL
from fourdgs.ops.composite_pallas import record_fields
from fourdgs.render.pipeline import RenderConfig, render_params4d_packed
from fourdgs.render.tiles import (quantized_depth_bits, splat_tile_bbox,
                                  tile_grid)
from fourdgs.splats.packed import morton_order

N, W, H = XP.N, XP.W, XP.H
TILE_H, TILE_W = XP.TILE_H, XP.TILE_W
BUDGET, BIG_BUDGET, SLAB = XP.BUDGET, XP.BIG_BUDGET, XP.SLAB
DEAD = XP.DEAD


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

    ny, nx = tile_grid(W, H, TILE_H, TILE_W)
    pmat = cam.proj_matrix()
    p00, p11 = pmat[0, 0], pmat[1, 1]
    # Reuse exp_tailpair's head + binning scaffold via its module globals.
    import types
    head_fn = XP.main.__globals__  # noqa: F841 (documentation only)

    from fourdgs.ops.composite_pallas import (composite_records,
                                              identity_carry, pack_records)
    from fourdgs.render.project import project_components
    from fourdgs.render.tiles import bin_splats, tile_pixel_ndc
    from fourdgs.splats import packed as PK

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
    chunk = 2048
    bg = jnp.asarray((0.0, 0.0, 0.0, 1.0))

    def finish(out5):
        from fourdgs.render.tiles import assemble_image
        rgb = out5[:, 0:3, :] + out5[:, 4:5, :] * bg[:3, None]
        a = out5[:, 3, :] + out5[:, 4, :] * bg[3]
        tiles = jnp.concatenate([rgb, a[:, None, :]],
                                axis=1).transpose(0, 2, 1)
        return assemble_image(tiles, W, H, TILE_H, TILE_W)

    def report(tag, img):
        d = np.abs(np.asarray(img)[..., :3] - img_x)
        print(f"{tag}: mean|err| {d.mean():.4f} "
              f"p99 {np.percentile(d, 99):.3f} max {d.max():.3f}",
              flush=True)

    for block in ((16, 16), (8, 16), (8, 8), (4, 8)):
        by, bx = block
        s_cy, s_cx = TILE_H // by, TILE_W // bx
        params_row = TPL.tail_params_row(TILE_H, TILE_W, block, W, H,
                                         p00, p11, 0)
        # floor: ordered-exact at coarse samples
        coarse = XP.exact_coarse_tail(proj, p00, p11, cut, params_row,
                                      nx, ny, s_cy, s_cx)
        img = _force(jax.jit(lambda c: finish(XP.upsample_blend(
            c, out, nx, ny, s_cy, s_cx, jnp.float32)))(coarse))
        report(f"floor   {by}x{bx}", img)
        if block == (16, 16):
            # no-widening floor: point samples (isolates the widened-
            # footprint model from pure sampling/upsample smoothing)
            pr0 = params_row.at[6:8].set(0.0)
            coarse0 = XP.exact_coarse_tail(proj, p00, p11, cut, pr0,
                                           nx, ny, s_cy, s_cx)
            img = _force(jax.jit(lambda c: finish(XP.upsample_blend(
                c, out, nx, ny, s_cy, s_cx, jnp.float32)))(coarse0))
            report("floor   16x16 NO-WIDEN", img)

        for k_bands, mode in ((8, "chunk"), (8, "pair"), (32, "pair")):
            meta, mrows = TPL.tail_meta(alive, tx0, tx1, ty0, ty1, dbits,
                                        chunk, return_rows=True)
            db_s = jnp.where(alive, dbits, DEAD)
            cuts = TPL.global_band_cuts(db_s, k_bands)
            band_step, _ = TPL.step_bands_rects(meta, chunk, cuts, 0,
                                                BUDGET)
            acc = XP.accumulate_xla(fields, meta, band_step, cuts, cut,
                                    params_row, k_bands, nx, ny, chunk,
                                    BUDGET, 0, s_cy, s_cx, mode)
            ids = binning.big_ids
            n = dbits.shape[0]
            safe = jnp.minimum(ids, n - 1)
            bdead = ids == DEAD
            meta_g = jnp.where(bdead[None, :], 0, meta[:, safe])
            nb = -(-ids.shape[0] // 512) * 512
            meta_g = jnp.pad(meta_g, ((0, 0), (0, nb - ids.shape[0])))
            fields_g = jnp.pad(fields[:, safe],
                               ((0, 0), (0, nb - ids.shape[0])))
            band_b, _ = TPL.step_bands_rects(meta_g, 512, cuts, BUDGET,
                                             BIG_BUDGET)
            acc = acc + XP.accumulate_xla(fields_g, meta_g, band_b, cuts,
                                          cut, params_row, k_bands, nx,
                                          ny, 512, BIG_BUDGET, BUDGET,
                                          s_cy, s_cx, mode)
            upt = TPL.fold_upsample_tail(acc, k_bands, nx, ny, TILE_H,
                                         TILE_W, s_cy, s_cx, jnp.float32)
            img = _force(jax.jit(lambda a: finish(
                TPL.blend_tail_under_head(out, a)))(upt))
            report(f"banded  {by}x{bx} {mode}-K{k_bands}", img)


if __name__ == "__main__":
    main()
