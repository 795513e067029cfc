"""Standalone tail-kernel timing at bench scale: slot mask on/off,
chunk size sweep."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from bench import build_cube_scene, _force
from fourdgs.core.camera import Camera
from fourdgs.splats import packed as PK
from fourdgs.splats.packed import morton_order, pad_packed_params
from fourdgs.render.project import project_components
from fourdgs.render.tiles import (quantized_depth_bits, splat_tile_bbox,
                                  tile_grid)
from fourdgs.ops.composite_pallas import record_fields
from fourdgs.ops import tail_pallas as TPL

n = 10_000_000
W, H, TH, TW = 1920, 1088, 16, 128
params = pad_packed_params(morton_order(build_cube_scene(n)), 2048)
camera = Camera.create(position=(420.0, 300.0, 420.0),
                       orientation=(-1.0, -0.7, -1.0),
                       far=5000.0, width=W, height=H)
ny, nx = tile_grid(W, H, TH, TW)


def setup(chunk):
    @jax.jit
    def prep(params):
        cov4 = PK.cov4_motion(params)
        mx, my, mz, cov3, op, sm = PK.slice4d(params, cov4, 0.0, 0.0)
        colors = (params["cr"], params["cg"], params["cb"], params["ca"])
        proj = project_components(mx, my, mz, cov3, colors, op, camera,
                                  sort_mean=sm)
        pm = camera.proj_matrix()
        p00, p11 = pm[0, 0], pm[1, 1]
        alive, tx0, tx1, ty0, ty1 = splat_tile_bbox(proj, p00, p11, W, H,
                                                    TH, TW)
        dbits = quantized_depth_bits(proj.depth)
        fields = record_fields(proj, p00, p11)
        meta, rows = TPL.tail_meta(alive, tx0, tx1, ty0, ty1, dbits, chunk,
                                   return_rows=True)
        dead = jnp.iinfo(jnp.int32).max
        db_s = dbits[: (n // 8192) * 8192].reshape(-1, 8192)[:, :128]
        al_s = alive[: (n // 8192) * 8192].reshape(-1, 8192)[:, :128]
        cuts = TPL.global_band_cuts(
            jnp.where(al_s, db_s, dead).reshape(-1), 8)
        band, rect, mask = TPL.tail_prepass(rows, cuts, chunk, 4, k_bands=8)
        cut = jnp.full((ny * nx,), -1, jnp.int32)  # everything is tail
        return fields, meta, band, rect, mask, cut
    fields, meta, band, rect, mask, cut = jax.block_until_ready(prep(params))
    pm = camera.proj_matrix()
    prow = TPL.tail_params_row(TH, TW, (16, 16), W, H, pm[0, 0], pm[1, 1])
    return fields, meta, band, rect, mask, cut, prow


for chunk in (2048, 4096):
    fields, meta, band, rect, mask, cut, prow = setup(chunk)
    for use_mask in (False, True):
        f = jax.jit(lambda fl: TPL.tail_accumulate(
            fl, meta, band, rect, cut, prow, k_bands=8, nx=nx, ny=ny,
            chunk=chunk, budget=4, s_cy=1, s_cx=8,
            slot_mask=(mask if use_mask else None)))
        _force(f(fields))
        t0 = time.time()
        outs = [f(fields) for _ in range(10)]
        _force(outs[-1])
        ms = (time.time() - t0) / 10 * 1000
        print(f"chunk {chunk} mask {use_mask}: {ms:.2f} ms", flush=True)
