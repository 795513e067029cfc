"""Parity tests: the tiled pipeline must reproduce the dense golden renderer
bit-for-bit (up to float tolerance) — the moral equivalent of the reference's
sort self-checks (SURVEY.md section 4b), but for the whole pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs.core.camera import Camera
from fourdgs.render import dense, pipeline
from fourdgs.render.pipeline import RenderConfig
from fourdgs.render.sort import (front_to_back_order, front_to_back_rank,
                                 inverse_permutation)
from fourdgs.render.tiles import bin_splats, tile_grid
from fourdgs.render.project import project_splats
from fourdgs.splats import gaussians as G


def make_scene(key, n=200, spread=10.0, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pos = jax.random.uniform(k1, (n, 3), minval=-spread, maxval=spread)
    pos = pos.at[:, 2].add(-30.0)
    quat = jax.random.normal(k2, (n, 4))
    scale = jax.random.uniform(k3, (n, 3), minval=0.5, maxval=3.0)
    color = jax.random.uniform(k4, (n, 4), minval=0.1, maxval=1.0)
    return G.Splats3D(position=pos.astype(dtype),
                      color=color.astype(dtype),
                      cov=G.build_cov3d(quat, scale).astype(dtype))


CAM = Camera.create(position=(0.0, 0.0, 0.0), width=96, height=64)
CAM8 = Camera.create(position=(0.0, 0.0, 0.0), width=256, height=64)
CFG = RenderConfig(max_splats_per_tile=256, splat_chunk=32)


class TestBinning:
    def test_pairs_cover_every_tile_slice(self):
        splats = make_scene(jax.random.PRNGKey(0))
        proj = project_splats(splats.position, splats.cov, splats.color,
                              jnp.ones((splats.count,)), CAM)
        pmat = CAM.proj_matrix()
        order = front_to_back_order(proj.depth)
        proj = jax.tree_util.tree_map(lambda a: a[order], proj)
        rank = jnp.arange(proj.count, dtype=jnp.int32)
        b = bin_splats(proj, pmat[0, 0], pmat[1, 1], CAM.width, CAM.height)
        ny, nx = tile_grid(CAM.width, CAM.height)
        ts = np.asarray(b.tile_start)
        assert ts.shape == (ny * nx + 1,)
        assert (np.diff(ts) >= 0).all()
        assert int(b.overflowed) == 0
        # Within each tile, pairs are front-to-back (ascending rank).
        ranks = np.asarray(rank)[np.asarray(b.pair_splat)]
        tids = np.asarray(b.pair_tile)
        for t in range(ny * nx):
            r = ranks[ts[t]:ts[t + 1]]
            assert (np.diff(r) >= 0).all(), f"tile {t} not depth-ordered"
        # Every live pair's tile id is valid.
        live = tids < ny * nx
        assert ts[-1] == live.sum()

    def test_inverse_permutation(self):
        order = jnp.array([2, 0, 3, 1], jnp.int32)
        inv = inverse_permutation(order)
        np.testing.assert_array_equal(np.asarray(inv), [1, 3, 0, 2])


class TestTiledParity:
    def test_matches_dense_3d(self):
        splats = make_scene(jax.random.PRNGKey(1))
        img_d = np.asarray(dense.render_splats3d(splats, CAM))
        img_t = np.asarray(pipeline.render_splats3d(splats, CAM, cfg=CFG))
        np.testing.assert_allclose(img_t, img_d, atol=2e-5)

    def test_matches_dense_3d_bigger_splats(self):
        # Splats large enough to span many tiles exercise the pair budget.
        splats = make_scene(jax.random.PRNGKey(2), n=60)
        splats = G.Splats3D(position=splats.position, color=splats.color,
                            cov=splats.cov * 16.0)
        cfg = RenderConfig(max_splats_per_tile=128, splat_chunk=16,
                           max_tiles_per_splat=64)
        img_d = np.asarray(dense.render_splats3d(splats, CAM))
        img_t = np.asarray(pipeline.render_splats3d(splats, CAM, cfg=cfg))
        np.testing.assert_allclose(img_t, img_d, atol=2e-5)

    def test_matches_dense_4d(self):
        key = jax.random.PRNGKey(3)
        n = 120
        ks = jax.random.split(key, 5)
        pos4 = jnp.concatenate([
            jax.random.uniform(ks[0], (n, 3), minval=-8, maxval=8),
            jax.random.uniform(ks[1], (n, 1), minval=0.0, maxval=4.0)], -1)
        pos4 = pos4.at[:, 2].add(-30.0)
        splats = G.Splats4D.from_motion(
            position4=pos4,
            quat=jax.random.normal(ks[2], (n, 4)),
            scale3=jax.random.uniform(ks[3], (n, 3), minval=0.5, maxval=2.5),
            lifetime=jnp.full((n,), 2.0),
            fade=jnp.full((n,), 0.5),
            velocity=jax.random.normal(ks[4], (n, 3)) * 0.5,
            color=jax.random.uniform(jax.random.PRNGKey(9), (n, 4), minval=0.1, maxval=1.0))
        for t in (0.0, 1.7, 3.5):
            img_d = np.asarray(dense.render_splats4d(splats, CAM, t))
            img_t = np.asarray(pipeline.render_splats4d(splats, CAM, t, cfg=CFG))
            np.testing.assert_allclose(img_t, img_d, atol=2e-5, err_msg=f"t={t}")

    def test_jit_and_grad(self):
        splats = make_scene(jax.random.PRNGKey(4), n=50)
        target = jnp.zeros((CAM.height, CAM.width, 4))

        @jax.jit
        def loss(pos):
            s = G.Splats3D(position=pos, color=splats.color, cov=splats.cov)
            img = pipeline.render_splats3d(s, CAM, cfg=CFG)
            return jnp.mean((img - target) ** 2)

        g = jax.grad(loss)(splats.position)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_overflow_truncation_keeps_nearest(self):
        # With a tiny per-tile capacity the nearest (front) splats must win.
        splats = make_scene(jax.random.PRNGKey(5), n=100, spread=2.0)
        cfg_small = RenderConfig(max_splats_per_tile=8, splat_chunk=8)
        img_small = np.asarray(pipeline.render_splats3d(splats, CAM, cfg=cfg_small))
        img_full = np.asarray(pipeline.render_splats3d(splats, CAM, cfg=CFG))
        # Truncation only *adds* background / removes far splats; where the
        # full image is empty, truncated must be too.
        empty = img_full[..., :3].sum(-1) == 0
        assert (img_small[..., :3].sum(-1)[empty] == 0).all()
        assert np.isfinite(img_small).all()


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))


class TestQuantizedSort:
    def test_quantized_close_to_exact(self):
        splats = make_scene(jax.random.PRNGKey(7))
        cfg_q = RenderConfig(max_splats_per_tile=256, splat_chunk=32,
                             quantized_depth_sort=True)
        img_q = np.asarray(pipeline.render_splats3d(splats, CAM, cfg=cfg_q))
        img_e = np.asarray(pipeline.render_splats3d(splats, CAM, cfg=CFG))
        # Only exact-depth-tie ordering can differ; random scene has none.
        np.testing.assert_allclose(img_q, img_e, atol=1e-4)

    def test_quantized_depth_monotone(self):
        # float-bit trick: larger distance => larger 20-bit key.
        import jax.numpy as jnp
        from fourdgs.render.tiles import QUANT_DEPTH_BITS
        d = jnp.sort(jax.random.uniform(jax.random.PRNGKey(0), (1000,),
                                        minval=1e-3, maxval=1e4))
        bits = jax.lax.bitcast_convert_type(d, jnp.int32) >> (32 - QUANT_DEPTH_BITS)
        assert (np.diff(np.asarray(bits)) >= 0).all()


class TestProgressiveDeepening:
    def test_matches_single_big_capacity(self):
        # 3 slabs of 64 on all tiles must equal one pass with capacity 192.
        splats = make_scene(jax.random.PRNGKey(11), n=400, spread=3.0)
        cfg_deep = RenderConfig(tile_h=8, tile_w=128, backend="pallas",
                                max_splats_per_tile=128, splat_chunk=128,
                                deepening_passes=3, deepening_fraction=1.0)
        cfg_big = RenderConfig(tile_h=8, tile_w=128, backend="pallas",
                               max_splats_per_tile=384, splat_chunk=128)
        img_deep = np.asarray(pipeline.render_splats3d(splats, CAM8, cfg=cfg_deep))
        img_big = np.asarray(pipeline.render_splats3d(splats, CAM8, cfg=cfg_big))
        np.testing.assert_allclose(img_deep, img_big, atol=2e-5)

    def test_deepening_grad_finite(self):
        splats = make_scene(jax.random.PRNGKey(12), n=100, spread=3.0)
        cfg_deep = RenderConfig(tile_h=8, tile_w=128, backend="pallas",
                                max_splats_per_tile=128, splat_chunk=128,
                                deepening_passes=2, deepening_fraction=0.5)

        def loss(pos):
            s = G.Splats3D(position=pos, color=splats.color, cov=splats.cov)
            return jnp.mean(pipeline.render_splats3d(s, CAM8, cfg=cfg_deep) ** 2)

        g = jax.grad(loss)(splats.position)
        assert np.isfinite(np.asarray(g)).all()
        # And it matches the single-pass big-capacity grad.
        def loss_big(pos):
            s = G.Splats3D(position=pos, color=splats.color, cov=splats.cov)
            cfgb = RenderConfig(tile_h=8, tile_w=128, backend="pallas",
                                max_splats_per_tile=256, splat_chunk=128)
            return jnp.mean(pipeline.render_splats3d(s, CAM8, cfg=cfgb) ** 2)
        gb = jax.grad(loss_big)(splats.position)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gb), atol=1e-6)


class TestTiled2D:
    def test_matches_dense_2d(self):
        from fourdgs.scenes import scenes as S
        splats, st = S.gaussians_2d(n=20, seed=3)
        import fourdgs.splats.gaussians as G2
        splats = G2.Splats2D(position=jnp.asarray(splats.position),
                             color=jnp.asarray(splats.color),
                             cov=jnp.asarray(splats.cov))
        cam = Camera.create(width=96, height=64)
        img_d = np.asarray(dense.render_splats2d(splats, cam))
        img_t = np.asarray(pipeline.render_splats2d(
            splats, cam, cfg=RenderConfig(max_splats_per_tile=128,
                                          splat_chunk=32,
                                          max_tiles_per_splat=64)))
        np.testing.assert_allclose(img_t, img_d, atol=2e-5)


class TestTileRange:
    """tile_range-restricted binning (the sharded pipeline's local window)
    must reproduce the global CSR slice exactly."""

    def _proj(self):
        splats = make_scene(jax.random.PRNGKey(3), n=300)
        proj = project_splats(splats.position, splats.cov, splats.color,
                              jnp.ones((splats.count,)), CAM)
        order = front_to_back_order(proj.depth)
        return jax.tree_util.tree_map(lambda a: a[order], proj)

    @pytest.mark.parametrize("quant", [False, True])
    def test_local_window_matches_global(self, quant):
        proj = self._proj()
        pmat = CAM.proj_matrix()
        ny, nx = tile_grid(CAM.width, CAM.height)
        T = ny * nx
        g = bin_splats(proj, pmat[0, 0], pmat[1, 1], CAM.width, CAM.height,
                       quantized_depth=quant)
        gts = np.asarray(g.tile_start)
        gsp = np.asarray(g.pair_splat)
        n_local = 3
        for lo in [0, 2, T - n_local, T - 1]:
            b = bin_splats(proj, pmat[0, 0], pmat[1, 1], CAM.width,
                           CAM.height, quantized_depth=quant,
                           tile_range=(jnp.asarray(lo, jnp.int32), n_local))
            ts = np.asarray(b.tile_start)
            sp = np.asarray(b.pair_splat)
            assert ts.shape == (n_local + 1,)
            for i in range(n_local):
                t = lo + i
                if t >= T:
                    assert ts[i + 1] - ts[i] == 0
                    continue
                got = sp[ts[i]:ts[i + 1]]
                want = gsp[gts[t]:gts[t + 1]]
                np.testing.assert_array_equal(np.sort(got), np.sort(want))
                if not quant:  # exact path preserves depth order
                    np.testing.assert_array_equal(got, want)

    def test_traced_lo_under_jit(self):
        proj = self._proj()
        pmat = CAM.proj_matrix()
        f = jax.jit(lambda p, lo: bin_splats(
            p, pmat[0, 0], pmat[1, 1], CAM.width, CAM.height,
            tile_range=(lo, 4)))
        b = f(proj, jnp.asarray(2, jnp.int32))
        g = bin_splats(proj, pmat[0, 0], pmat[1, 1], CAM.width, CAM.height)
        gts = np.asarray(g.tile_start)
        np.testing.assert_array_equal(
            np.diff(np.asarray(b.tile_start)), np.diff(gts[2:7]))


class TestSearchsortedI32:
    def test_matches_numpy_left_bisect(self):
        """Regression: the fixed-trip binary search must match
        np.searchsorted('left') exactly, including power-of-two sizes
        (an early version under-iterated) and converged-bracket
        idempotence (an early version overshot past hi)."""
        import numpy as np
        from fourdgs.render.tiles import searchsorted_i32
        rng = np.random.default_rng(0)
        for p in [1, 2, 3, 15, 16, 17, 255, 256, 1000, 12345]:
            a = np.sort(rng.integers(0, max(4, p // 2), p, dtype=np.int32))
            q = rng.integers(-2, max(4, p // 2) + 2, 64, dtype=np.int32)
            want = np.searchsorted(a, q, side="left")
            got = np.asarray(searchsorted_i32(jnp.asarray(a),
                                              jnp.asarray(q)))
            assert np.array_equal(want, got), p


class TestTileRowBanding:
    """Quantized rendering beyond the 11-bit tile-id budget (VERDICT r3
    #4): images with >= 2047 tiles render as tile-row bands, each band
    running the fast path with band-relative ids."""

    def test_banded_matches_exact_past_tile_limit(self):
        from fourdgs.core.camera import Camera
        from fourdgs.render.tiles import tile_grid
        cam = Camera.create(position=(0.0, 0.0, 26.0), width=1408,
                            height=1536)
        splats = make_scene(jax.random.PRNGKey(11), n=400, spread=10.0)
        th, tw = 8, 64
        ny, nx = tile_grid(cam.width, cam.height, th, tw)
        assert ny * nx >= 2047, (ny, nx)      # the banding regime
        cfg_q = RenderConfig(tile_h=th, tile_w=tw, max_splats_per_tile=128,
                             splat_chunk=32, quantized_depth_sort=True)
        cfg_e = RenderConfig(tile_h=th, tile_w=tw, max_splats_per_tile=128,
                             splat_chunk=32)
        img_q = np.asarray(pipeline.render_splats3d(splats, cam, cfg=cfg_q))
        img_e = np.asarray(pipeline.render_splats3d(splats, cam, cfg=cfg_e))
        # 20-bit depth quantization reorders exact-tie neighbors at a few
        # isolated pixels (same class as the single-band quantized test,
        # which uses a tie-free scene); banding must add nothing beyond.
        d = np.abs(img_q - img_e)
        assert float(d.mean()) < 1e-5
        assert (d > 1e-4).mean() < 1e-3
        assert float(d.max()) < 0.05

    def test_band_seams_consistent(self):
        # A splat straddling a band boundary must composite identically on
        # both sides: render the same scene at a sub-limit resolution and
        # crop vs the banded render of a taller image containing it.
        from fourdgs.core.camera import Camera
        cam_big = Camera.create(position=(0.0, 0.0, 26.0), width=1408,
                                height=1536)
        splats = make_scene(jax.random.PRNGKey(12), n=300, spread=9.0)
        th, tw = 8, 64
        cfg_q = RenderConfig(tile_h=th, tile_w=tw, max_splats_per_tile=128,
                             splat_chunk=32, quantized_depth_sort=True)
        img = np.asarray(pipeline.render_splats3d(splats, cam_big,
                                                  cfg=cfg_q))
        assert np.isfinite(img).all()
        # Rows around every band seam carry no discontinuity artifacts
        # beyond normal pixel variation: the banded result equals the
        # exact render (previous test); here assert seam rows are not
        # systematically darker/brighter than neighbors.
        rows = img[..., :3].mean(axis=(1, 2))
        interior = rows[1:-1]
        neighbors = 0.5 * (rows[:-2] + rows[2:])
        assert np.all(np.abs(interior - neighbors) < 0.05 + 0.5 * neighbors)
