"""Golden tests for the dense renderer: an independent, literal numpy
re-implementation of the reference's vertex+fragment shaders and GL blending
(painter's algorithm, back-to-front loop) is compared pixel-for-pixel against
the vectorized scan/matmul formulation in fourdgs.render.dense."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs.core.camera import Camera
from fourdgs.render import dense
from fourdgs.splats import gaussians as G


# ---------------------------------------------------------------------------
# literal numpy painter (mirrors GLSL line by line; deliberately loopy)
# ---------------------------------------------------------------------------

def eigen2x2_np(cov):
    a, b, c = cov[0, 0], cov[0, 1], cov[1, 1]
    m = 0.5 * (a + c)
    p = a * c - b * b
    d = np.sqrt(max(m * m - p, 0.0))
    lmin = max(m - d, 1e-6)
    lmax = max(m + d, 1e-6)
    v = np.array([b, lmin - a])
    nv = np.linalg.norm(v)
    if nv < 1e-12:
        v = np.array([1.0, 0.0]) if a <= c else np.array([0.0, 1.0])
    else:
        v = v / nv
    return lmin, lmax, v


def painter_reference(mean3, cov3, color, t_op, camera, sort_mean, background,
                      do_sort=True):
    """Back-to-front painter loop with straight-alpha GL blending."""
    view = np.asarray(camera.view_matrix())
    proj = np.asarray(camera.proj_matrix())
    h, w = camera.height, camera.width
    p00, p11 = proj[0, 0], proj[1, 1]
    n = mean3.shape[0]

    # Reference order: stable ascending sort of 1/distance keys, drawn in
    # that order (back-to-front).
    campos = np.asarray(camera.position)
    keys = 1.0 / np.maximum(np.linalg.norm(sort_mean - campos, axis=-1), 1e-12)
    order = np.argsort(keys, kind="stable") if do_sort else np.arange(n)

    img = np.zeros((h, w, 4), np.float64)
    img[:] = background

    xs = (np.arange(w) + 0.5) / w * 2 - 1
    ys = 1.0 - (np.arange(h) + 0.5) / h * 2
    pxg, pyg = np.meshgrid(xs, ys)

    for i in order:
        pos_cam = view[:3, :3] @ mean3[i] + view[:3, 3]
        clip = proj[:3, :3] @ pos_cam + proj[:3, 3]
        wclip = -pos_cam[2]
        ndc = clip / wclip
        z = ndc[2]
        if z < 0 or z > 1 or abs(ndc[0]) > 1.2 or abs(ndc[1]) > 1.2:
            continue
        x, y, zc = pos_cam
        j = np.array([[1 / zc, 0, -x / zc ** 2],
                      [0, 1 / zc, -y / zc ** 2]])
        t = j @ view[:3, :3]
        cov2 = t @ cov3[i] @ t.T
        lmin, lmax, v0 = eigen2x2_np(cov2)
        l0, l1 = np.sqrt(lmin), np.sqrt(lmax)
        v1 = np.array([v0[1], -v0[0]])

        dx = (pxg - ndc[0]) / p00
        dy = (pyg - ndc[1]) / p11
        k0 = v0[0] * dx + v0[1] * dy
        k1 = v1[0] * dx + v1[1] * dy
        n0, n1 = k0 / l0, k1 / l1
        q = 64.0 * (n0 ** 2 + n1 ** 2)
        cval = np.exp(-0.5 * q)
        covered = (np.abs(n0) <= 0.5) & (np.abs(n1) <= 0.5) & (cval >= 1e-4)
        alpha = np.where(covered, t_op[i] * cval * color[i, 3], 0.0)
        src = np.concatenate([color[i, :3], [alpha.max() * 0 + color[i, 3] * 0]])  # placeholder
        # GL blend: out = a*src + (1-a)*dst, src = (rgb, a) with src.a == a.
        img[..., :3] = alpha[..., None] * color[i, :3] + (1 - alpha[..., None]) * img[..., :3]
        img[..., 3] = alpha * alpha + (1 - alpha) * img[..., 3]
    return img


def make_scene(key, n=24, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pos = jax.random.uniform(k1, (n, 3), minval=-4, maxval=4)
    pos = pos.at[:, 2].add(-12.0)  # in front of a camera at origin looking -z
    quat = jax.random.normal(k2, (n, 4))
    scale = jax.random.uniform(k3, (n, 3), minval=0.3, maxval=1.2)
    color = jax.random.uniform(k4, (n, 4), minval=0.1, maxval=1.0)
    cov = G.build_cov3d(quat, scale)
    return G.Splats3D(position=pos.astype(dtype), color=color.astype(dtype),
                      cov=cov.astype(dtype))


class TestDense3D:
    def setup_method(self):
        self.cam = Camera.create(position=(0.0, 0.0, 0.0),
                                 orientation=(0.0, 0.0, -1.0),
                                 width=64, height=48)

    def test_matches_numpy_painter(self):
        splats = make_scene(jax.random.PRNGKey(0))
        img = np.asarray(dense.render_splats3d(splats, self.cam, chunk=8))
        ref = painter_reference(np.asarray(splats.position, np.float64),
                                np.asarray(splats.cov, np.float64),
                                np.asarray(splats.color, np.float64),
                                np.ones(splats.count),
                                self.cam,
                                np.asarray(splats.position, np.float64),
                                np.array([0, 0, 0, 1.0]))
        np.testing.assert_allclose(img, ref, atol=2e-3)

    def test_unsorted_order_matches(self):
        splats = make_scene(jax.random.PRNGKey(1))
        img = np.asarray(dense.render_splats3d(splats, self.cam, sort=False))
        ref = painter_reference(np.asarray(splats.position, np.float64),
                                np.asarray(splats.cov, np.float64),
                                np.asarray(splats.color, np.float64),
                                np.ones(splats.count), self.cam,
                                np.asarray(splats.position, np.float64),
                                np.array([0, 0, 0, 1.0]), do_sort=False)
        np.testing.assert_allclose(img, ref, atol=2e-3)

    def test_single_splat_center_peak(self):
        splats = G.Splats3D(
            position=jnp.array([[0.0, 0.0, -10.0]]),
            color=jnp.array([[1.0, 0.5, 0.25, 1.0]]),
            cov=G.build_cov3d(jnp.array([[1.0, 0, 0, 0]]), jnp.array([[1.0, 1.0, 1.0]])),
        )
        cam = Camera.create(width=65, height=65)  # odd => a pixel at the center
        img = np.asarray(dense.render_splats3d(splats, cam))
        cy, cx = 32, 32
        # Center pixel: weight ~ exp(0) = 1 => fully saturated color.
        np.testing.assert_allclose(img[cy, cx, :3], [1.0, 0.5, 0.25], atol=1e-2)
        # Far corner: untouched background.
        np.testing.assert_allclose(img[0, 0], [0, 0, 0, 1.0], atol=1e-6)

    def test_behind_camera_culled(self):
        splats = G.Splats3D(
            position=jnp.array([[0.0, 0.0, 10.0]]),  # behind (camera looks -z)
            color=jnp.ones((1, 4)),
            cov=jnp.broadcast_to(jnp.eye(3), (1, 3, 3)),
        )
        img = np.asarray(dense.render_splats3d(splats, self.cam))
        np.testing.assert_allclose(img, np.broadcast_to([0, 0, 0, 1.0], img.shape))

    def test_differentiable(self):
        splats = make_scene(jax.random.PRNGKey(2), n=8)
        target = jnp.zeros((48, 64, 4))

        def loss(pos):
            s = G.Splats3D(position=pos, color=splats.color, cov=splats.cov)
            img = dense.render_splats3d(s, self.cam)
            return jnp.mean((img - target) ** 2)

        g = jax.grad(loss)(splats.position)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestDense4D:
    def test_4d_slice_render(self):
        # One moving splat: at t=2 it should sit 2 units along +x.
        splats = G.Splats4D.from_motion(
            position4=jnp.array([[0.0, 0.0, -10.0, 0.0]]),
            quat=jnp.array([[1.0, 0, 0, 0]]),
            scale3=jnp.array([[0.5, 0.5, 0.5]]),
            lifetime=jnp.array([5.0]),
            fade=jnp.array([0.5]),
            velocity=jnp.array([[1.0, 0.0, 0.0]]),
            color=jnp.array([[1.0, 1.0, 1.0, 1.0]]),
        )
        cam = Camera.create(width=64, height=64)
        img0 = np.asarray(dense.render_splats4d(splats, cam, t=0.0))
        img2 = np.asarray(dense.render_splats4d(splats, cam, t=2.0))
        # Centroid of brightness moves right.
        xs = np.arange(64)
        c0 = (img0[..., 0].sum(0) * xs).sum() / max(img0[..., 0].sum(), 1e-9)
        c2 = (img2[..., 0].sum(0) * xs).sum() / max(img2[..., 0].sum(), 1e-9)
        assert c2 > c0 + 2
        # Temporal opacity dims the far-future render.
        img20 = np.asarray(dense.render_splats4d(splats, cam, t=40.0))
        assert img20[..., 0].max() < img0[..., 0].max() * 0.5

    def test_min_opacity_floor(self):
        splats = G.Splats4D.from_motion(
            position4=jnp.array([[0.0, 0.0, -10.0, 0.0]]),
            quat=jnp.array([[1.0, 0, 0, 0]]),
            scale3=jnp.array([[0.5, 0.5, 0.5]]),
            lifetime=jnp.array([1.0]),
            fade=jnp.array([0.5]),
            velocity=jnp.zeros((1, 3)),
            color=jnp.array([[1.0, 1.0, 1.0, 1.0]]),
        )
        # Odd size => a pixel sits exactly at the splat center (the visible
        # Gaussian is 8x narrower than its EWA ellipse — GLSL :146 — so only
        # the center pixel reaches the peak).
        cam = Camera.create(width=33, height=33)
        img = np.asarray(dense.render_splats4d(splats, cam, t=100.0, min_opacity=0.5))
        assert img[..., 0].max() > 0.4  # floor keeps it visible (GLSL :83)
        # Without the floor it is invisible.
        img0 = np.asarray(dense.render_splats4d(splats, cam, t=100.0, min_opacity=0.0))
        assert img0[..., 0].max() < 1e-3


class TestDense2D:
    def test_2d_scene_smoke(self):
        key = jax.random.PRNGKey(3)
        n = 20
        import fourdgs.core.transforms as tf
        ang = jax.random.uniform(key, (n,)) * 2 * np.pi
        r = tf.rotation_2d(ang)
        s = jax.random.uniform(jax.random.PRNGKey(4), (n, 2), minval=1.0, maxval=6.0)
        cov = jnp.einsum("nik,nk,njk->nij", r, s * s, r)
        splats = G.Splats2D(
            position=jax.random.uniform(jax.random.PRNGKey(5), (n, 2), minval=-5, maxval=5),
            color=jax.random.uniform(jax.random.PRNGKey(6), (n, 4), minval=0.2, maxval=1.0),
            cov=cov,
        )
        cam = Camera.create(width=128, height=128)
        img = np.asarray(dense.render_splats2d(splats, cam))
        assert img.shape == (128, 128, 4)
        assert np.isfinite(img).all()
        assert img[..., :3].max() > 0.05  # something rendered

    def test_2d_axis_swap_quirk(self):
        # A covariance elongated along x must render elongated along *y*
        # (Splat2DVSI.GLSL:76 pairs sqrt(2*lmax) with the lmin eigenvector).
        splats = G.Splats2D(
            position=jnp.zeros((1, 2)),
            color=jnp.array([[1.0, 1.0, 1.0, 1.0]]),
            cov=jnp.array([[[9.0, 0.0], [0.0, 1.0]]]),
        )
        cam = Camera.create(width=129, height=129)
        img = np.asarray(dense.render_splats2d(splats, cam))
        row = img[64, :, 0]   # horizontal profile through center
        col = img[:, 64, 0]   # vertical profile
        assert (col > 0.01).sum() > (row > 0.01).sum()


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))


class TestPremultiplied:
    def test_premultiplied_no_nan_and_dimmer(self):
        # The 3D-path blend (Splat3DFragShaderFull.GLSL:22) scales rgb by the
        # Gaussian weight; padding splats must not inject NaN (regression).
        from fourdgs.scenes import scenes as S
        splats, st = S.gaussians_3d()
        cam = Camera.create(position=st.camera_position,
                            orientation=st.camera_orientation,
                            width=64, height=64)
        pre = np.asarray(dense.render_splats3d(splats, cam, premultiplied=True))
        straight = np.asarray(dense.render_splats3d(splats, cam))
        assert np.isfinite(pre).all()
        assert pre[..., :3].sum() < straight[..., :3].sum()
        assert pre[..., :3].max() > 0.01


class TestBlendExplorer:
    """The blend-function explorer (DebugMenus.h:211-274 analog) must agree
    with the production transmittance compositor at the shipped factor pair
    GL_SRC_ALPHA / GL_ONE_MINUS_SRC_ALPHA (Application.cpp:137-138)."""

    def test_src_alpha_pair_matches_composite_dense(self):
        from fourdgs.core.camera import pixel_centers_ndc
        from fourdgs.render.dense import (composite_dense,
                                          composite_dense_blend,
                                          sort_front_to_back)
        from fourdgs.render.project import project_splats
        rng = np.random.default_rng(0)
        n = 24
        cam = Camera.create(position=(0, 0, 0), width=48, height=40)
        pos = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
        pos[:, 2] -= 20.0
        cov = np.einsum("nij,nkj->nik",
                        rng.normal(0, 0.8, (n, 3, 3)),
                        rng.normal(0, 0.8, (n, 3, 3))).astype(np.float32)
        cov += 0.3 * np.eye(3, dtype=np.float32)
        color = rng.uniform(0.1, 1.0, (n, 4)).astype(np.float32)
        proj = project_splats(jnp.asarray(pos), jnp.asarray(cov),
                              jnp.asarray(color), jnp.ones((n,)), cam)
        proj = sort_front_to_back(proj)
        pm = cam.proj_matrix()
        px, py = pixel_centers_ndc(cam.width, cam.height)
        bgv = jnp.asarray([0.05, 0.1, 0.0, 1.0])
        want = composite_dense(proj, px, py, pm[0, 0], pm[1, 1], bgv)
        got = composite_dense_blend(proj, px, py, pm[0, 0], pm[1, 1], bgv,
                                    "src_alpha", "one_minus_src_alpha")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_additive_blend_is_sum(self):
        from fourdgs.core.camera import pixel_centers_ndc
        from fourdgs.render.dense import composite_dense_blend
        from fourdgs.render.project import project_splats
        cam = Camera.create(position=(0, 0, 0), width=32, height=32)
        n = 5
        pos = np.zeros((n, 3), np.float32)
        pos[:, 2] = -15.0
        pos[:, 0] = np.linspace(-1, 1, n)
        cov = np.tile(np.eye(3, dtype=np.float32) * 2.0, (n, 1, 1))
        color = np.full((n, 4), 0.5, np.float32)
        proj = project_splats(jnp.asarray(pos), jnp.asarray(cov),
                              jnp.asarray(color), jnp.ones((n,)), cam)
        pm = cam.proj_matrix()
        px, py = pixel_centers_ndc(cam.width, cam.height)
        img = composite_dense_blend(proj, px, py, pm[0, 0], pm[1, 1],
                                    jnp.zeros((4,)), "one", "one")
        # GL_ONE/GL_ONE accumulates: brighter than any single contribution.
        assert float(jnp.max(img[..., :3])) > 0.5
