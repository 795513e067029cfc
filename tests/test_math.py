"""Property tests for the covariance builders and 4D slicing identities —
the test tier the reference lacks entirely (SURVEY.md section 4a), covering
the math of Splat.h classes Splat2D/3D/4D and SplatUtils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs.core import transforms as tf
from fourdgs.core.camera import Camera, look_at, perspective
from fourdgs.render.project import eigen2x2
from fourdgs.splats import gaussians as G

jax.config.update("jax_enable_x64", False)


def rand(key, *shape):
    return jax.random.normal(key, shape)


class TestTransforms:
    def test_quat_roundtrip(self):
        key = jax.random.PRNGKey(0)
        q = tf.quat_normalize(rand(key, 64, 4))
        m = tf.quat_to_mat3(q)
        # Rotation matrix properties.
        np.testing.assert_allclose(m @ np.swapaxes(m, -1, -2),
                                   np.broadcast_to(np.eye(3), (64, 3, 3)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)
        # mat -> quat -> mat roundtrip (quat sign is not unique).
        q2 = tf.mat3_to_quat(m)
        m2 = tf.quat_to_mat3(q2)
        np.testing.assert_allclose(m2, m, atol=1e-4)

    def test_quat_to_mat_known(self):
        # 90 degrees about z: (w,x,y,z) = (cos45, 0, 0, sin45).
        q = jnp.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
        m = tf.quat_to_mat3(q)
        expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(m, expected, atol=1e-6)

    def test_look_rotation(self):
        d = jnp.array([0.0, 0.0, -1.0])
        up = jnp.array([0.0, 1.0, 0.0])
        m = tf.look_rotation(d, up)
        np.testing.assert_allclose(m, np.eye(3), atol=1e-6)
        # -Z column equals -direction for arbitrary directions.
        key = jax.random.PRNGKey(1)
        dirs = tf.normalize(rand(key, 32, 3))
        m = tf.look_rotation(dirs, up)
        np.testing.assert_allclose(m[..., :, 2], -dirs, atol=1e-5)
        # Orthonormal.
        np.testing.assert_allclose(np.swapaxes(m, -1, -2) @ m,
                                   np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)

    def test_rotate_about_axis(self):
        v = jnp.array([1.0, 0.0, 0.0])
        out = tf.rotate_about_axis(v, jnp.asarray(np.pi / 2), jnp.array([0.0, 1.0, 0.0]))
        np.testing.assert_allclose(out, [0.0, 0.0, -1.0], atol=1e-6)


class TestCamera:
    def test_look_at_matches_manual(self):
        eye = jnp.array([1.0, 2.0, 3.0])
        center = jnp.array([0.0, 0.0, 0.0])
        up = jnp.array([0.0, 1.0, 0.0])
        v = look_at(eye, center, up)
        # The eye maps to the origin; the target lies on -z.
        np.testing.assert_allclose(v @ jnp.append(eye, 1.0), [0, 0, 0, 1], atol=1e-5)
        tgt = v @ jnp.append(center, 1.0)
        assert tgt[2] < 0 and abs(tgt[0]) < 1e-5 and abs(tgt[1]) < 1e-5

    def test_perspective_matches_glm(self):
        # Reference defaults: fov 60 deg, square, near .1, far 5000.
        p = np.asarray(perspective(jnp.deg2rad(60.0), 1.0, 0.1, 5000.0))
        t = np.tan(np.deg2rad(30.0))
        assert np.isclose(p[0, 0], 1 / t) and np.isclose(p[1, 1], 1 / t)
        assert np.isclose(p[3, 2], -1.0)
        # near plane -> ndc z = -1, far plane -> +1.
        for z, expect in [(-0.1, -1.0), (-5000.0, 1.0)]:
            clip = p @ np.array([0, 0, z, 1.0])
            assert np.isclose(clip[2] / clip[3], expect, atol=1e-4)

    def test_camera_pytree(self):
        cam = Camera.create(position=(1, 2, 3), width=64, height=32)
        leaves = jax.tree_util.tree_leaves(cam)
        assert all(isinstance(l, jax.Array) for l in leaves)
        vp = cam.view_proj_matrix()
        assert vp.shape == (4, 4)
        np.testing.assert_allclose(cam.viewport(),
                                   np.array([64, 32]) / np.hypot(64, 32), atol=1e-6)


class TestCovarianceBuilders:
    def test_cov2d(self):
        v0 = jnp.array([1.0, 1.0])
        cov = G.build_cov2d(v0, jnp.asarray(4.0), jnp.asarray(1.0))
        evals = np.sort(np.linalg.eigvalsh(cov))
        np.testing.assert_allclose(evals, [1.0, 4.0], atol=1e-5)
        # v0 is the eigenvector of l0.
        v0n = v0 / np.linalg.norm(v0)
        np.testing.assert_allclose(cov @ v0n, 4.0 * v0n, atol=1e-5)

    def test_cov3d_eigvals_are_squared_scales(self):
        key = jax.random.PRNGKey(2)
        q = tf.quat_normalize(rand(key, 16, 4))
        s = jnp.abs(rand(jax.random.PRNGKey(3), 16, 3)) + 0.5
        cov = G.build_cov3d(q, s)
        evals = np.sort(np.linalg.eigvalsh(cov), axis=-1)
        np.testing.assert_allclose(evals, np.sort(s * s, axis=-1), rtol=1e-4)
        # Symmetric PSD.
        np.testing.assert_allclose(cov, np.swapaxes(cov, -1, -2), atol=1e-5)

    def test_isoclinic_rotations_orthogonal(self):
        key = jax.random.PRNGKey(4)
        q = tf.quat_normalize(rand(key, 8, 4))
        for mk in (G.isoclinic_left, G.isoclinic_right):
            m = mk(q)
            np.testing.assert_allclose(m @ np.swapaxes(m, -1, -2),
                                       np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)
            np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-4)

    def test_cov4d_isoclinic_eigvals(self):
        key = jax.random.PRNGKey(5)
        q0 = tf.quat_normalize(rand(key, 8, 4))
        q1 = tf.quat_normalize(rand(jax.random.PRNGKey(6), 8, 4))
        s = jnp.abs(rand(jax.random.PRNGKey(7), 8, 4)) + 0.5
        cov = G.build_cov4d_isoclinic(q0, q1, s)
        evals = np.sort(np.linalg.eigvalsh(cov), axis=-1)
        np.testing.assert_allclose(evals, np.sort(s * s, axis=-1), rtol=1e-3)

    def test_cov4d_motion_structure(self):
        # Splat.h:132-159: Sigma_44 = sigma_t, Sigma_{1:3,4} = dir * sigma_t,
        # and the conditional covariance at any t equals R S S R^T.
        q = tf.quat_normalize(jnp.array([0.3, 0.5, -0.2, 0.8]))
        scale = jnp.array([2.0, 1.0, 0.5])
        lifetime, fade = jnp.asarray(3.0), jnp.asarray(0.25)
        vel = jnp.array([1.0, -2.0, 0.5])
        cov4 = G.build_cov4d_motion(q, scale, lifetime, fade, vel)

        st = float(lifetime) ** 2 / (-2.0 * np.log(float(fade)))
        np.testing.assert_allclose(cov4[3, 3], st, rtol=1e-5)
        np.testing.assert_allclose(cov4[:3, 3], np.asarray(vel) * st, rtol=1e-5)
        np.testing.assert_allclose(cov4, cov4.T, atol=1e-5)

        pos4 = jnp.array([1.0, 2.0, 3.0, 0.5])
        mean3, cov3 = G.slice_cov4d(pos4, cov4, 2.5)
        np.testing.assert_allclose(cov3, G.build_cov3d(q, scale), atol=1e-4)
        # Conditional mean moves at exactly `velocity`:
        # mu(t) = mu + (dir*st/st)*(t-mu_t).
        np.testing.assert_allclose(mean3, np.asarray(pos4[:3]) + np.asarray(vel) * 2.0,
                                   rtol=1e-4)

    def test_fade_constant_matches_reference(self):
        # STD_LOWER special case (Splat.h:29,139): -2 ln 0.5.
        st_formula = G.motion_sigma_t(jnp.asarray(1.0), jnp.asarray(0.5))
        np.testing.assert_allclose(st_formula, 1.0 / G.STD_LOWER, rtol=1e-6)

    def test_temporal_opacity(self):
        pos4 = jnp.array([0.0, 0.0, 0.0, 2.0])
        cov4 = G.build_cov4d_motion(jnp.array([1.0, 0, 0, 0]), jnp.ones(3),
                                    jnp.asarray(2.0), jnp.asarray(0.5),
                                    jnp.zeros(3))
        # At t = mu_t opacity is 1; at t = mu_t + lifetime it equals fade.
        np.testing.assert_allclose(G.temporal_opacity(pos4, cov4, 2.0), 1.0)
        np.testing.assert_allclose(G.temporal_opacity(pos4, cov4, 4.0), 0.5, rtol=1e-5)
        # min_opacity clamp (GLSL :83).
        np.testing.assert_allclose(G.temporal_opacity(pos4, cov4, 100.0, 0.1), 0.1)

    def test_sortkey_quirk(self):
        # mean_in_time_sortkey uses Sigma_{4,1:3} (= vel * sigma_t), NOT the
        # conditional velocity (Scenes.h:28-36).
        pos4 = jnp.array([0.0, 0.0, 0.0, 0.0])
        vel = jnp.array([1.0, 0.0, 0.0])
        cov4 = G.build_cov4d_motion(jnp.array([1.0, 0, 0, 0]), jnp.ones(3),
                                    jnp.asarray(1.0), jnp.asarray(0.5), vel)
        st = 1.0 / G.STD_LOWER
        got = G.mean_in_time_sortkey(pos4, cov4, 3.0)
        np.testing.assert_allclose(got, [3.0 * st, 0.0, 0.0], rtol=1e-5)


class TestEigen2x2:
    def test_matches_numpy(self):
        key = jax.random.PRNGKey(8)
        a = rand(key, 128, 2, 2)
        cov = a @ np.swapaxes(a, -1, -2) + 1e-3 * np.eye(2)
        lmin, lmax, v0 = eigen2x2(jnp.asarray(cov))
        ref = np.linalg.eigvalsh(cov)
        np.testing.assert_allclose(lmin, ref[..., 0], rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(lmax, ref[..., 1], rtol=1e-3, atol=1e-5)
        # v0 is the lambda_min eigenvector.
        resid = np.einsum("nij,nj->ni", cov, v0) - np.asarray(lmin)[:, None] * np.asarray(v0)
        assert np.abs(resid).max() < 1e-2

    def test_isotropic_no_nan(self):
        cov = jnp.broadcast_to(jnp.eye(2) * 2.0, (4, 2, 2))
        lmin, lmax, v0 = eigen2x2(cov)
        assert np.isfinite(np.asarray(v0)).all()
        np.testing.assert_allclose(lmin, 2.0, rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(v0, axis=-1), 1.0, rtol=1e-5)

    def test_eigen_grads_finite(self):
        def f(c):
            lmin, lmax, v0 = eigen2x2(c)
            return jnp.sum(lmin + lmax + v0.sum(-1))
        cov = jnp.array([[[2.0, 0.3], [0.3, 1.0]]])
        g = jax.grad(f)(cov)
        assert np.isfinite(np.asarray(g)).all()


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
