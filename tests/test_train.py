"""Training-loop tests: fitting recovers a perturbed scene; checkpoints
round-trip; SSIM behaves."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs.core.camera import Camera
from fourdgs.parallel.distributed import materialize_splats
from fourdgs.render.pipeline import RenderConfig, render_splats4d
from fourdgs.train import loss as L
from fourdgs.train import trainer


def make_params(key, n=48):
    ks = jax.random.split(key, 6)
    pos4 = jnp.concatenate([
        jax.random.uniform(ks[0], (n, 3), minval=-6, maxval=6),
        jnp.zeros((n, 1))], -1)
    pos4 = pos4.at[:, 2].add(-25.0)
    return dict(position4=pos4,
                quat=jax.random.normal(ks[2], (n, 4)),
                scale3=jnp.full((n, 3), 1.5),
                lifetime=jnp.full((n,), 3.0),
                fade=jnp.full((n,), 0.5),
                velocity=jnp.zeros((n, 3)),
                color=jax.random.uniform(ks[5], (n, 4), minval=0.2, maxval=1.0))


CAM = Camera.create(position=(0, 0, 0), width=64, height=48)
CFG = RenderConfig(max_splats_per_tile=128, splat_chunk=32)


class TestLosses:
    def test_ssim_identity(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 4))
        np.testing.assert_allclose(L.ssim(img, img), 1.0, atol=1e-4)
        other = jax.random.uniform(jax.random.PRNGKey(1), (32, 32, 4))
        assert float(L.ssim(img, other)) < 0.9

    def test_photometric_grad(self):
        img = jax.random.uniform(jax.random.PRNGKey(2), (32, 32, 4))
        tgt = jnp.zeros((32, 32, 4))
        g = jax.grad(lambda x: L.photometric(x, tgt, 0.2))(img)
        assert np.isfinite(np.asarray(g)).all()


class TestFit:
    def test_recovers_shift(self):
        params = make_params(jax.random.PRNGKey(3))
        target = render_splats4d(materialize_splats(params), CAM, 0.0, cfg=CFG)
        # Perturb positions, fit back.
        pert = dict(params)
        pert["position4"] = params["position4"] + jnp.array([0.8, -0.5, 0, 0])
        res = trainer.fit(pert, [(target, 0.0)], CAM, steps=40,
                          learning_rate=2e-2, cfg=CFG)
        assert res.losses[-1] < res.losses[0] * 0.5
        assert np.isfinite(res.losses).all()

    def test_multi_frame_temporal(self):
        # Two target times constrain velocity.
        params = make_params(jax.random.PRNGKey(4), n=24)
        params["velocity"] = jnp.tile(jnp.array([[0.5, 0.0, 0.0]]), (24, 1))
        splats = materialize_splats(params)
        frames = [(render_splats4d(splats, CAM, t, cfg=CFG), t)
                  for t in (0.0, 2.0)]
        pert = dict(params)
        pert["velocity"] = jnp.zeros((24, 3))
        res = trainer.fit(pert, frames, CAM, steps=60, learning_rate=1e-2,
                          cfg=CFG)
        assert res.losses[-1] < res.losses[1] * 0.7


class TestCheckpoint:
    def test_roundtrip(self):
        params = make_params(jax.random.PRNGKey(5), n=8)
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "ckpt")
            trainer.save_checkpoint(p, params, step=3)
            back = trainer.load_checkpoint(p)
            assert set(back) == set(params)
            for k in params:
                np.testing.assert_allclose(np.asarray(back[k]),
                                           np.asarray(params[k]), atol=1e-6)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
