"""Skew robustness of the all_to_all distributed exchange (VERDICT round 2,
weak #5): an adversarial scene concentrating every splat over ONE device's
tile window must either render exactly (with a measured send budget) or
report the loss loudly — never a silently wrong image."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _skewed_scene(n=2000):
    """All splats inside a small region projecting onto a few tiles (one
    device's window gets nearly every pair)."""
    from fourdgs.splats.gaussians import Splats4D
    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    pos = jax.random.uniform(ks[0], (n, 3), minval=-4.0, maxval=-2.0)
    pos = pos.at[:, 2].add(-26.0)
    pos4 = jnp.concatenate([pos, jnp.zeros((n, 1))], axis=-1)
    return Splats4D.from_motion(
        position4=pos4,
        quat=jax.random.normal(ks[1], (n, 4)),
        scale3=jax.random.uniform(ks[2], (n, 3), minval=2.0, maxval=4.0),
        lifetime=jnp.full((n,), 4.0), fade=jnp.full((n,), 0.5),
        velocity=jnp.zeros((n, 3)),
        color=jax.random.uniform(ks[3], (n, 4), minval=0.2, maxval=1.0))


@pytest.mark.slow
def test_skewed_scene_budget_policy():
    from fourdgs.core.camera import Camera
    from fourdgs.parallel import distributed as D
    from fourdgs.parallel.mesh import make_mesh
    from fourdgs.render.pipeline import RenderConfig, render_splats4d

    mesh = make_mesh(jax.devices()[:8])
    splats = _skewed_scene()
    # Tall image: a device's tile window is a narrow horizontal band, so
    # the blob concentrates its pairs into one or two windows.
    camera = Camera.create(position=(-3.0, -3.0, 0.0),
                           orientation=(0.0, 0.0, -1.0),
                           width=128, height=256)
    # Deep slabs + unlimited deepening budget: the blob stacks thousands
    # of pairs on a few tiles; both renders below must be truncation-free
    # for the comparison to be meaningful.
    cfg = RenderConfig(tile_h=8, tile_w=32, max_splats_per_tile=512,
                       splat_chunk=32, max_tiles_per_splat=32,
                       deepening_passes=8, deepening_fraction=1.0)

    # 1. The heuristic (uniform-skew) budget drops pairs on this scene —
    #    and says so through aux.
    # headroom=1.0 == the pure uniform-spread share (the assumption an
    # adversarial scene violates).
    naive = D.default_send_budget(splats.count, 8, cfg.max_tiles_per_splat,
                                  headroom=1.0)
    img_naive, aux_naive = D.render_splats4d_sharded_alltoall(
        splats, camera, 0.0, mesh, cfg=cfg, send_budget=naive,
        return_aux=True)
    assert int(aux_naive["pairs_dropped"]) > 0, \
        "scene not skewed enough to exercise the overflow path"

    # 2. The measured budget restores exactness: zero drops, image matches
    #    the single-device pipeline.
    budget = D.required_send_budget(splats, camera, mesh, cfg)
    assert budget > naive
    img, aux = D.render_splats4d_sharded_alltoall(
        splats, camera, 0.0, mesh, cfg=cfg, send_budget=budget,
        return_aux=True)
    assert int(aux["pairs_dropped"]) == 0
    assert int(aux["overflowed"]) == 0

    want = render_splats4d(splats, camera, 0.0,
                           cfg=RenderConfig(tile_h=8, tile_w=32,
                                            max_splats_per_tile=4096,
                                            splat_chunk=32,
                                            max_tiles_per_splat=32))
    diff = np.abs(np.asarray(img) - np.asarray(want))
    # The alltoall path quantizes depth to 20 bits; pairs tied in a bucket
    # order arbitrarily under either unstable sort, flipping a few pixels
    # where differently-colored splats overlap at equal depth.
    assert diff.mean() < 2e-4, f"mean|diff|={diff.mean():.6f}"
    assert float((diff > 0.02).mean()) < 5e-3, \
        f"{(diff > 0.02).mean():.3%} of pixels off by >0.02"
