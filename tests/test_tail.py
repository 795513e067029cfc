"""Streaming banded-OIT tail kernel (ops/tail_pallas.py): kernel-vs-twin
equivalence in interpret mode, band/rect prepass properties, and the
band-combine math. Compiled execution is certified on-chip by
validate_kernels.py (tail entries in KERNELCHECK.json)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs.ops import tail_pallas as TP


def _fixture(n=3000, nx=6, ny=10, k_bands=3, chunk=256, budget=3, seed=0):
    rng = np.random.default_rng(seed)
    tx0 = rng.integers(0, nx, n).astype(np.int32)
    ty0 = rng.integers(0, ny, n).astype(np.int32)
    tx1 = np.minimum(tx0 + rng.integers(0, 3, n), nx - 1).astype(np.int32)
    ty1 = np.minimum(ty0 + rng.integers(0, 3, n), ny - 1).astype(np.int32)
    alive = rng.random(n) > 0.2
    dbits = rng.integers(0, 1 << 20, n).astype(np.int32)
    fields = np.zeros((10, n), np.float32)
    fields[0] = rng.normal(0, 0.5, n)      # sx (k units)
    fields[1] = rng.normal(0, 0.5, n)
    th = rng.uniform(0, 2 * np.pi, n)
    fields[2] = np.cos(th)
    fields[3] = np.sin(th)
    fields[4] = 1.0 / rng.uniform(0.05, 0.4, n)
    fields[5] = 1.0 / rng.uniform(0.05, 0.4, n)
    fields[6:9] = rng.uniform(0, 1, (3, n))
    fields[9] = rng.uniform(0, 0.95, n)
    cut = ((np.arange(nx * ny, dtype=np.int32) << 20)
           | rng.integers(0, 1 << 20, nx * ny).astype(np.int32))
    # k-unit affine sample params: arbitrary but consistent.
    params_row = np.array([0.22, 0.028, -0.9, -0.18, -0.04, 0.8,
                           1e-4, 2e-4], np.float32)
    meta = TP.tail_meta(jnp.asarray(alive), jnp.asarray(tx0),
                        jnp.asarray(tx1), jnp.asarray(ty0),
                        jnp.asarray(ty1), jnp.asarray(dbits), chunk)
    npad = meta.shape[1]
    f = jnp.asarray(np.pad(fields, ((0, 0), (0, npad - n))))
    steps = npad // chunk
    band = jnp.asarray(rng.integers(0, k_bands, steps).astype(np.int32))
    band_np, rect = TP.step_bands_rects(
        meta, chunk, jnp.asarray(np.sort(
            rng.integers(-(1 << 20), 0, k_bands - 1)).astype(np.int32)))
    return dict(fields=f, meta=meta, band=band, rect=rect,
                cut=jnp.asarray(cut), params_row=jnp.asarray(params_row),
                k_bands=k_bands, nx=nx, ny=ny, chunk=chunk, budget=budget)


@pytest.mark.parametrize("s_cy,s_cx", [(4, 16), (2, 8)])
def test_tail_kernel_matches_twin(s_cy, s_cx):
    fx = _fixture()
    kw = {k: fx[k] for k in ("k_bands", "nx", "ny", "chunk", "budget")}
    got = TP.tail_accumulate(fx["fields"], fx["meta"], fx["band"],
                             fx["rect"], fx["cut"], fx["params_row"],
                             s_cy=s_cy, s_cx=s_cx, interpret=True, **kw)
    want = TP.tail_accumulate_xla(fx["fields"], fx["meta"], fx["band"],
                                  fx["rect"], fx["cut"], fx["params_row"],
                                  s_cy=s_cy, s_cx=s_cx, **kw)
    # Kernel matmul inputs are bf16 (f32-accumulated): ~0.4% relative
    # quantization vs the f32 twin is the expected envelope.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)
    # Nontrivial fixture: something actually accumulated.
    assert float(jnp.sum(jnp.abs(got))) > 1.0


def test_rect_covers_all_live_tiles():
    fx = _fixture(seed=3)
    meta = np.asarray(fx["meta"])
    rect = np.asarray(fx["rect"])
    chunk = fx["chunk"]
    tx0, tx1, ty0, ty1, _, span = meta
    for s in range(rect.shape[0]):
        sl = slice(s * chunk, (s + 1) * chunk)
        live = span[sl] > 0
        if not live.any():
            continue
        txw, tyw, nwx, nwy = rect[s]
        assert tyw % 8 == 0
        assert txw <= tx0[sl][live].min()
        assert tx1[sl][live].max() < txw + nwx * TP.WIN_TX
        assert tyw <= ty0[sl][live].min()
        assert ty1[sl][live].max() < tyw + nwy * TP.WIN_TY


def test_band_cuts_order_and_combine():
    # global_band_cuts: nearest pairs (largest dbits) must land in band 0.
    rng = np.random.default_rng(0)
    dbits = rng.integers(0, 1 << 20, 5000).astype(np.int32)
    keys = (rng.integers(0, 100, 5000).astype(np.int32) << 20) | dbits
    keys[:500] = np.iinfo(np.int32).max          # dead
    cuts = TP.global_band_cuts(jnp.asarray(keys), 4)
    assert np.all(np.diff(np.asarray(cuts)) >= 0)
    near = np.searchsorted(np.asarray(cuts), -int(dbits.max()),
                           side="right")
    far = np.searchsorted(np.asarray(cuts), -int(dbits[dbits > 0].min()),
                          side="right")
    assert near == 0 and far == 3

    # combine: one band, uniform alpha a over m pairs at one sample ->
    # transmittance (1-a)^m exactly; color -> c * (1 - (1-a)^m).
    a, m, c = 0.1, 7, 0.6
    A = a * m
    L = np.log1p(-a) * m
    planes = jnp.asarray([[A, A * c, A * c, A * c, a * A, L]],
                         jnp.float32)  # (tiles=1, planes) at 1 sample
    rgb, alpha, trans = TP.combine_bands(
        planes.reshape(1, 1, 6, 1))     # (T, K, planes, S)
    np.testing.assert_allclose(float(trans[0, 0]), (1 - a) ** m, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb[0, :, 0]),
                               c * (1 - (1 - a) ** m), rtol=1e-5)
    np.testing.assert_allclose(float(alpha[0, 0]),
                               a * (1 - (1 - a) ** m), rtol=1e-5)


def test_tail_backward_matches_twin_ad():
    """Hand-written tail backward kernel vs jax.grad through the XLA twin:
    field cotangents must agree (the twin is plain jnp, so its AD is the
    ground truth for the kernel's chain rule, including the
    mass-preserving-widening terms)."""
    fx = _fixture(n=1500, chunk=256, seed=4)
    kw = {k: fx[k] for k in ("k_bands", "nx", "ny", "chunk", "budget")}
    s_cy, s_cx = 2, 16
    wts = jax.random.normal(jax.random.PRNGKey(3),
                            (TP.N_PLANES * s_cy * s_cx,))

    def loss_kernel(f):
        acc = TP.tail_accumulate(f, fx["meta"], fx["band"], fx["rect"],
                                 fx["cut"], fx["params_row"],
                                 s_cy=s_cy, s_cx=s_cx, interpret=True, **kw)
        return jnp.sum(acc * wts[None, :].reshape(1, -1))

    def loss_twin(f):
        acc = TP.tail_accumulate_xla(f, fx["meta"], fx["band"], fx["rect"],
                                     fx["cut"], fx["params_row"],
                                     s_cy=s_cy, s_cx=s_cx, **kw)
        return jnp.sum(acc * wts[None, :].reshape(1, -1))

    gk = np.asarray(jax.grad(loss_kernel)(fx["fields"]))
    gt = np.asarray(jax.grad(loss_twin)(fx["fields"]))
    scale = max(np.abs(gt).max(), 1e-3)
    assert np.abs(gk).sum() > 0          # nontrivial
    np.testing.assert_allclose(gk / scale, gt / scale, atol=5e-3)


@pytest.mark.slow
def test_training_through_converged_stack():
    """A few Adam steps through the FULL converged pipeline (exact head +
    banded tail, pallas interpret) must reduce the loss: the tail's
    hand-written backward drives real parameter learning end to end."""
    from fourdgs.core.camera import Camera
    from fourdgs.render.pipeline import RenderConfig, render_params4d_packed
    from bench import build_cube_scene
    import optax

    cam = Camera.create(position=(420.0, 300.0, 420.0),
                        orientation=(-1.0, -0.7, -1.0),
                        far=5000.0, width=256, height=64)
    cfg = RenderConfig(tile_h=8, tile_w=128, backend="pallas",
                       max_splats_per_tile=128, max_tiles_per_splat=8,
                       splat_chunk=32, quantized_depth_sort=True,
                       big_splat_budget=16, depth_prune_cap=128,
                       depth_prune_safety=1.2, deepening_fraction=1.0,
                       tail_mode="banded", tail_bands=4, tail_block=(4, 8),
                       tail_chunk=256)
    params = build_cube_scene(1200, seed=7)
    target = render_params4d_packed(
        build_cube_scene(1200, seed=8), cam, 0.0, cfg=cfg)

    def loss_fn(p):
        img = render_params4d_packed(p, cam, 0.0, cfg=cfg)
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    opt = optax.adam(5e-2)
    st = opt.init(params)
    step = jax.jit(jax.value_and_grad(loss_fn))
    losses = []
    for _ in range(4):
        l, g = step(params)
        assert all(bool(jnp.all(jnp.isfinite(v))) for v in g.values())
        up, st = opt.update(g, st, params)
        params = optax.apply_updates(params, up)
        losses.append(float(l))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_tail_kernel_slot_mask_matches_twin():
    # The per-(slot, sub-block) skip mask is a provably-conservative
    # superset of the kernel's live condition: the masked kernel must be
    # EXACTLY the unmasked twin.
    fx = _fixture(n=3000, chunk=256, budget=3)
    mask = TP.step_slot_masks(fx["meta"], fx["chunk"], fx["budget"])
    acc_k = TP.tail_accumulate(
        fx["fields"], fx["meta"], fx["band"], fx["rect"], fx["cut"],
        fx["params_row"], k_bands=fx["k_bands"], nx=fx["nx"], ny=fx["ny"],
        chunk=fx["chunk"], budget=fx["budget"], s_cy=4, s_cx=16,
        slot_mask=mask)
    acc_x = TP.tail_accumulate_xla(
        fx["fields"], fx["meta"], fx["band"], fx["rect"], fx["cut"],
        fx["params_row"], k_bands=fx["k_bands"], nx=fx["nx"], ny=fx["ny"],
        chunk=fx["chunk"], budget=fx["budget"], s_cy=4, s_cx=16)
    np.testing.assert_allclose(np.asarray(acc_k), np.asarray(acc_x),
                               rtol=2e-2, atol=2e-3)


def test_tail_kernel_weights_match_twin():
    # Depth weighting (wd_ab) and alpha-power weighting must agree with
    # the jnp twin, forward and backward.
    fx = _fixture(n=2000, chunk=256, budget=3)
    steps = fx["band"].shape[0]
    rng = np.random.default_rng(5)
    wd_ab = jnp.asarray(
        np.c_[rng.uniform(0, 2e-5, steps),
              rng.uniform(-1.0, 0.0, steps)].astype(np.float32))
    kw = dict(k_bands=fx["k_bands"], nx=fx["nx"], ny=fx["ny"],
              chunk=fx["chunk"], budget=fx["budget"], s_cy=4, s_cx=16)

    def k_sum(f):
        acc = TP.tail_accumulate(f, fx["meta"], fx["band"], fx["rect"],
                                 fx["cut"], fx["params_row"], wd_ab=wd_ab,
                                 alpha_pow=1, **kw)
        return jnp.sum(acc * jnp.cos(jnp.arange(acc.size).reshape(acc.shape)))

    def x_sum(f):
        acc = TP.tail_accumulate_xla(f, fx["meta"], fx["band"], fx["rect"],
                                     fx["cut"], fx["params_row"],
                                     wd_ab=wd_ab, alpha_pow=1, **kw)
        return jnp.sum(acc * jnp.cos(jnp.arange(acc.size).reshape(acc.shape)))

    vk, gk = jax.value_and_grad(k_sum)(fx["fields"])
    vx, gx = jax.value_and_grad(x_sum)(fx["fields"])
    np.testing.assert_allclose(float(vk), float(vx), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               rtol=5e-2, atol=2e-2 * float(
                                   jnp.max(jnp.abs(gx))))


def test_tail_prepass_matches_xla_formulation():
    fx = _fixture(n=5000, chunk=256, budget=3)
    rng = np.random.default_rng(7)
    cuts = jnp.asarray(np.sort(
        rng.integers(-(1 << 20), 0, fx["k_bands"] - 1)).astype(np.int32))
    band_x, rect_x = TP.step_bands_rects(fx["meta"], fx["chunk"], cuts,
                                         0, fx["budget"])
    mask_x = TP.step_slot_masks(fx["meta"], fx["chunk"], fx["budget"])
    rows = tuple(fx["meta"][i] for i in range(6))
    band_p, rect_p, mask_p = TP.tail_prepass(
        rows, cuts, fx["chunk"], fx["budget"], k_bands=fx["k_bands"])
    np.testing.assert_array_equal(np.asarray(band_x), np.asarray(band_p))
    np.testing.assert_array_equal(np.asarray(rect_x), np.asarray(rect_p))
    np.testing.assert_array_equal(np.asarray(mask_x), np.asarray(mask_p))
