"""On-TPU kernel validation: compiled Pallas fwd+bwd vs the XLA twin.

The test suite runs the Pallas compositor in interpret mode (CPU); this
script is the compiled-execution analog of the reference's GPU sort
self-checks (resources/sort_test_*.comp.glsl, SURVEY.md section 4.1): run it
alongside bench.py on a real chip to certify that the *compiled* kernels
(forward and the hand-written backward) agree with the mathematically
identical XLA implementation.

Writes KERNELCHECK.json (one JSON object; "pass": true/false) and exits
nonzero on failure.

Checks:
  1. composite_records compiled vs _xla_composite_from_records (fwd), with
     a nontrivial carry (deepening slab case), at 8x128 and 16x128 tiles.
  2. VJP of the same (hand-written backward kernel vs jax.vjp through the
     twin), records + carry cotangents.
  3. Full pipeline image + parameter gradients: pallas backend vs xla
     backend at matched configs (exact sort), including deepening.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _maxdiff(a, b):
    return float(jnp.max(jnp.abs(a - b)))


def _tree_maxdiff(a, b):
    leaves = jax.tree_util.tree_map(_maxdiff, a, b)
    return max(jax.tree_util.tree_leaves(leaves))


def _relscale(tree):
    return max(1e-3, max(float(jnp.max(jnp.abs(l)))
                         for l in jax.tree_util.tree_leaves(tree)))


def check_composite_records(p, seed=0):
    """Random records at pixel-tile size p: compiled kernel vs XLA twin."""
    from fourdgs.ops.composite_pallas import (_F, composite_records,
                                              _xla_composite_from_records,
                                              identity_carry)
    t_tiles, m = 12, 256
    rng = np.random.default_rng(seed)
    rec = np.zeros((t_tiles, _F, m), np.float32)
    rec[:, 0] = rng.normal(0.0, 0.3, (t_tiles, m))        # sx (k units)
    rec[:, 1] = rng.normal(0.0, 0.3, (t_tiles, m))        # sy
    theta = rng.uniform(0, 2 * np.pi, (t_tiles, m))
    rec[:, 2] = np.cos(theta)
    rec[:, 3] = np.sin(theta)
    rec[:, 4] = 1.0 / rng.uniform(0.02, 0.3, (t_tiles, m))  # 1/l0
    rec[:, 5] = 1.0 / rng.uniform(0.02, 0.3, (t_tiles, m))  # 1/l1
    rec[:, 6:9] = rng.uniform(0, 1, (t_tiles, 3, m))
    rec[:, 9] = rng.uniform(0, 0.9, (t_tiles, m))
    rec = jnp.asarray(rec)
    counts = jnp.asarray(
        rng.integers(0, m + 1, t_tiles, dtype=np.int32))
    kx = jnp.asarray(rng.normal(0.0, 0.4, (t_tiles, 1, p)).astype(np.float32))
    ky = jnp.asarray(rng.normal(0.0, 0.4, (t_tiles, 1, p)).astype(np.float32))
    # Nontrivial carry (as in a deepening pass).
    carry = identity_carry(t_tiles, jnp.float32, p)
    carry = carry.at[:, 0:4, :].set(
        jnp.asarray(rng.uniform(0, 0.3, (t_tiles, 4, p)).astype(np.float32)))
    carry = carry.at[:, 4, :].multiply(
        jnp.asarray(rng.uniform(0.2, 1.0, (t_tiles, p)).astype(np.float32)))

    # counts semantics differ: kernel stops at counts, twin composites all
    # records — zero a_eff past counts so both see the same live set.
    live = (jnp.arange(m)[None, :] < counts[:, None]).astype(jnp.float32)
    rec = rec.at[:, 9, :].multiply(live)

    fwd_k = jax.jit(composite_records)(rec, counts, kx, ky, carry)
    fwd_x = jax.jit(_xla_composite_from_records)(rec, counts, kx, ky, carry)
    d_fwd = _maxdiff(fwd_k[:, 0:5], fwd_x[:, 0:5])

    g = jnp.asarray(rng.normal(0, 1, fwd_k.shape).astype(np.float32))
    g = g.at[:, 5:8].set(0.0)

    def run_k(r, c):
        return composite_records(r, counts, kx, ky, c)

    def run_x(r, c):
        return _xla_composite_from_records(r, counts, kx, ky, c)

    # Build the VJP INSIDE the jit with (rec, carry, g) as arguments:
    # jitting the returned vjp closure instead would bake the residuals
    # into the program as constants (hundreds of MB of MLIR — the tunnel's
    # remote-compile endpoint rejects the payload with HTTP 413).
    def vjp_of(run):
        def pull(r, c, ct):
            _, f = jax.vjp(run, r, c)
            return f(ct)
        return jax.jit(pull)

    dk = vjp_of(run_k)(rec, carry, g)
    dx = vjp_of(run_x)(rec, carry, g)
    d_rec = _maxdiff(dk[0], dx[0]) / _relscale(dx[0])
    # carry cotangent: compare only rows 0..4 (5..7 are dead padding).
    d_car = _maxdiff(dk[1][:, 0:5], dx[1][:, 0:5]) / _relscale(dx[1][:, 0:5])
    return dict(p=p, fwd_maxdiff=d_fwd, bwd_rec_reldiff=d_rec,
                bwd_carry_reldiff=d_car)


def check_pipeline(deepening: bool):
    """Full flagship pipeline: pallas vs xla backend, image + grads."""
    from bench import build_cube_scene
    from fourdgs.core.camera import Camera
    from fourdgs.render.pipeline import RenderConfig, render_params4d_packed

    n = 3000
    params = build_cube_scene(n, seed=3)
    camera = Camera.create(position=(420.0, 300.0, 420.0),
                           orientation=(-1.0, -0.7, -1.0),
                           far=5000.0, width=512, height=256)
    kw = dict(tile_h=8, tile_w=128, max_splats_per_tile=256,
              max_tiles_per_splat=8, splat_chunk=64)
    cfg_p = RenderConfig(backend="pallas", **kw,
                         deepening_passes=3 if deepening else 1,
                         deepening_fraction=1.0)
    cfg_x = RenderConfig(backend="xla", **{**kw,
                                           "max_splats_per_tile": 768})

    def loss(p, cfg):
        img = render_params4d_packed(p, camera, 0.0, cfg=cfg)
        return jnp.sum(img[..., :3] * wts), img

    wts = jax.random.uniform(jax.random.PRNGKey(9), (256, 512, 3),
                             minval=-1.0, maxval=1.0)
    (lp, img_p), gp = jax.jit(jax.value_and_grad(
        lambda p: loss(p, cfg_p), has_aux=True))(params)
    (lx, img_x), gx = jax.jit(jax.value_and_grad(
        lambda p: loss(p, cfg_x), has_aux=True))(params)
    return dict(deepening=deepening,
                img_maxdiff=_maxdiff(img_p, img_x),
                grad_reldiff=_tree_maxdiff(gp, gx) / _relscale(gx))


def main() -> int:
    backend = jax.default_backend()
    results = {
        "backend": backend,
        "compiled": backend == "tpu",
        "records_8x128": check_composite_records(1024),
        "records_16x128": check_composite_records(2048, seed=1),
        "pipeline_single": check_pipeline(False),
        "pipeline_deepening": check_pipeline(True),
    }
    # Compiled-vs-twin drift at coverage thresholds flips isolated pixels;
    # the kernel is otherwise bit-faithful math. Tolerances:
    ok = (results["records_8x128"]["fwd_maxdiff"] < 2e-5
          and results["records_8x128"]["bwd_rec_reldiff"] < 2e-4
          and results["records_8x128"]["bwd_carry_reldiff"] < 2e-4
          and results["records_16x128"]["fwd_maxdiff"] < 2e-5
          and results["records_16x128"]["bwd_rec_reldiff"] < 2e-4
          and results["records_16x128"]["bwd_carry_reldiff"] < 2e-4
          and results["pipeline_single"]["img_maxdiff"] < 5e-2
          and results["pipeline_single"]["grad_reldiff"] < 5e-3
          and results["pipeline_deepening"]["img_maxdiff"] < 5e-2
          and results["pipeline_deepening"]["grad_reldiff"] < 5e-3)
    results["pass"] = bool(ok)
    with open("KERNELCHECK.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
