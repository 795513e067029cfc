"""On-TPU kernel validation: compiled Pallas fwd+bwd vs f64 ground truth.

The test suite runs the Pallas compositor in interpret mode (CPU); this
script is the compiled-execution analog of the reference's GPU sort
self-checks (resources/sort_test_*.comp.glsl, SURVEY.md section 4.1): run it
alongside bench.py on a real chip to certify the *compiled* kernels.

Round-3 finding (the round-2 run failed its own thresholds): comparing the
compiled kernel against the f32 XLA twin ON TPU conflates two error sources.
Measured against an f64 reference, the compiled Pallas kernel (product-space
transmittance scan) is ~3e-6 accurate, while the f32 XLA twin drifts ~2e-3
on TPU — its log1p/exp-cumsum round trip compounds TPU transcendental
approximation error over 256-deep blends. So the pass gate here compares
each implementation against an f64 reference computed on CPU (in a
subprocess, since x64 mode cannot coexist with the i32-indexed kernel), and
requires the compiled kernel to be at least as faithful as the twin.

Checks:
  1. composite_records compiled vs f64 reference (fwd), with a nontrivial
     carry (deepening slab case), at 8x128 and 16x128 tiles.
  2. VJP of the same (hand-written backward kernel vs f64 jax.vjp through
     the twin), records + carry cotangents.
  3. Full pipeline image + parameter gradients: pallas backend vs xla
     backend at matched configs (exact sort), including deepening.

Writes KERNELCHECK.json (one JSON object; "pass": true/false) and exits
nonzero on failure.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REF_PATH = "/tmp/fourdgs_kernelcheck_ref.npz"


def build_fixture(p, seed=0):
    """Deterministic record/pixel/carry fixture (numpy, f32)."""
    t_tiles, m = 12, 256
    rng = np.random.default_rng(seed)
    rec = np.zeros((t_tiles, 16, m), np.float32)
    rec[:, 0] = rng.normal(0.0, 0.3, (t_tiles, m))        # sx (k units)
    rec[:, 1] = rng.normal(0.0, 0.3, (t_tiles, m))        # sy
    theta = rng.uniform(0, 2 * np.pi, (t_tiles, m))
    rec[:, 2] = np.cos(theta)
    rec[:, 3] = np.sin(theta)
    rec[:, 4] = 1.0 / rng.uniform(0.02, 0.3, (t_tiles, m))  # 1/l0
    rec[:, 5] = 1.0 / rng.uniform(0.02, 0.3, (t_tiles, m))  # 1/l1
    rec[:, 6:9] = rng.uniform(0, 1, (t_tiles, 3, m))
    rec[:, 9] = rng.uniform(0, 0.9, (t_tiles, m))
    counts = rng.integers(0, m + 1, t_tiles, dtype=np.int32)
    kx = rng.normal(0.0, 0.4, (t_tiles, 1, p)).astype(np.float32)
    ky = rng.normal(0.0, 0.4, (t_tiles, 1, p)).astype(np.float32)
    carry = np.zeros((t_tiles, 8, p), np.float32)
    carry[:, 4] = 1.0
    carry[:, 0:4] = rng.uniform(0, 0.3, (t_tiles, 4, p)).astype(np.float32)
    carry[:, 4] *= rng.uniform(0.2, 1.0, (t_tiles, p)).astype(np.float32)
    # counts semantics differ between kernel and twin: zero a_eff past
    # counts so both see the same live set.
    live = (np.arange(m)[None, :] < counts[:, None]).astype(np.float32)
    rec[:, 9, :] *= live
    g = rng.normal(0, 1, (t_tiles, 8, p)).astype(np.float32)
    g[:, 5:8] = 0.0
    return dict(rec=rec, counts=counts, kx=kx, ky=ky, carry=carry, g=g)


FIXTURES = [(1024, 0), (2048, 1)]


def ref_main():
    """Subprocess mode: compute f64 references on CPU and save them."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from fourdgs.ops.composite_pallas import _xla_composite_from_records

    out = {}
    for p, seed in FIXTURES:
        fx = build_fixture(p, seed)
        f64 = lambda x: jnp.asarray(x, jnp.float64)
        rec, carry, gg = f64(fx["rec"]), f64(fx["carry"]), f64(fx["g"])
        counts = jnp.asarray(fx["counts"])
        kx, ky = f64(fx["kx"]), f64(fx["ky"])

        def run(r, c):
            return _xla_composite_from_records(r, counts, kx, ky, c)

        fwd, pull = jax.vjp(run, rec, carry)
        d_rec, d_car = pull(gg)
        key = f"{p}_{seed}"
        out[f"fwd_{key}"] = np.asarray(fwd)
        out[f"drec_{key}"] = np.asarray(d_rec)
        out[f"dcar_{key}"] = np.asarray(d_car)
    np.savez(REF_PATH, **out)
    print(f"wrote {REF_PATH}")


def _maxdiff(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def _relscale(x):
    return max(1e-3, float(np.max(np.abs(np.asarray(x)))))


def check_records(refs, p, seed):
    """Compiled kernel AND f32 twin vs the f64 reference."""
    import jax
    import jax.numpy as jnp
    from fourdgs.ops.composite_pallas import (composite_records,
                                              _xla_composite_from_records)

    fx = build_fixture(p, seed)
    key = f"{p}_{seed}"
    ref_fwd = refs[f"fwd_{key}"][:, 0:5]
    ref_drec = refs[f"drec_{key}"]
    ref_dcar = refs[f"dcar_{key}"][:, 0:5]

    rec = jnp.asarray(fx["rec"])
    counts = jnp.asarray(fx["counts"])
    kx, ky = jnp.asarray(fx["kx"]), jnp.asarray(fx["ky"])
    carry = jnp.asarray(fx["carry"])
    g = jnp.asarray(fx["g"])

    def vjp_of(run):
        def pull(r, c, ct):
            _, f = jax.vjp(run, r, c)
            return f(ct)
        return jax.jit(pull)

    res = {"p": p}
    for name, run in (("pallas", lambda r, c: composite_records(
                          r, counts, kx, ky, c)),
                      ("twin", lambda r, c: _xla_composite_from_records(
                          r, counts, kx, ky, c))):
        fwd = jax.jit(run)(rec, carry)
        dk = vjp_of(run)(rec, carry, g)
        res[f"{name}_fwd_vs_f64"] = _maxdiff(fwd[:, 0:5], ref_fwd)
        res[f"{name}_drec_vs_f64"] = (_maxdiff(dk[0], ref_drec)
                                      / _relscale(ref_drec))
        res[f"{name}_dcar_vs_f64"] = (_maxdiff(dk[1][:, 0:5], ref_dcar)
                                      / _relscale(ref_dcar))
    return res


def check_pipeline(deepening: bool):
    """Full flagship pipeline: pallas vs xla backend, image + grads.

    deepening=True shrinks the slab to 64 so the deepening passes carry
    REAL work (the scene's deepest tile holds ~149 pairs): pass 2+ must
    resume from a nontrivial carry through composite_records_at. The aux
    assertion below makes the check fail loudly if a config change ever
    makes it vacuous again (ADVICE r3: the r3 check compared bit-identical
    single-pass results)."""
    import jax
    import jax.numpy as jnp
    from bench import build_cube_scene
    from fourdgs.core.camera import Camera
    from fourdgs.render.pipeline import RenderConfig, render_params4d_packed

    n = 3000
    params = build_cube_scene(n, seed=3)
    camera = Camera.create(position=(420.0, 300.0, 420.0),
                           orientation=(-1.0, -0.7, -1.0),
                           far=5000.0, width=512, height=256)
    kw = dict(tile_h=8, tile_w=128, max_tiles_per_splat=8, splat_chunk=64)
    slab = 128 if deepening else 256   # deepest tile ~149 > 128: real work
    cfg_p = RenderConfig(backend="pallas", **kw, max_splats_per_tile=slab,
                         deepening_passes=3 if deepening else 1,
                         deepening_fraction=1.0)
    cfg_x = RenderConfig(backend="xla", **kw, max_splats_per_tile=768)

    def loss(p, cfg):
        img = render_params4d_packed(p, camera, 0.0, cfg=cfg)
        return jnp.sum(img[..., :3] * wts), img

    wts = jax.random.uniform(jax.random.PRNGKey(9), (256, 512, 3),
                             minval=-1.0, maxval=1.0)
    (lp, img_p), gp = jax.jit(jax.value_and_grad(
        lambda p: loss(p, cfg_p), has_aux=True))(params)
    (lx, img_x), gx = jax.jit(jax.value_and_grad(
        lambda p: loss(p, cfg_x), has_aux=True))(params)

    res = dict(deepening=deepening)
    if deepening:
        _, aux = jax.jit(lambda p: render_params4d_packed(
            p, camera, 0.0, cfg=cfg_p, return_aux=True))(params)
        res["deepest_tile_pairs"] = int(aux["max_tile_pairs"])
        res["deepening_nonvacuous"] = bool(aux["max_tile_pairs"] > slab)
        res["resid_transmittance"] = float(aux["resid_transmittance"])

    leaves_d = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(_maxdiff, gp, gx))
    scale = max(_relscale(l) for l in jax.tree_util.tree_leaves(gx))
    res.update(img_maxdiff=_maxdiff(img_p, img_x),
               grad_reldiff=max(leaves_d) / scale)
    return res


def _kv64(k, v):
    """Combine int32 kv into sortable int64 pair codes (numpy, host)."""
    return (np.asarray(k).astype(np.int64) << 32) | (
        np.asarray(v).astype(np.int64) & 0xFFFFFFFF)


def check_sort():
    """COMPILED execution of the shipped pallas sort/compact/prune kernels,
    mirroring the reference's GPU sort self-checks
    (resources/sort_test_{check_sorted,arr_compare,count_elements}.comp.glsl):
    monotone order, element conservation (permutation property), and
    equality against the XLA formulation. The unit tests run these kernels
    in interpret mode only; this is the on-chip certification (ADVICE r3:
    rowsort_compact/apply_cutkeys ship ON in the bench config)."""
    import jax
    import jax.numpy as jnp
    from fourdgs.ops.lookup_pallas import apply_cutkeys
    from fourdgs.ops.sort_pallas import DEAD, merge_sorted_rows, rowsort_compact

    rng = np.random.default_rng(7)
    s = 1 << 22
    t = 1020
    tile = rng.integers(0, t, s, dtype=np.int32)
    depth = rng.integers(0, 1 << 20, s, dtype=np.int32)
    key_np = (tile << 20) | depth
    key_np[rng.random(s) < 0.45] = DEAD          # dead slots like emission
    val_np = np.arange(s, dtype=np.int32)
    key = jnp.asarray(key_np)
    val = jnp.asarray(val_np)
    res = {}

    # 1. apply_cutkeys (streamed prune lookup) vs the XLA formula.
    cut_np = ((np.arange(t, dtype=np.int32) << 20)
              | rng.integers(0, 1 << 20, t, dtype=np.int32))
    cut = jnp.asarray(cut_np)
    pruned = np.asarray(jax.jit(apply_cutkeys)(key, cut))
    ref = np.where(key_np <= cut_np[np.clip(key_np >> 20, 0, t - 1)],
                   key_np, DEAD)
    res["cutkeys_match"] = bool(np.array_equal(pruned, ref))

    # 2. rowsort_compact: dropped==0 at a margin keep, per-row monotone
    #    order, and exact live-pair (key, value) multiset conservation.
    row_len, keep = 512, 384
    ok, ov, dropped = jax.jit(
        lambda k, v: rowsort_compact(k, v, keep, row_len=row_len))(key, val)
    ok, ov, dropped = np.asarray(ok), np.asarray(ov), int(dropped)
    res["rowsort_dropped"] = dropped
    mono = np.all(np.diff(ok.astype(np.int64), axis=0) >= 0)
    res["rowsort_monotone"] = bool(mono)
    live_in = key_np != DEAD
    kept_live = ok != DEAD
    res["rowsort_conserves"] = bool(
        dropped == 0
        and np.array_equal(
            np.sort(_kv64(ok[kept_live], ov[kept_live])),
            np.sort(_kv64(key_np[live_in], val_np[live_in]))))

    # 3. merge_sorted_rows: globally monotone + multiset conservation.
    r_rows, c = 128, 2048
    k2_np = np.sort(key_np[:r_rows * c].reshape(r_rows, c), axis=1)
    k2_np[1::2] = k2_np[1::2, ::-1]
    v2_np = rng.integers(0, 1 << 30, (r_rows, c), dtype=np.int32)
    km, vm = jax.jit(lambda a, b: merge_sorted_rows(
        a, b, rows_alternating=True))(jnp.asarray(k2_np), jnp.asarray(v2_np))
    km = np.asarray(km)
    res["merge_monotone"] = bool(np.all(np.diff(km.astype(np.int64)) >= 0))
    res["merge_conserves"] = bool(np.array_equal(
        np.sort(km), np.sort(k2_np.reshape(-1))))
    return res


def check_tail_parity(n=1_000_000, width=1024, height=512, seed=2,
                      deepening_passes=80):
    """Mid-scale on-chip parity gate (VERDICT r3 #7): ~1M splats through
    the FULL production stack — quantized sort, prune + post-sort re-cut,
    Pallas head, streaming banded-OIT tail — against an exhaustively
    deepened exact composite of the same scene. Closes the certification
    gap between test_parity (20K, CPU) and the 10M bench: the banded
    tail's approximation (coarse sampling + within-band OIT mixing) is
    REAL error and this measures it where an exact reference is still
    computable. The exact reference must itself report ~zero residual
    transmittance or the gate is invalid.

    With n=10M and the bench camera/resolution this IS the parity
    artifact at the headline scene itself (VERDICT r4 weak #2); run via
    FOURDGS_VALIDATE_10M=1 (adds several minutes: the exact reference
    deepens every tile to its full ~36K-pair depth)."""
    import jax
    import jax.numpy as jnp
    from bench import build_cube_scene
    from fourdgs.core.camera import Camera
    from fourdgs.render.pipeline import RenderConfig, render_params4d_packed
    from fourdgs.splats.packed import morton_order

    params = morton_order(build_cube_scene(n, seed=seed))
    cam = Camera.create(position=(420.0, 300.0, 420.0),
                        orientation=(-1.0, -0.7, -1.0),
                        far=5000.0, width=width, height=height)
    kw = dict(tile_h=16, tile_w=128, max_tiles_per_splat=8,
              splat_chunk=128, big_splat_budget=16)
    cfg_exact = RenderConfig(backend="pallas", **kw,
                             max_splats_per_tile=512,
                             quantized_depth_sort=True,
                             deepening_fraction=1.0,
                             deepening_passes=deepening_passes)
    # The gate certifies the SHIPPED flagship configuration: whatever
    # auto_render_config derives for this (n, resolution) is what the
    # bench and the viewer run.
    from fourdgs.render.autoconfig import auto_render_config
    cfg_tail = auto_render_config(n, width, height, converged=True)
    img_x, aux_x = jax.jit(lambda p: render_params4d_packed(
        p, cam, 0.0, cfg=cfg_exact, return_aux=True))(params)
    img_t, aux_t = jax.jit(lambda p: render_params4d_packed(
        p, cam, 0.0, cfg=cfg_tail, return_aux=True))(params)
    ix = np.asarray(img_x)[..., :3]
    it = np.asarray(img_t)[..., :3]
    d = np.abs(it - ix)
    return dict(
        n=n,
        exact_resid=float(aux_x["resid_transmittance"]),
        tail_resid=float(aux_t["resid_transmittance"]),
        mean_rgb_exact=float(ix.mean()),
        mean_rgb_tail=float(it.mean()),
        mean_rel_err=float(abs(it.mean() - ix.mean()) / max(ix.mean(), 1e-6)),
        mean_abs_err=float(d.mean()),
        p99_abs_err=float(np.percentile(d, 99)),
        max_abs_err=float(d.max()),
    )


def main() -> int:
    # f64 references from a clean CPU/x64 subprocess (x64 mode cannot
    # coexist in-process with the i32-indexed compiled kernel).
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_ENABLE_X64="1")
    subprocess.run([sys.executable, __file__, "--ref"], check=True, env=env,
                   cwd=os.path.dirname(os.path.abspath(__file__)))
    refs = np.load(REF_PATH)

    import jax
    backend = jax.default_backend()
    results = {
        "backend": backend,
        "compiled": backend == "tpu",
        "records_8x128": check_records(refs, *FIXTURES[0]),
        "records_16x128": check_records(refs, *FIXTURES[1]),
        "pipeline_single": check_pipeline(False),
        "pipeline_deepening": check_pipeline(True),
        "sort": check_sort(),
        "tail_parity_1m": check_tail_parity(),
    }
    if os.environ.get("FOURDGS_VALIDATE_10M"):
        # The parity artifact at the BENCH scene itself (10M, 1080p):
        # exact reference exhausts the deepest tile (~36K pairs needs
        # 72 passes x 512).
        results["tail_parity_10m"] = check_tail_parity(
            n=10_000_000, width=1920, height=1088, seed=0,
            deepening_passes=80)
    ok = True
    for k in ("records_8x128", "records_16x128"):
        r = results[k]
        # Forward + carry cotangent: the compiled kernel must track the f64
        # ground truth tightly (measured ~3e-6) and never be less faithful
        # than the twin. Record cotangent: the one-pass rematerializing
        # backward computes suffix sums as (total - inclusive prefix); the
        # f32 cancellation, amplified by the 1/(1-alpha) term, costs ~1e-2
        # relative-to-max accuracy vs the twin's ~1e-3 (whose reverse-mode
        # AD accumulates suffixes back-to-front at ~3x the HBM traffic).
        # 1% of max-gradient is far below training noise; semantic
        # correctness is pinned by the f64 FD gradcheck (tests/
        # test_gradcheck.py), so the gate here is the conditioning bound.
        ok &= r["pallas_fwd_vs_f64"] < 1e-4
        ok &= r["pallas_drec_vs_f64"] < 2e-2
        ok &= r["pallas_dcar_vs_f64"] < 1e-3
        ok &= r["pallas_fwd_vs_f64"] <= r["twin_fwd_vs_f64"] * 2 + 1e-5
    for k in ("pipeline_single", "pipeline_deepening"):
        # pallas-vs-xla at pipeline level: coverage-threshold flips move
        # isolated pixels; grads agree to twin-accuracy.
        ok &= results[k]["img_maxdiff"] < 5e-2
        ok &= results[k]["grad_reldiff"] < 5e-3
    # The deepening check must exercise real deepening work (fail loudly if
    # a config change ever makes it a no-op again).
    ok &= results["pipeline_deepening"]["deepening_nonvacuous"]
    for k, v in results["sort"].items():
        ok &= (v == 0) if k == "rowsort_dropped" else bool(v)
    # Mid-scale full-stack parity (the banded-OIT tail's honest error
    # envelope, measured where an exact reference is computable):
    # the exact reference must be genuinely exhausted; the tail must drop
    # nothing; the aggregate image must track the exact one (the local
    # p99/max errors are the quantified cost of within-band OIT mixing on
    # opaque-core splats — recorded, not gated; see BASELINE.md).
    tp = results["tail_parity_1m"]
    ok &= tp["exact_resid"] < 1e-3
    ok &= tp["tail_resid"] < 1e-6
    ok &= tp["mean_rel_err"] < 0.02
    ok &= tp["mean_abs_err"] < 0.03
    results["pass"] = bool(ok)
    with open("KERNELCHECK.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0 if ok else 1


if __name__ == "__main__":
    if "--ref" in sys.argv:
        ref_main()
        sys.exit(0)
    sys.exit(main())
