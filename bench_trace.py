"""Trace-based per-stage attribution of the headline bench frame.

Round-3's standalone stage timings were self-contradictory (a fixed
tunneled-dispatch cost dominated every isolated measurement — VERDICT r3
missing #5): the only trustworthy attribution is MARGINAL time inside the
real compiled frame. This captures one `jax.profiler` trace of the exact
bench workload (shared `bench.bench_setup()`), maps every device-side XLA op
back to its pipeline stage through the compiled HLO's `op_name` metadata
(the `jax.named_scope` markers in render/pipeline.py + render/tiles.py), and
writes SOL_r05.json: per-stage device ms that SUM to the measured frame,
plus per-stage HBM bytes (from the profiler's `bytes_accessed`) and the
implied bandwidth against the v5e peak (819 GB/s).

Usage:  python bench_trace.py           (env knobs same as bench.py)
Output: SOL_r05.json + a human table on stderr.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

V5E_HBM_GBPS = 819.0


def capture(render, params, reps: int = 6) -> str:
    import jax
    import jax.numpy as jnp
    from bench import _force

    t = jnp.asarray(0.0)
    _force(render(params, t))                      # compile + warm
    trace_dir = "/tmp/fourdgs_trace"
    with jax.profiler.trace(trace_dir):
        outs = [render(params, t) for _ in range(reps)]
        _force(outs[-1][0])
    runs = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*")))
    files = glob.glob(os.path.join(runs[-1], "*.trace.json.gz"))
    return files[0]


def hlo_scope_map(render, params) -> dict:
    """instruction name -> named_scope path, from compiled HLO metadata."""
    import jax.numpy as jnp
    txt = render.lower(params, jnp.asarray(0.0)).compile().as_text()
    scope = {}
    # metadata={op_name="jit(<lambda>)/bin_sort/global_sort/sort" ...}
    for m in re.finditer(
            r'%?([\w.\-]+)\s*=[^\n]*?metadata=\{[^}]*?op_name="([^"]+)"',
            txt):
        scope[m.group(1)] = m.group(2)
    return scope


STAGES = [
    # (label, regex over the op_name scope path) — first match wins.
    ("project", r"/project/"),
    ("emit", r"/emit(_big)?/"),
    ("depth_prune", r"/depth_prune/"),
    ("rowsort_compact", r"/rowsort_compact/"),
    ("global_sort", r"/global_sort/"),
    ("csr", r"/csr/"),
    ("bin_sort_other", r"/bin_sort/"),
    ("pass1_pack", r"/pass1_pack/"),
    ("pass1_kernel", r"/pass1_kernel/"),
    ("deepen_select", r"/deepen_\d+_select/"),
    ("deepen_pack", r"/deepen_\d+_pack/"),
    ("deepen_kernel", r"/deepen_\d+_kernel/"),
    ("head_exhaust", r"/head_exhaust/"),
    ("tail_main", r"/tail_main/"),
    ("tail_big", r"/tail_big/"),
    ("tail_combine", r"/tail_combine/"),
    ("tail_prep", r"/tail/"),
    ("composite_other", r"/composite/"),
]


def classify(path: str) -> str:
    for label, pat in STAGES:
        if re.search(pat, path):
            return label
    return "other"


def attribute(trace_file: str, scopes: dict, reps: int):
    with gzip.open(trace_file) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    # Device pid: the process named /device:TPU:*
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    # "XLA Ops" thread(s) of the device.
    op_tids = {(e["pid"], e["args"]["name"] == "XLA Ops" and e["tid"])
               for e in ev if e.get("ph") == "M"
               and e.get("name") == "thread_name" and e["pid"] in dev_pids}
    op_tids = {(p, t) for p, t in op_tids if t is not False}

    ms = collections.Counter()
    gb = collections.Counter()
    op_ms = collections.defaultdict(collections.Counter)
    for e in ev:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        name = e["name"]
        # Trace op names match HLO instruction names (dots preserved).
        path = scopes.get(name) or scopes.get(name.split(".")[0], "")
        label = classify(path)
        d_ms = e["dur"] / 1e3 / reps
        ms[label] += d_ms
        op_ms[label][name] += d_ms
        gb[label] += int(e.get("args", {}).get("bytes_accessed", 0)) / 1e9 / reps
    return ms, gb, op_ms


def main() -> int:
    import jax
    from bench import bench_setup

    render, params, env = bench_setup()
    reps = 6
    trace_file = capture(render, params, reps)
    scopes = hlo_scope_map(render, params)
    ms, gb, op_ms = attribute(trace_file, scopes, reps)

    total = sum(ms.values())
    rows = []
    for label in [s[0] for s in STAGES] + ["other"]:
        if ms[label] == 0:
            continue
        bw = gb[label] / (ms[label] / 1e3) if ms[label] else 0.0
        top = op_ms[label].most_common(3)
        rows.append(dict(stage=label, ms=round(ms[label], 3),
                         pct=round(100 * ms[label] / total, 1),
                         hbm_gb=round(gb[label], 4),
                         gbps=round(bw, 1),
                         hbm_frac_of_peak=round(bw / V5E_HBM_GBPS, 3),
                         top_ops=[f"{n} {v:.2f}ms" for n, v in top]))
    rows.sort(key=lambda r: -r["ms"])
    out = {
        "source": "jax.profiler device trace of the exact bench frame "
                  "(bench.bench_setup); per-op device_duration averaged "
                  f"over {reps} frames and mapped to pipeline stages via "
                  "compiled-HLO op_name metadata (named_scope markers). "
                  "These are MARGINAL in-frame times: they sum to the "
                  "device total below. The r3 standalone stage timings "
                  "(SOL_r03.json) are superseded — they carried a fixed "
                  "tunneled-dispatch cost per measurement.",
        "config": {k: (list(v) if isinstance(v, tuple) else v)
                   for k, v in env.items()},
        "device_total_ms": round(total, 2),
        "stages": rows,
    }
    with open("SOL_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"device total {total:.1f} ms over {len(rows)} stages",
          file=sys.stderr)
    for r in rows:
        print(f"  {r['stage']:<18} {r['ms']:>8.2f} ms  {r['pct']:>5.1f}%  "
              f"{r['gbps']:>7.1f} GB/s", file=sys.stderr)
    print(json.dumps({"metric": "traced device ms per frame",
                      "value": round(total, 2), "unit": "ms"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
