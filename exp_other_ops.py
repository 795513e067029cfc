"""Drill-down: list the top unattributed ("other") ops of the bench frame
trace with their HLO scope paths and per-frame ms (measurement harness)."""
import collections
import gzip
import json
import sys

from bench_trace import attribute, capture, classify, hlo_scope_map


def main():
    from bench import bench_setup
    render, params, env = bench_setup()
    reps = 6
    trace_file = capture(render, params, reps)
    scopes = hlo_scope_map(render, params)

    with gzip.open(trace_file) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_tids = {(e["pid"], e["args"]["name"] == "XLA Ops" and e["tid"])
               for e in ev if e.get("ph") == "M"
               and e.get("name") == "thread_name" and e["pid"] in dev_pids}
    op_tids = {(p, t) for p, t in op_tids if t is not False}

    ms = collections.Counter()
    by = collections.Counter()
    paths = {}
    for e in ev:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        name = e["name"]
        path = scopes.get(name) or scopes.get(name.split(".")[0], "")
        label = classify(path)
        # Exact-match against a comma-separated label set (substring
        # membership falsely kept any label that happened to be a
        # substring of the filter string — ADVICE r4).
        wanted = set((sys.argv[1] if len(sys.argv) > 1 else "other")
                     .split(","))
        if label not in wanted:
            continue
        ms[name] += e["dur"] / 1e3 / reps
        by[name] += int(e.get("args", {}).get("bytes_accessed", 0)) / 1e9 / reps
        paths[name] = path
    print(f"total {sum(ms.values()):.2f} ms, {sum(by.values()):.2f} GB")
    for n, v in ms.most_common(40):
        print(f"{v:7.3f} ms {by[n]:7.3f} GB  {n:<40} {paths.get(n, '')[:120]}")


if __name__ == "__main__":
    main()
