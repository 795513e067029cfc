"""Price the candidate pair-sort restructures on the real chip.

The pair sort is the frame's dominant stage (kv-i32 ~124 ms at 40M slots,
only ~60% live). Candidate: semi-compaction — batched VMEM row sort pushes
dead slots to each row's tail, keep a static per-row column budget, then one
global kv sort over the ~live-sized remainder. Whether it wins hinges on the
batched kv row-sort price, so: measure, don't argue.

  rowsort.key    (B, L) single-array row sort
  rowsort.kv     (B, L) two-operand row sort
  global.kv      full-size global kv sort (the shipped baseline)
  compact.kv     row sort -> keep C cols -> global kv sort  (end to end)

Usage: python bench_sortplan.py [--slots 40000000] [--live-frac 0.5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _force(out):
    import jax
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[-1])
    jax.block_until_ready(out)
    return out


def timed(fn, *args, reps=5):
    t0 = time.time()
    out = _force(fn(*args))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [fn(*args) for _ in range(reps)]
        _force(outs[-1])
        best = min(best, (time.time() - t0) / reps)
    return out, best, compile_s


def emit(name, ms, compile_s, note=""):
    print(json.dumps({"case": name, "ms": round(ms * 1000, 2),
                      "compile_s": round(compile_s, 1), "note": note}))
    sys.stdout.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=40_000_000)
    ap.add_argument("--live-frac", type=float, default=0.5)
    ap.add_argument("--row-len", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    s = args.slots
    L = args.row_len
    B = -(-s // L)
    s_pad = B * L
    dead = jnp.iinfo(jnp.int32).max

    k0 = jax.random.PRNGKey(0)
    ka, kb = jax.random.split(k0)
    # Keys mimic the real distribution: (tile(11) | depth(20)) for live,
    # INT32_MAX for dead; liveness iid at live_frac.
    key = jax.random.randint(ka, (s_pad,), 0, (1020 << 20), dtype=jnp.int32)
    live = jax.random.uniform(kb, (s_pad,)) < args.live_frac
    key = jnp.where(live, key, dead)
    val = jnp.arange(s_pad, dtype=jnp.int32)
    key, val = _force((key, val))

    p = args.live_frac
    import math
    C = int(min(L, math.ceil(p * L + 6.0 * math.sqrt(p * (1 - p) * L))))
    C = -(-C // 128) * 128
    note_c = f"B={B} L={L} C={C} keep={B*C/1e6:.1f}M of {s_pad/1e6:.1f}M"

    f_glob = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1,
                                               is_stable=False))
    _, best, comp = timed(f_glob, key, val, reps=args.reps)
    emit("global.kv", best, comp)

    f_rk = jax.jit(lambda k: jax.lax.sort(k.reshape(B, L), dimension=1,
                                          is_stable=False))
    _, best, comp = timed(f_rk, key, reps=args.reps)
    emit("rowsort.key", best, comp)

    f_rkv = jax.jit(lambda k, v: jax.lax.sort(
        (k.reshape(B, L), v.reshape(B, L)), dimension=1, num_keys=1,
        is_stable=False))
    _, best, comp = timed(f_rkv, key, val, reps=args.reps)
    emit("rowsort.kv", best, comp)

    def f_compact(k, v):
        ks, vs = jax.lax.sort((k.reshape(B, L), v.reshape(B, L)),
                              dimension=1, num_keys=1, is_stable=False)
        kc = ks[:, :C].reshape(-1)
        vc = vs[:, :C].reshape(-1)
        dropped = jnp.sum(ks[:, C:] != dead)
        return jax.lax.sort((kc, vc), num_keys=1, is_stable=False) + (dropped,)
    (ks, vs, dropped), best, comp = timed(jax.jit(f_compact), key, val,
                                          reps=args.reps)
    emit("compact.kv", best, comp,
         note=note_c + f" dropped={int(dropped)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
