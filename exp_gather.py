"""Measure pack_records gather formulations at bench scale (harness).

A: jnp.stack (10,N) [status quo: 10 relayout whiles + concat] + strip gather
B: bitcast-stack (10, N/128, 128) [no relayout] + 2-index strip gather
C: pure build cost of each stack (no gather) to isolate gather deltas
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 10_000_000
CHUNK = 2048
NP_ = -(-N // CHUNK) * CHUNK
T, M = 1020, 384


def _force(o):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(o)[0])[-1])
    return o


def timeit(f, *a):
    o = _force(f(*a))
    ts = []
    for _ in range(4):
        t0 = time.time()
        outs = [f(*a) for _ in range(8)]
        _force(outs[-1])
        ts.append((time.time() - t0) / 8)
    return min(ts) * 1000, o


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    fields = [jax.random.normal(k, (N,)) for k in ks]
    idx = jnp.sort(jax.random.randint(jax.random.PRNGKey(1), (T, M), 0, N))
    fields = jax.block_until_ready(fields)

    @jax.jit
    def a_stack_gather(fs, ix):
        rec = jnp.stack(fs, axis=0)                     # (10, N)
        return rec[:, ix].transpose(1, 0, 2)            # (T, 10, M)

    @jax.jit
    def b_bitcast_gather(fs, ix):
        f3 = jnp.stack([jnp.pad(f, (0, NP_ - N)).reshape(NP_ // 128, 128)
                        for f in fs], axis=0)           # (10, G, 128)
        return f3[:, ix // 128, ix % 128].transpose(1, 0, 2)

    @jax.jit
    def a_stack_only(fs):
        return jnp.stack(fs, axis=0) * 1.0

    @jax.jit
    def b_stack_only(fs):
        return jnp.stack([jnp.pad(f, (0, NP_ - N)).reshape(NP_ // 128, 128)
                          for f in fs], axis=0) * 1.0

    for name, f, args in [("A stack+gather", a_stack_gather, (fields, idx)),
                          ("B bitcast+gather", b_bitcast_gather, (fields, idx)),
                          ("A stack only", a_stack_only, (fields,)),
                          ("B bitcast stack only", b_stack_only, (fields,))]:
        ms, o = timeit(f, *args)
        print(f"{name:>22}: {ms:7.2f} ms")

    oa = jax.jit(a_stack_gather)(fields, idx)
    ob = jax.jit(b_bitcast_gather)(fields, idx)
    print("A==B:", np.allclose(np.asarray(oa), np.asarray(ob)))


if __name__ == "__main__":
    main()
