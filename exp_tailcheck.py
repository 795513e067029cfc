"""Quick compiled check: tail kernel fwd vs XLA twin + bwd vs jax.grad of
the twin, on a small random workload (harness for kernel edits)."""
import numpy as np
import jax
import jax.numpy as jnp

from fourdgs.ops import tail_pallas as TP


def main():
    rng = np.random.default_rng(0)
    n, chunk, nx, ny, kb = 6000, 512, 12, 8, 4
    s_cy, s_cx = 2, 8
    npad = -(-n // chunk) * chunk
    tx0 = rng.integers(0, nx - 2, n).astype(np.int32)
    ty0 = rng.integers(0, ny - 2, n).astype(np.int32)
    tx1 = tx0 + rng.integers(0, 3, n).astype(np.int32)
    ty1 = ty0 + rng.integers(0, 3, n).astype(np.int32)
    tx1 = np.minimum(tx1, nx - 1)
    ty1 = np.minimum(ty1, ny - 1)
    alive = rng.random(n) > 0.1
    dbits = rng.integers(0, 1 << TP.QUANT_DEPTH_BITS, n).astype(np.int32)
    fields = rng.standard_normal((10, n)).astype(np.float32)
    fields[4:6] = np.abs(fields[4:6]) * 3 + 0.5      # il0, il1
    fields[9] = rng.random(n).astype(np.float32)     # a_eff
    cut = rng.integers(0, 1 << 20, nx * ny).astype(np.int32)
    params_row = jnp.asarray(
        [0.1, 0.01, -0.6, -0.1, -0.01, 0.6, 1e-4, 1e-4], jnp.float32)
    meta = TP.tail_meta(jnp.asarray(alive), jnp.asarray(tx0),
                        jnp.asarray(tx1), jnp.asarray(ty0),
                        jnp.asarray(ty1), jnp.asarray(dbits), chunk)
    band_cuts = TP.global_band_cuts(
        jnp.where(jnp.asarray(alive), jnp.asarray(dbits),
                  jnp.iinfo(jnp.int32).max), kb)
    band, rect = TP.step_bands_rects(meta, chunk, band_cuts, 0, 8)
    kw = dict(k_bands=kb, nx=nx, ny=ny, chunk=chunk, budget=8,
              s_cy=s_cy, s_cx=s_cx)

    fj = jnp.asarray(fields)
    f_pl = jax.jit(lambda f: TP.tail_accumulate(
        f, meta, band, rect, jnp.asarray(cut), params_row,
        interpret=False, **kw))
    f_xla = jax.jit(lambda f: TP.tail_accumulate_xla(
        f, meta, band, rect, jnp.asarray(cut), params_row, **kw))
    a, b = np.asarray(f_pl(fj)), np.asarray(f_xla(fj))
    scale = max(1e-6, np.abs(b).max())
    print("fwd maxdiff (rel):", np.abs(a - b).max() / scale)

    ct = jnp.asarray(rng.standard_normal(a.shape).astype(np.float32))
    g_pl = jax.jit(jax.grad(lambda f: jnp.vdot(TP.tail_accumulate(
        f, meta, band, rect, jnp.asarray(cut), params_row,
        interpret=False, **kw), ct)))(fj)
    g_x = jax.jit(jax.grad(lambda f: jnp.vdot(TP.tail_accumulate_xla(
        f, meta, band, rect, jnp.asarray(cut), params_row, **kw), ct)))(fj)
    g_pl, g_x = np.asarray(g_pl), np.asarray(g_x)
    gs = max(1e-6, np.abs(g_x).max())
    print("bwd maxdiff (rel):", np.abs(g_pl - g_x).max() / gs)


if __name__ == "__main__":
    main()
