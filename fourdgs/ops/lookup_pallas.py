"""Pallas TPU kernel: per-pair tile-threshold lookup for depth pruning.

Applies `keep pair iff key <= cut[key >> 20]` over the full emitted pair-key
array (tens of millions of int32 (tile<<20 | depth) keys) against a small
per-tile cut-key table (num_tiles <= 2048). A random gather per pair is
hopeless in XLA on TPU (~25 ns/element measured round 2); here the table
sits in VMEM and the keys stream through on-chip — one read + one write of
the key array in HBM (measured 1.4 ms at 40.6M keys on v5e).

Lookup formulation: Mosaic supports dynamic gathers only when the index
array has the operand's shape (a per-lane shuffle within matching rows), so
the 2048-entry table is viewed as 16 rows x 128 lanes; the kernel does 16
same-shape `take_along_axis` shuffles (one per table row, broadcast over
the key block) and selects by the high table-row bits. 16 shuffles + masks
~ 50 VPU ops per key — far below the HBM bound.

Pruned slots become DEAD (INT32_MAX), exactly like never-emitted pairs, so
compaction and the pair sort treat them identically and the splat-index
array needs no touch (dead keys' values are never read downstream).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEAD = jnp.iinfo(jnp.int32).max
TABLE_MAX = 2048           # num_tiles bound (11-bit tile ids)
_ROWS = 256                # key rows (x128 lanes) per grid step


def _kernel(cut_ref, k_ref, o_ref):
    k = k_ref[...]                                    # (rows, 128)
    tile = (k >> 20).astype(jnp.int32)
    hi = tile >> 7                                    # table sublane row
    lo = tile & 127                                   # lane within row
    c = jnp.zeros_like(k)
    for h in range(TABLE_MAX // 128):
        op = jnp.broadcast_to(cut_ref[h:h + 1, :], k.shape)
        g = jnp.take_along_axis(op, lo, axis=1)
        c = jnp.where(hi == h, g, c)
    o_ref[...] = jnp.where(k <= c, k, DEAD)


def _sample_kernel(*refs, n_arr: int, take_rows: int):
    in_refs, out_refs = refs[:n_arr], refs[n_arr:]
    g = pl.program_id(0)
    for i in range(n_arr):
        out_refs[i][pl.ds(g * take_rows, take_rows), :] = \
            in_refs[i][0:take_rows, :]


def sample_blocks(arrs, stride_rows: int, take_rows: int = 2,
                  interpret: bool | None = None):
    """Evenly-spaced contiguous-block subsample of (N,) i32/f32 arrays:
    every stride_rows-th (128-lane) row window contributes its first
    take_rows rows. Returns a list of (nblocks * take_rows * 128,)
    samples (one per input, shared positions).

    Every XLA formulation of this pattern is latency-bound, not
    bandwidth-bound (measured at the 10M bench: vmapped dynamic-slice
    rows ~1 us per block — 0.7 ms for 586 blocks, 2.4 ms for 2332; the
    reshape-column-slice x.reshape(-1, 8192)[:, :128] 0.94 ms for
    0.6 MB). A pallas grid with a static strided index_map makes each
    block one PIPELINED input DMA: the same 2332-block sample costs
    ~0.05 ms, which is what makes SMALL sample blocks affordable — and
    small blocks are what bound the depth-prune cut estimator's
    locality variance (see render/tiles.depth_prune_cutkeys)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = arrs[0].shape[0]
    assert n % 128 == 0 and all(a.shape == (n,) for a in arrs)
    rows = n // 128
    # Input blocks are 8 sublanes (the TPU tile height); only take_rows
    # of each are kept, so the DMA over-reads 8/take_rows-fold — still
    # ~KB per block.
    in_rows = 8
    assert 1 <= take_rows <= in_rows
    nblocks = max(1, (rows - in_rows) // stride_rows + 1)
    views = [a.reshape(rows, 128) for a in arrs]
    kern = lambda *r: _sample_kernel(*r, n_arr=len(arrs),  # noqa: E731
                                     take_rows=take_rows)
    outs = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((in_rows, 128),
                               lambda g: (g * stride_rows // in_rows, 0))
                  ] * len(arrs),
        # Whole-output VMEM residency with per-step row stores (a
        # (take_rows, 128) output block would violate the 8-sublane
        # blocking rule).
        out_specs=[pl.BlockSpec((nblocks * take_rows, 128),
                                lambda g: (0, 0))] * len(arrs),
        out_shape=[jax.ShapeDtypeStruct((nblocks * take_rows, 128),
                                        a.dtype) for a in arrs],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*views)
    return [o.reshape(-1) for o in outs]


def apply_cutkeys(key: jax.Array, cut: jax.Array,
                  interpret: bool | None = None) -> jax.Array:
    """key (S,) int32, cut (T,) int32 (T <= 2048) -> pruned keys (S,):
    DEAD wherever key > cut[key >> 20]. S is processed in (256, 128)
    blocks; a ragged tail falls back to inline XLA (tiny). DEAD input keys
    stay DEAD (their tile bits select the DEAD-padded table tail)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t = cut.shape[0]
    assert t <= TABLE_MAX, t
    tbl = jnp.concatenate(
        [cut, jnp.full((TABLE_MAX - t,), DEAD, jnp.int32)]).reshape(
            TABLE_MAX // 128, 128)

    s = key.shape[0]
    blk = _ROWS * 128
    s_main = (s // blk) * blk
    if s_main == 0:
        # Tiny arrays (tests, small scenes): the XLA gather is fine.
        cut_t = cut[jnp.clip(key >> 20, 0, t - 1)]
        return jnp.where(key <= cut_t, key, DEAD)
    out_main = pl.pallas_call(
        _kernel,
        grid=(s_main // blk,),
        in_specs=[pl.BlockSpec((TABLE_MAX // 128, 128), lambda i: (0, 0)),
                  pl.BlockSpec((_ROWS, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((_ROWS, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((s_main // 128, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tbl, key[:s_main].reshape(-1, 128)).reshape(-1)
    if s_main == s:
        return out_main
    tail = key[s_main:]
    cut_tail = cut[jnp.clip(tail >> 20, 0, t - 1)]
    out_tail = jnp.where(tail <= cut_tail, tail, DEAD)
    return jnp.concatenate([out_main, out_tail])
