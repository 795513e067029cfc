"""Pallas TPU merge sort for (tile|depth, splat) pair arrays.

TPU-native replacement for the global `jax.lax.sort` over the compacted pair
array — the reference's GPU radix sort counterpart (radix_sort.hpp:278-389,
resources/radix_sort_*.comp.glsl). A radix sort is the wrong shape for a TPU
(its reorder phase is a giant random scatter; XLA scatter measured 7.7
ns/element on v5e — ARCHITECTURE.md row 20). What IS fast on a TPU is a
compare-exchange network over VMEM-resident blocks: the round-2 on-chip
measurement found a batched VMEM row sort ~15x cheaper per element than the
global fused `lax.sort`. This module finishes that design: the pair
compaction already leaves R rows each sorted; here we stitch them into one
globally sorted array with an alternating-direction bitonic merge tree:

  tree phase:  pallas levels merge adjacent runs fully VMEM-resident (a grid
               step loads both runs, executes every bitonic-merge stage
               on-chip, writes once). HBM traffic per level is exactly
               read-once + write-once.
  cross phase: runs too big for VMEM are merged with one tiny kernel per
               large compare-exchange distance: grid step g loads the two
               row-blocks at distance D (both D and the block size are
               power-of-two row counts, so every DMA is tile-aligned — no
               merge-path bookkeeping, no unaligned windows), does the
               elementwise compare-exchange, writes both back. Once the
               distance fits VMEM, a final per-level kernel finishes all
               remaining stages in one pass.

Directions alternate by run index (run m sorted ascending iff m is even), so
adjacent runs always form a bitonic sequence and NO data reversal is ever
needed across levels; the last level forces ascending. Mosaic has no `rev`
lowering anyway — the one place a reversal is required (turning the caller's
all-ascending rows into alternating rows at the first level) uses
`_flip_flat`, log2(n) block swaps built from the same reshape machinery.

Compare-exchange layout rules (the part that makes Mosaic happy):
  * stride d >= 128: reshape the flat run to (..., n/2d, 2, d) — leading-dim
    splits only, the 128-lane minor axis is untouched, so slicing the two
    halves is free.
  * stride d < 128: one transpose to (..., 128, n/128) turns lane-strides
    into sublane-strides (pairs never straddle a 128 boundary because 2d
    divides 128), the remaining stages slice along sublanes, one transpose
    back.

Keys are int32 (tile<<20 | quantized depth); dead slots are INT32_MAX and
sort to the tail. Values are int32 splat indices. Unstable, matching the
shipped `lax.sort(..., is_stable=False)` contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEAD = jnp.iinfo(jnp.int32).max

# Largest run (elements) merged fully VMEM-resident: two such runs plus
# stage temporaries stay within the raised scoped-VMEM budget.
TREE_MAX = 1 << 18          # 262,144
_MIN_ROWS = 8               # minimum sublane rows per pallas block
_VMEM_LIMIT = 100 * 1024 * 1024


def _merge_flat(k, v, n: int, desc, d0: int | None = None):
    """Bitonic merge of (B, n) batched bitonic sequences -> monotone in the
    per-row direction `desc` ((B*n/128, 1) bool, sublane layout from
    _desc_sublanes; False = ascending). n must be a power of two >= 256.
    Stages run from distance d0 (default n//2) down to 1.

    Roll formulation (measured 2.5x faster than reshape/stack/transpose on
    v5e): lay the batch out as (B*n/128, 128); a stage at distance d
    fetches both potential partners with two circular rolls (sublane rolls
    for d >= 128, lane rolls below) and selects per position. Rolled-in
    values that wrapped across run/batch boundaries are never selected:
    a position only consumes the partner on its in-block side, and 2d
    always divides the run length."""
    b = k.shape[0]
    s_per = n // 128
    s = b * s_per
    k = k.reshape(s, 128)
    v = v.reshape(s, 128)
    # desc arrives as an (S, 1) bool already in sublane layout (Mosaic
    # cannot reshape vectors across the lane dim, so callers build it from
    # a sublane iota — see _desc_sublanes).
    desc2 = desc
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s, 128), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (s, 128), 1)
    d = n // 2 if d0 is None else d0
    while d >= 128:
        dr = d // 128
        kd = pltpu.roll(k, s - dr, 0)    # value from sublane + dr
        vd = pltpu.roll(v, s - dr, 0)
        ku = pltpu.roll(k, dr, 0)        # value from sublane - dr
        vu = pltpu.roll(v, dr, 0)
        is_low = (iota_s // dr) % 2 == 0
        sel = ((is_low & (kd < k)) | (~is_low & (k < ku))) ^ desc2
        pk = jnp.where(is_low, kd, ku)
        pv = jnp.where(is_low, vd, vu)
        k = jnp.where(sel, pk, k)
        v = jnp.where(sel, pv, v)
        d //= 2
    while d >= 1:
        kd = pltpu.roll(k, 128 - d, 1)
        vd = pltpu.roll(v, 128 - d, 1)
        ku = pltpu.roll(k, d, 1)
        vu = pltpu.roll(v, d, 1)
        is_low = (iota_l // d) % 2 == 0
        sel = ((is_low & (kd < k)) | (~is_low & (k < ku))) ^ desc2
        pk = jnp.where(is_low, kd, ku)
        pv = jnp.where(is_low, vd, vu)
        k = jnp.where(sel, pk, k)
        v = jnp.where(sel, pv, v)
        d //= 2
    return k.reshape(b, n), v.reshape(b, n)


def _flip_flat(x, n: int):
    """Reverse each row of a (B, n) block, n a power of two >= 256.

    Mosaic has no lowering for `rev`; swapping adjacent d-blocks at every
    scale reverses the array in log2(n) stages using exactly the merge
    stages' reshape machinery."""
    b = x.shape[0]
    d = n // 2
    while d >= 128:
        x4 = x.reshape(b, n // (2 * d), 2, d)
        x = jnp.stack([x4[:, :, 1], x4[:, :, 0]], axis=2).reshape(b, n)
        d //= 2
    r = n // 128
    xt = x.reshape(b, r, 128).swapaxes(1, 2)          # (b, 128, r)
    while d >= 1:
        x4 = xt.reshape(b, 128 // (2 * d), 2, d, r)
        xt = jnp.stack([x4[:, :, 1], x4[:, :, 0]], axis=2).reshape(b, 128, r)
        d //= 2
    return xt.swapaxes(1, 2).reshape(b, n)


def _run_desc(run_idx, final_rows: int, run_out_rows: int):
    """Direction of output run `run_idx`: alternate by parity, but force
    ascending once runs reach the final size (run_out_rows == final_rows)."""
    if run_out_rows >= final_rows:
        return jnp.zeros_like(run_idx, dtype=jnp.bool_)
    return (run_idx % 2) == 1


def _desc_sublanes(first_run_idx, n: int, batch: int, final_rows: int,
                   run_out_rows: int):
    """(batch*n/128, 1) bool direction mask in sublane layout: batch row j
    (run index first_run_idx + j) spans n/128 consecutive sublanes."""
    s_per = n // 128
    s = batch * s_per
    iota = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    return _run_desc(first_run_idx + iota // s_per, final_rows,
                     run_out_rows)


def _tree_level_kernel(k_ref, v_ref, ok_ref, ov_ref, *, half: int,
                       pairs: int, final_rows: int, run_out_rows: int,
                       flip_second: bool):
    """Merge `pairs` adjacent run pairs of `half` elements each. Inputs
    alternate (ascending, descending) per pair — unless flip_second, which
    reverses the second run of each pair (first level, all-ascending
    input). Output run j of grid step i is ascending iff (i*pairs + j) is
    even (or unconditionally at the final level)."""
    n = 2 * half
    i = pl.program_id(0)
    k = k_ref[...].reshape(pairs, n)
    v = v_ref[...].reshape(pairs, n)
    if flip_second:
        ka, kb = k[:, :half], _flip_flat(k[:, half:], half)
        va, vb = v[:, :half], _flip_flat(v[:, half:], half)
        k = jnp.concatenate([ka, kb], axis=1)
        v = jnp.concatenate([va, vb], axis=1)
    desc = _desc_sublanes(i * pairs, n, pairs, final_rows, run_out_rows)
    k, v = _merge_flat(k, v, n, desc)
    ok_ref[...] = k.reshape(ok_ref.shape)
    ov_ref[...] = v.reshape(ov_ref.shape)


def _tree_level(k2d, v2d, rows_per_run: int, final_rows: int,
                flip_second: bool = False, interpret: bool = False):
    """One VMEM merge level over (R, C): runs of rows_per_run rows ->
    2*rows_per_run rows. R must be a multiple of the block row count."""
    r, c = k2d.shape
    pair_rows = 2 * rows_per_run
    pairs = max(1, _MIN_ROWS // pair_rows)
    blk_rows = pairs * pair_rows
    assert r % blk_rows == 0, (r, blk_rows)
    kern = functools.partial(_tree_level_kernel, half=rows_per_run * c,
                             pairs=pairs, final_rows=final_rows,
                             run_out_rows=pair_rows, flip_second=flip_second)
    spec = pl.BlockSpec((blk_rows, c), lambda i: (i, 0))
    out = pl.pallas_call(
        kern,
        grid=(r // blk_rows,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((r, c), jnp.int32)] * 2,
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(k2d, v2d)
    return out[0], out[1]


def _cross_stage_kernel(kown_ref, kpart_ref, vown_ref, vpart_ref,
                        ok_ref, ov_ref, *, d_blocks: int,
                        run_out_blocks: int, final_blocks: int):
    """One cross-block compare-exchange stage. Grid is (pairs, 2): step
    (g, s) owns the lo (s=0) or hi (s=1) block of pair g and writes ONLY its
    own block (each output block written exactly once — no aliasing, no
    cross-step hazards)."""
    g = pl.program_id(0)
    s = pl.program_id(1)
    lo_blk = (g // d_blocks) * (2 * d_blocks) + g % d_blocks
    run_idx = lo_blk // run_out_blocks
    # (1, 1) so it broadcasts (a scalar bool squeeze has no Mosaic lowering)
    desc = _run_desc(run_idx.reshape(1, 1), final_blocks, run_out_blocks)
    own_k = kown_ref[...]
    par_k = kpart_ref[...]
    # lo keeps the comparator minimum, hi the maximum: in both cases the
    # element moves iff the partner wins the own side's comparison.
    # (logical ops, not a select between i1 vectors — no Mosaic lowering.)
    is_lo = s == 0
    take = (((par_k < own_k) & is_lo) | ((own_k < par_k) & ~is_lo)) ^ desc
    ok_ref[...] = jnp.where(take, par_k, own_k)
    ov_ref[...] = jnp.where(take, vpart_ref[...], vown_ref[...])


def _cross_stage(k2d, v2d, blk_rows: int, d_rows: int, run_out_rows: int,
                 final_rows: int, interpret: bool = False):
    """Compare-exchange all row-block pairs at distance d_rows (>= blk_rows,
    both powers of two). Fully tile-aligned: block index maps are affine in
    the grid indices."""
    r, c = k2d.shape
    db = d_rows // blk_rows
    assert r % (2 * d_rows) == 0 and d_rows % blk_rows == 0

    def own_map(g, s):
        return ((g // db) * (2 * db) + g % db + s * db, 0)

    def par_map(g, s):
        return ((g // db) * (2 * db) + g % db + (1 - s) * db, 0)

    own = pl.BlockSpec((blk_rows, c), own_map)
    par = pl.BlockSpec((blk_rows, c), par_map)
    kern = functools.partial(_cross_stage_kernel, d_blocks=db,
                             run_out_blocks=run_out_rows // blk_rows,
                             final_blocks=final_rows // blk_rows)
    out = pl.pallas_call(
        kern,
        grid=(r // (2 * blk_rows), 2),
        in_specs=[own, par, own, par],
        out_specs=[own, own],
        out_shape=[jax.ShapeDtypeStruct((r, c), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(k2d, k2d, v2d, v2d)
    return out[0], out[1]


def _finish_level_kernel(k_ref, v_ref, ok_ref, ov_ref, *, n: int,
                         run_out_rows: int, blk_rows: int, final_rows: int):
    """Finish a cross level: all remaining stage distances of the 2L merge
    fit one VMEM block (d0 = n//2 elements downward)."""
    g = pl.program_id(0)
    run_idx = (g * blk_rows) // run_out_rows
    desc = _desc_sublanes(run_idx, n, 1, final_rows, run_out_rows)
    k = k_ref[...].reshape(1, n)
    v = v_ref[...].reshape(1, n)
    k, v = _merge_flat(k, v, n, desc)
    ok_ref[...] = k.reshape(ok_ref.shape)
    ov_ref[...] = v.reshape(ov_ref.shape)


def _finish_level(k2d, v2d, blk_rows: int, run_out_rows: int,
                  final_rows: int, interpret: bool = False):
    r, c = k2d.shape
    assert r % blk_rows == 0
    spec = pl.BlockSpec((blk_rows, c), lambda g: (g, 0))
    kern = functools.partial(_finish_level_kernel, n=blk_rows * c,
                             run_out_rows=run_out_rows, blk_rows=blk_rows,
                             final_rows=final_rows)
    out = pl.pallas_call(
        kern,
        grid=(r // blk_rows,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((r, c), jnp.int32)] * 2,
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(k2d, v2d)
    return out[0], out[1]


def _rowsort_kernel(k_ref, v_ref, *refs, row_len: int,
                    keep: int, cols: int, alternating: bool,
                    key_shift: int):
    """Full bitonic sort of `cols` independent logical rows, each laid out
    along the SUBLANE axis of a (row_len, cols) block (the strided
    column-major view of the flat pair array — no transpose needed, unlike
    the XLA `lax.sort(dimension=1)` formulation). Every compare-exchange
    stride is a sublane roll. Writes only the first `keep` positions of
    each sorted row (the compaction fused in).

    With a cut table (refs = [cut, ok, ov, live]) the per-tile depth-prune
    cut is applied to the keys BEFORE sorting (key > cut[key >> shift] ->
    DEAD) — fusing ops/lookup_pallas.apply_cutkeys' separate full
    read+write pass over the 40M-slot array into this kernel's existing
    read (~2.8 ms at the 10M bench). The extra `live` output row counts
    the block's post-cut live slots per lane so callers can account
    dropped pairs without re-reading anything."""
    if len(refs) == 4:
        cut_ref, ok_ref, ov_ref, live_ref = refs
    else:
        cut_ref, live_ref = None, None
        ok_ref, ov_ref = refs
    k = k_ref[...]
    v = v_ref[...]
    s = row_len
    if cut_ref is not None:
        # Per-128-lane groups: Mosaic lane shuffles (take_along_axis)
        # operate within 128-lane registers, so wider blocks look the
        # table up one lane-group at a time.
        groups = []
        for c0 in range(0, cols, 128):
            kg = k[:, c0:c0 + 128]
            tid = jnp.clip(kg >> key_shift, 0, 16 * 128 - 1)
            hi = tid >> 7
            lo = tid & 127
            cutv = jnp.zeros(kg.shape, jnp.int32)
            for h in range(16):
                rowb = jnp.broadcast_to(cut_ref[h:h + 1, :], kg.shape)
                got = jnp.take_along_axis(rowb, lo, axis=1)
                cutv = jnp.where(hi == h, got, cutv)
            groups.append(cutv)
        cutv = groups[0] if len(groups) == 1 else jnp.concatenate(
            groups, axis=1)
        k = jnp.where(k > cutv, DEAD, k)
        live_ref[...] = jnp.sum((k != DEAD).astype(jnp.int32), axis=0,
                                keepdims=True)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s, cols), 0)
    if alternating:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1) \
            + pl.program_id(0) * cols
        lane_desc = (lane % 2) == 1
    size = 2
    while size <= s:
        d = size // 2
        while d >= 1:
            kd = pltpu.roll(k, s - d, 0)
            vd = pltpu.roll(v, s - d, 0)
            ku = pltpu.roll(k, d, 0)
            vu = pltpu.roll(v, d, 0)
            is_low = (iota_s // d) % 2 == 0
            desc = ((iota_s // size) % 2) == 1
            if alternating:
                desc = desc ^ lane_desc
            sel = ((is_low & (kd < k)) | (~is_low & (k < ku))) ^ desc
            pk = jnp.where(is_low, kd, ku)
            pv = jnp.where(is_low, vd, vu)
            k = jnp.where(sel, pk, k)
            v = jnp.where(sel, pv, v)
            d //= 2
        size *= 2
    if alternating:
        # A descending row's live prefix sits at the TAIL; keep that end
        # (the reversed image of the ascending keep).
        ok_ref[...] = jnp.where(lane_desc, k[s - keep:], k[:keep])
        ov_ref[...] = jnp.where(lane_desc, v[s - keep:], v[:keep])
    else:
        ok_ref[...] = k[:keep]
        ov_ref[...] = v[:keep]


# Logical rows (lanes) per rowsort grid step: 256 amortizes the per-step
# dispatch/staging overhead over 2x the volume vs 128 (measured -1.4 ms
# at the 10M bench; 512 regresses - VMEM pressure on the (row_len, cols)
# kv block).
ROWSORT_COLS = 256


def rowsort_compact(key: jax.Array, val: jax.Array, keep_cols: int,
                    row_len: int = 8192, alternating: bool = False,
                    cut: jax.Array | None = None, key_shift: int = 20,
                    interpret: bool | None = None):
    """Pallas replacement for the XLA rowsort+keep of `compact_pairs`:
    sort `rows = ceil(S/row_len)` strided logical rows of the flat (S,) kv
    and keep each row's first keep_cols. Returns ((keep, rows) key,
    (keep, rows) val, dropped) — note the TRANSPOSED layout (logical rows
    on lanes); callers flatten in any order for a subsequent global sort,
    or transpose for the merge tree. row_len must be a power of two.

    alternating: row r (lane index) sorted descending for odd r.
    cut: optional (T,) i32 per-tile prune cut keys, applied IN-KERNEL
    before sorting (see _rowsort_kernel); `dropped` then counts live
    pairs lost to the keep cap among the post-cut live set.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert row_len & (row_len - 1) == 0
    s = key.shape[0]
    rows = -(-s // row_len)
    rows = -(-rows // ROWSORT_COLS) * ROWSORT_COLS
    pad = rows * row_len - s
    if pad:
        key = jnp.concatenate([key, jnp.full((pad,), DEAD, key.dtype)])
        val = jnp.concatenate([val, jnp.zeros((pad,), val.dtype)])
    k2 = key.reshape(row_len, rows)
    v2 = val.reshape(row_len, rows)
    kern = functools.partial(_rowsort_kernel, row_len=row_len,
                             keep=keep_cols, cols=ROWSORT_COLS,
                             alternating=alternating, key_shift=key_shift)
    in_spec = pl.BlockSpec((row_len, ROWSORT_COLS), lambda i: (0, i))
    out_spec = pl.BlockSpec((keep_cols, ROWSORT_COLS), lambda i: (0, i))
    if cut is not None:
        tbl = jnp.concatenate(
            [cut.astype(jnp.int32),
             jnp.full((16 * 128 - cut.shape[0],), DEAD,
                      jnp.int32)]).reshape(16, 128)
        ok, ov, live_in = pl.pallas_call(
            kern,
            grid=(rows // ROWSORT_COLS,),
            in_specs=[in_spec, in_spec,
                      pl.BlockSpec((16, 128), lambda i: (0, 0))],
            out_specs=[out_spec, out_spec,
                       pl.BlockSpec((1, ROWSORT_COLS), lambda i: (0, i))],
            out_shape=[jax.ShapeDtypeStruct((keep_cols, rows), jnp.int32),
                       jax.ShapeDtypeStruct((keep_cols, rows), jnp.int32),
                       jax.ShapeDtypeStruct((1, rows), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(k2, v2, tbl)
        dropped = (jnp.sum(live_in)
                   - jnp.sum((ok != DEAD).astype(jnp.int32)))
        return ok, ov, dropped
    ok, ov = pl.pallas_call(
        kern,
        grid=(rows // ROWSORT_COLS,),
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((keep_cols, rows), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(k2, v2)
    # Live pairs lost to the keep cap, never silent: total live minus kept
    # live (two cheap reductions).
    dropped = (jnp.sum((key != DEAD).astype(jnp.int32))
               - jnp.sum((ok != DEAD).astype(jnp.int32)))
    return ok, ov, dropped


def _pad_rows(x, rows: int, fill):
    r, c = x.shape
    if r == rows:
        return x
    return jnp.concatenate(
        [x, jnp.full((rows - r, c), fill, x.dtype)], axis=0)


def merge_sorted_rows(k2d: jax.Array, v2d: jax.Array,
                      rows_alternating: bool = False,
                      interpret: bool = False):
    """(R, C) int32 kv, every row sorted -> flat globally sorted
    (ascending) kv of length R_padded * C. C must be a power of two >= 256;
    R is padded to tree_rows * 2^k with DEAD rows (callers wanting zero
    padding size R as a power-of-two multiple of TREE_MAX // C).

    rows_alternating: rows come pre-sorted in alternating directions (row r
    ascending iff r even) — saves the in-kernel reversal of every odd row
    at the first level; producers doing an XLA row sort get the alternation
    nearly free (`ks.at[1::2].set(ks[1::2, ::-1])`).
    """
    r, c = k2d.shape
    assert c >= 256 and (c & (c - 1)) == 0, f"C must be pow2 >= 256, got {c}"
    tree_rows = max(_MIN_ROWS, TREE_MAX // c)   # rows per run at tree top
    n_runs = -(-r // tree_rows)
    n_runs_p2 = 1 << max(0, (n_runs - 1).bit_length())
    rows = tree_rows * n_runs_p2
    k2d = _pad_rows(k2d, rows, DEAD)
    v2d = _pad_rows(v2d, rows, 0)

    # VMEM tree: 1-row runs -> tree_rows-row runs.
    rpr = 1
    while rpr < tree_rows:
        k2d, v2d = _tree_level(k2d, v2d, rpr, final_rows=rows,
                               flip_second=(rpr == 1 and not rows_alternating),
                               interpret=interpret)
        rpr *= 2

    # Cross phase: runs tree_rows -> rows. Per level (2L-merge): one aligned
    # compare-exchange kernel per stage distance down to 2*tree_rows (after
    # the distance-d stage, elements only interact within d-row blocks),
    # then one finishing VMEM pass over 2*tree_rows-row blocks runs every
    # remaining stage on-chip.
    fin_rows = 2 * tree_rows
    while rpr < rows:
        d = rpr
        while d >= fin_rows:
            k2d, v2d = _cross_stage(k2d, v2d, tree_rows, d,
                                    run_out_rows=2 * rpr, final_rows=rows,
                                    interpret=interpret)
            d //= 2
        k2d, v2d = _finish_level(k2d, v2d, fin_rows, run_out_rows=2 * rpr,
                                 final_rows=rows, interpret=interpret)
        rpr *= 2
    return k2d.reshape(-1), v2d.reshape(-1)
