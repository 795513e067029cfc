"""Pallas TPU kernel: streaming banded-OIT tail compositor.

Closes the last correctness gap vs the reference (it blends EVERY fragment
of every splat back-to-front with no depth cap — Splat4DFragShader.GLSL:22-31
+ painter's blend, Application.cpp:150-154): at the 10M bench, 16.5M of the
16.6M live (tile, splat) pairs lie beyond any affordable exact per-tile
depth cap, and nothing saturates (after 512 pairs, >99% of cube pixels are
still translucent). Compositing them exactly needs a global pair sort
(~50 ms) plus per-pair record gathers (~20-25 ns per random index = ~350 ms
at 16.5M pairs) — both measured dead ends on TPU.

This kernel instead processes the tail with ZERO sorting and ZERO gathers:

  * Pairs stream in EMISSION order — contiguous chunks of per-splat field
    arrays, each chunk re-walking its bbox slots in-kernel. Splats are
    expected in Morton (3D Z-order) of position, a one-time scene-build
    reorder (analogous to the reference's one-time init() work), which
    gives every chunk screen-tile locality for ANY camera.
  * Ordering is approximated by DEPTH BANDS: each chunk is assigned one of
    K global depth bands (by its mean quantized depth — Morton-local chunks
    are depth-tight). Band-vs-band compositing is ordered; within a band,
    accumulation is order-independent (weighted OIT). Per band x tile x
    coarse-sample the kernel accumulates 6 planes:
        A = sum(alpha), Ar/Ag/Ab = sum(alpha * rgb), A2 = sum(alpha^2),
        L = sum(log1p(-alpha))
    exp(L) is the EXACT product of (1 - alpha) over the band's pairs
    (products commute), so total transmittance is order-exact up to the
    log1p/exp roundtrip; only within-band COLOR mixing is approximate
    ((Ar..)/A weighting). The alpha channel uses A2/A to match the head
    kernel's sum(alpha^2 T) semantics.
  * Evaluation is at COARSE samples — one per (by x bx)-pixel block
    (RenderConfig.tail_block; the shipped bench uses 16x16 — halving the
    sample count vs 8x16 costs no measurable parity error, see the
    tail_block note in bench.py), with the
    splat's footprint analytically widened by the block's box-filter
    variance at preserved mass (no aliasing for any splat size; the tail
    field is then bilinearly upsampled and blended under the head's
    per-pixel transmittance).
  * The scatter onto (band, tile) targets is a one-hot MXU matmul into a
    VMEM-resident accumulator (the whole (K x tiles x planes x samples)
    accumulator fits VMEM), flushed as two aligned sublane-slice updates
    per 2-tile-column x 16-tile-row window.

The head (nearest pairs, key <= per-tile cut) stays bit-exact at full
resolution through the existing sorted pipeline; this kernel takes the
exact complement (key > cut), so no pair is ever dropped:
resid_transmittance reports 0 truncation and the remaining approximation
(banding + coarse sampling) is quantified by the mid-scale parity gate in
validate_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fourdgs.render.tiles import QUANT_DEPTH_BITS

ALPHA_MAX = 1.0 - 1e-6
_QSCALE = float(np.sqrt(32.0))    # folds exp(-0.5 * 64 * q) into the prescale
N_PLANES = 6                      # A, Ar, Ag, Ab, A2, L
_P_A, _P_AR, _P_AG, _P_AB, _P_A2, _P_L = range(N_PLANES)

WIN_TX = 2                        # window: 2 tile columns x 16 tile rows
WIN_TY = 16

CUT_ROWS = 16                     # (16, 128) VMEM cut-key table (2048 tiles)

_VMEM_LIMIT = 110 * 1024 * 1024


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def tail_meta(alive, tx0, tx1, ty0, ty1, dbits, chunk: int,
              return_rows: bool = False):
    """(6, Np) int32 meta operand: [tx0, tx1, ty0, ty1, dbits, raw span
    (0 for dead splats)]. The budget window — which spans a stream owns
    (main: span <= budget; big: budget < span <= big budget) — is applied
    IN-KERNEL via tail_accumulate's (budget_lo, budget] statics, so one
    meta array serves both streams (and the big-tier gather). Arrays are
    padded to a `chunk` multiple with dead entries.

    return_rows=True additionally returns the PADDED raw row tuple for
    the fused tail_prepass kernel (sharing the pad work)."""
    from fourdgs.ops.pack_pallas import pack_rows
    n = tx0.shape[0]
    span = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
    span = jnp.where(alive, span, 0)
    rows = [r.astype(jnp.int32) for r in (tx0, tx1, ty0, ty1, dbits, span)]
    npad = _ceil_to(n, chunk)
    if npad != n:
        rows = [jnp.pad(r, (0, npad - n)) for r in rows]
    if npad % 1024 == 0:
        # Repack kernel: avoids 6 XLA relayout loops (~3 ms at the 10M
        # bench) — see ops/pack_pallas.py. Padded tail columns are dead
        # (span 0).
        meta = pack_rows(rows, npad)
    else:
        meta = jnp.stack(rows)
    if return_rows:
        return meta, tuple(rows)
    return meta


def step_bands_rects(meta, chunk: int, band_cuts, budget_lo: int = 0,
                     budget_hi: int = 1 << 30):
    """Per-step (chunk of `chunk` splats) banding + tile rects, XLA prepass.

    Returns (band (S,), rect (S, 4) = [txw, tyw, nwx, nwy]) where the
    window grid is (txw + 2*i, tyw + 16*j), tyw 8-aligned, covering every
    live tile of the step. (budget_lo, budget_hi] selects the stream's
    span window (must match the kernel call)."""
    tx0, tx1, ty0, ty1, dbits, span = [m.reshape(-1, chunk) for m in meta]
    live = (span > budget_lo) & (span <= budget_hi)
    big = jnp.int32(np.iinfo(np.int32).max)
    mtx0 = jnp.min(jnp.where(live, tx0, big), axis=1)
    mty0 = jnp.min(jnp.where(live, ty0, big), axis=1)
    mtx1 = jnp.max(jnp.where(live, tx1, -1), axis=1)
    mty1 = jnp.max(jnp.where(live, ty1, -1), axis=1)
    any_live = jnp.any(live, axis=1)
    mtx0 = jnp.where(any_live, mtx0, 0)
    mty0 = jnp.where(any_live, mty0, 0)
    mtx1 = jnp.where(any_live, mtx1, 0)
    mty1 = jnp.where(any_live, mty1, 0)
    txw = mtx0
    tyw = (mty0 // 8) * 8
    nwx = (mtx1 - txw) // WIN_TX + 1
    nwy = (mty1 - tyw) // WIN_TY + 1
    # Mean live depth -> global band index (searchsorted over K-1 cuts).
    d_sum = jnp.sum(jnp.where(live, dbits, 0), axis=1)
    d_cnt = jnp.maximum(jnp.sum(live, axis=1), 1)
    d_mean = d_sum // d_cnt
    # band_cuts are quantiles of NEGATED dbits (ascending = near-to-far);
    # query with the negated mean so band 0 is the nearest band. A
    # compare-sum over the K-1 cuts replaces jnp.searchsorted (which
    # lowers to a serial while on TPU).
    band = jnp.sum((-d_mean)[:, None] >= band_cuts[None, :],
                   axis=1).astype(jnp.int32)
    rect = jnp.stack([txw, tyw, nwx, nwy], axis=1).astype(jnp.int32)
    return band, rect


def step_slot_masks(meta, chunk: int, budget: int, budget_lo: int = 0,
                    sub: int = 512):
    """Per-step (slot, sub-block) liveness bitmask for in-kernel skipping.

    Bit (s * nsub + j) of mask[step] is set iff ANY pair of the step's
    j-th `sub`-wide block has span > max(s, budget_lo) (and span <=
    budget) — a SUPERSET of the kernel's live condition (which further
    gates on the cut table and the rect walk), so a zero bit proves the
    (slot, sub-block) pass contributes nothing and the kernel skips its
    evaluation (and, when a whole slot's bits are zero, the window
    matmuls too). At the 10M bench ~30% of slot passes are provably dead
    this way (span histogram: 42% span-1, 54% span-2, 4% span-4 — the
    uniform budget walks every slot regardless).
    """
    span = meta[5]
    nsub = max(1, chunk // sub)
    sp = jnp.where((span > budget_lo) & (span <= budget), span, 0)
    m = jnp.max(sp.reshape(-1, nsub, min(sub, chunk)), axis=2)  # (S, nsub)
    mask = jnp.zeros((m.shape[0],), jnp.int32)
    for s in range(budget):
        if (s + 1) * nsub > 30:
            break   # slots past the 30-bit budget stay always-live
        bits = (m > max(s, budget_lo)).astype(jnp.int32)        # (S, nsub)
        for j in range(nsub):
            mask = mask | (bits[:, j] << (s * nsub + j))
    return mask


def _prepass_kernel(cuts_ref, *row_refs, chunk: int, budget: int,
                    budget_lo: int, k_bands: int, nsub: int, sub: int):
    """One grid step = one tail chunk: compute the step's window rect,
    depth band and slot/sub-block liveness mask in a single read of the
    raw meta rows (the XLA formulation re-read the packed meta matrix
    once per reduction — ~3.5 ms/frame of slice+reduce fusions plus a
    relayout `while` per row extraction at the 10M bench)."""
    out_ref = row_refs[-1]
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    tx0 = row_refs[0][...].reshape(1, chunk)
    tx1 = row_refs[1][...].reshape(1, chunk)
    ty0 = row_refs[2][...].reshape(1, chunk)
    ty1 = row_refs[3][...].reshape(1, chunk)
    dbits = row_refs[4][...].reshape(1, chunk)
    span = row_refs[5][...].reshape(1, chunk)
    big = jnp.int32(np.iinfo(np.int32).max)

    live = (span > budget_lo) & (span <= budget)
    any_live = jnp.max(live.astype(jnp.int32)) > 0
    mtx0 = jnp.min(jnp.where(live, tx0, big))
    mty0 = jnp.min(jnp.where(live, ty0, big))
    mtx1 = jnp.max(jnp.where(live, tx1, -1))
    mty1 = jnp.max(jnp.where(live, ty1, -1))
    zero = jnp.int32(0)
    mtx0 = jnp.where(any_live, mtx0, zero)
    mty0 = jnp.where(any_live, mty0, zero)
    mtx1 = jnp.where(any_live, mtx1, zero)
    mty1 = jnp.where(any_live, mty1, zero)
    txw = mtx0
    tyw = (mty0 // 8) * 8
    nwx = (mtx1 - txw) // WIN_TX + 1
    nwy = (mty1 - tyw) // WIN_TY + 1

    d_sum = jnp.sum(jnp.where(live, dbits, 0))
    d_cnt = jnp.maximum(jnp.sum(live.astype(jnp.int32)), 1)
    d_mean = d_sum // d_cnt
    cuts = cuts_ref[0:1, :]                                  # (1, 128)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    band = jnp.sum(jnp.where(kiota < k_bands - 1,
                             ((-d_mean) >= cuts).astype(jnp.int32), 0))

    # Per-(slot, sub-block) liveness bits (see step_slot_masks).
    spw = jnp.where(live, span, 0).reshape(nsub, sub)
    msub = jnp.max(spw, axis=1, keepdims=True)               # (nsub, 1)
    mask = jnp.int32(0)
    for s in range(budget):
        if (s + 1) * nsub > 30:
            break
        thresh = max(s, budget_lo)
        for j in range(nsub):
            bit = (msub[j, 0] > thresh).astype(jnp.int32)
            mask = mask | (bit << (s * nsub + j))

    def put(col, val):
        out_ref[pl.ds(g, 1), col:col + 1] = val.reshape(1, 1)
    put(0, band)
    put(1, txw)
    put(2, tyw)
    put(3, nwx)
    put(4, nwy)
    put(5, mask)


def tail_prepass(rows, band_cuts, chunk: int, budget: int,
                 budget_lo: int = 0, k_bands: int = 8,
                 interpret: bool | None = None):
    """Fused per-step prepass over the RAW padded meta rows: returns
    (band (S,), rect (S, 4), slot_mask (S,)) in one pass over the rows —
    replaces step_bands_rects + step_slot_masks on the hot path. `rows`
    is the 6-tuple of (Np,) i32 arrays [tx0, tx1, ty0, ty1, dbits, span]
    (Np a multiple of chunk); band_cuts (K-1,) as from global_band_cuts.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    npts = rows[0].shape[0]
    steps = npts // chunk
    assert steps * chunk == npts, (npts, chunk)
    sub = min(512, chunk)
    nsub = chunk // sub
    cuts_pad = jnp.zeros((1, 128), jnp.int32).at[0, :band_cuts.shape[0]].set(
        band_cuts.astype(jnp.int32))
    views = tuple(r.reshape(npts // 128, 128) for r in rows)
    kern = functools.partial(_prepass_kernel, chunk=chunk, budget=budget,
                             budget_lo=budget_lo, k_bands=k_bands,
                             nsub=nsub, sub=sub)
    out = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[pl.BlockSpec((1, 128), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((chunk // 128, 128), lambda g: (g, 0),
                        memory_space=pltpu.VMEM)] * 6,
        # The whole (steps, 128) stat table stays VMEM-resident across
        # grid steps (a (1, 128) per-step output block would violate the
        # 8-sublane blocking rule); each step row-stores its 6 stats.
        out_specs=pl.BlockSpec((steps, 128), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(cuts_pad, *views)
    band = out[:, 0]
    rect = out[:, 1:5]
    mask = out[:, 5]
    return band, rect, mask


def band_weight_coeffs(band_cuts, d_lo, d_hi, k_bands: int, beta: float):
    """Per-band affine exponent coefficients for the within-band depth
    weighting: pair weight w_d = exp(clip(a[band] * dbits + b[band], 0,
    _WD_CAP)), rising from 1 at the band's FAR edge to e^beta at its NEAR
    edge. Within a band the OIT color mix becomes a depth-biased weighted
    mean — near (occluding) pairs dominate, which is the exact-composite
    behavior the plain mean loses on opaque-core splats (VERDICT r4
    missing #2). beta=0 disables (w_d == 1 exactly).

    band_cuts are the ascending NEGATED-dbit quantiles from
    global_band_cuts; d_lo/d_hi are live-dbit extremes (see
    global_band_extremes). Returns (K, 2) f32 [a, b] rows."""
    lo_edges = jnp.concatenate(
        [-band_cuts, jnp.asarray([d_lo], band_cuts.dtype)])     # (K,) far
    hi_edges = jnp.concatenate(
        [jnp.asarray([d_hi], band_cuts.dtype), -band_cuts])     # (K,) near
    lo = jnp.minimum(lo_edges, hi_edges).astype(jnp.float32)
    hi = jnp.maximum(lo_edges, hi_edges).astype(jnp.float32)
    a = beta / jnp.maximum(hi - lo, 1.0)
    b = -a * lo
    return jnp.stack([a, b], axis=1)                            # (K, 2)


_WD_CAP = 25.0   # exponent clip: w_d <= e^25 ~ 7e10 (f32/bf16-safe sums)


def global_band_extremes(sample_keys):
    """(d_lo, d_hi) live-dbit extremes of a key sample (dead = int32 max),
    for band_weight_coeffs' open-ended first/last bands."""
    dead = jnp.iinfo(jnp.int32).max
    d = sample_keys & ((1 << QUANT_DEPTH_BITS) - 1)
    live = sample_keys != dead
    d_lo = jnp.min(jnp.where(live, d, (1 << QUANT_DEPTH_BITS) - 1))
    d_hi = jnp.max(jnp.where(live, d, 0))
    return d_lo, d_hi


def global_band_cuts(sample_keys, k_bands: int):
    """(K-1,) ascending dbit cuts = depth quantiles of a live key sample.
    Smaller dbits = farther (dbits are bits of 1/depth), but band ORDER
    must be front-to-back: band 0 = nearest = LARGEST dbits. We therefore
    cut on NEGATED dbits; callers band with searchsorted over these."""
    dead = jnp.iinfo(jnp.int32).max
    d = jnp.where(sample_keys == dead, jnp.int32(-(1 << 20)),
                  -(sample_keys & ((1 << QUANT_DEPTH_BITS) - 1)))
    ds = jax.lax.sort(d, is_stable=False)       # ascending -d = near first
    m = jnp.sum(ds > jnp.int32(-(1 << 20)))     # live count (at the top)
    start = ds.shape[0] - m
    qs = start + (jnp.arange(1, k_bands, dtype=jnp.int32)
                  * m) // k_bands
    return ds[jnp.minimum(qs, ds.shape[0] - 1)]


def tail_params_row(tile_h: int, tile_w: int, block, w: int, h: int,
                    p00, p11, ty_base: int = 0):
    """(8,) f32 kernel constants: affine sample coords in k units +
    box-filter variances. `block` = (by, bx) coarse pixel block;
    `ty_base` offsets band-relative tile rows (tile-row banding)."""
    by, bx = block
    kx_t = (tile_w * 2.0 / w) / p00
    kx_j = (bx * 2.0 / w) / p00
    kx_0 = ((bx * 0.5) * 2.0 / w - 1.0) / p00
    ky_t = -(tile_h * 2.0 / h) / p11
    ky_j = -(by * 2.0 / h) / p11
    ky_0 = (1.0 - (ty_base * tile_h + by * 0.5) * 2.0 / h) / p11
    bx2 = (bx * 2.0 / w / p00) ** 2 / 12.0
    by2 = (by * 2.0 / h / p11) ** 2 / 12.0
    return jnp.stack([kx_t, kx_j, kx_0, ky_t, ky_j, ky_0, bx2,
                      by2]).astype(jnp.float32)


def combine_bands(acc):
    """Fold per-band OIT sums into a front-to-back composite.

    acc (T, K, N_PLANES, S) -> (rgb (T, 3, S), alpha (T, S), trans (T, S)).
    Per band k: tau_k = exp(L_k) is the EXACT product of (1 - alpha) over
    the band's pairs; the band's emitted color is the alpha-weighted mean
    (Ar..)/A scaled by its absorbed fraction (1 - tau_k); the alpha channel
    uses A2/A matching the head kernel's sum(alpha^2 T) semantics. Bands
    composite in order under the exclusive running transmittance."""
    # AD-safe empty-band handling: 0/eps is fine forward but its VJP is
    # inf * 0 = NaN; divide by a where-guarded denominator and zero the
    # result through the mask instead.
    has = acc[:, :, _P_A] > 0.0                          # (T, K, S)
    a_safe = jnp.where(has, acc[:, :, _P_A], 1.0)
    tau = jnp.exp(acc[:, :, _P_L])
    w = 1.0 - tau
    t_run = jnp.cumprod(tau, axis=1)
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_run[:, :1]), t_run[:, :-1]], axis=1)
    wgt = jnp.where(has, t_excl * w / a_safe, 0.0)        # (T, K, S)
    rgb = jnp.einsum("tks,tcks->tcs", wgt,
                     acc[:, :, _P_AR:_P_AB + 1].transpose(0, 2, 1, 3))
    alpha = jnp.sum(wgt * acc[:, :, _P_A2], axis=1)
    return rgb, alpha, t_run[:, -1]


def fold_upsample_tail(acc, k_bands: int, nx: int, ny: int, tile_h: int,
                       tile_w: int, s_cy: int, s_cx: int, dtype):
    """Fold the (rows, cols) band accumulator into a full-resolution tail
    field: returns (ny*nx, 5, tile_h*tile_w) [r, g, b, a, trans].

    The bilinear upsample runs on the GLOBAL coarse image (not per tile),
    so the tail field is smooth across tile borders — shared by the
    single-chip pipeline and the distributed converged path (which psums
    the additive accumulator first; VERDICT r4 weak #4: the per-tile
    upsample left seams at tile borders)."""
    n_samp = s_cy * s_cx
    ny_pad = _ceil_to(ny + WIN_TY, 8)
    acc_r = acc.reshape(k_bands, nx, ny_pad, N_PLANES, n_samp)[:, :, :ny]
    acc_t = acc_r.transpose(2, 1, 0, 3, 4).reshape(
        ny * nx, k_bands, N_PLANES, n_samp)
    rgb_c, alpha_c, trans_c = combine_bands(acc_t)
    coarse = jnp.concatenate(
        [rgb_c, alpha_c[:, None], trans_c[:, None]], axis=1)     # (T, 5, S)
    img_c = coarse.reshape(ny, nx, 5, s_cy, s_cx).transpose(
        2, 0, 3, 1, 4).reshape(5, ny * s_cy, nx * s_cx)
    up = jax.image.resize(
        img_c, (5, ny * tile_h, nx * tile_w), method="bilinear")
    return up.reshape(5, ny, tile_h, nx, tile_w).transpose(
        1, 3, 0, 2, 4).reshape(ny * nx, 5, tile_h * tile_w).astype(dtype)


def blend_tail_under_head(carry, upt):
    """Blend an upsampled tail field under the head carry's per-pixel
    transmittance: carry (T, >=5, P) [r,g,b,a,trans,...], upt (T, 5, P).
    Returns (T, 5, P) updated [r, g, b, a, trans]."""
    t_head = carry[:, 4:5, :]
    return jnp.concatenate([
        carry[:, 0:3, :] + t_head * upt[:, 0:3, :],
        carry[:, 3:4, :] + t_head * upt[:, 3:4, :],
        t_head * upt[:, 4:5, :]], axis=1)


def _tail_kernel(band_ref, txw_ref, tyw_ref, nwx_ref, nwy_ref, mask_ref,
                 wa_ref, wb_ref, params_ref,
                 cut_ref, fields_ref, meta_ref, acc_ref, planes_ref,
                 ltx_ref, wd_ref, *, chunk: int, budget: int,
                 budget_lo: int, nx: int, ny_pad: int, s_cy: int, s_cx: int,
                 rows_per_band: int, use_wd: bool, alpha_pow: int,
                 exact_clip: bool):
    """One grid step = one chunk of `chunk` splats.

    band/txw/tyw/nwx/nwy/mask/wa/wb refs: (S,) i32 scalar-prefetch (1-D
    each — a 2-D (S, 4) rect array would be lane-padded to 128 in SMEM and
    overflow at bench scale); mask = per-(slot, sub-block) liveness bits
    (step_slot_masks) — zero bits skip the corresponding eval/matmul
    passes; wa/wb = bitcast-f32 per-step depth-weight coefficients
    (band_weight_coeffs; used only when use_wd);
    params_ref (8, 128) f32 broadcast constants; cut_ref (16, 128) i32;
    fields_ref (10, chunk) f32 [sx, sy, v0x, v0y, il0, il1, r, g, b, a_eff];
    meta_ref (6, chunk) i32; acc_ref (K*rows_per_band, n_samp*6) f32 out.
    """
    g = pl.program_id(0)
    n_samp = s_cy * s_cx

    @pl.when(g == 0)
    def _init():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    band = band_ref[g]
    txw0 = txw_ref[g]
    tyw0 = tyw_ref[g]
    nwx = nwx_ref[g]
    nwy = nwy_ref[g]
    mask = mask_ref[g]

    if use_wd:
        # Per-pair within-band depth weight, once per chunk (pair space —
        # never per sample): w_d = exp(clip(a * dbits + b, 0, cap)).
        # Mosaic's bitcast needs vectors, not scalars — broadcast first.
        a_w = jax.lax.bitcast_convert_type(
            jnp.full((1, 1), wa_ref[g], jnp.int32), jnp.float32)
        b_w = jax.lax.bitcast_convert_type(
            jnp.full((1, 1), wb_ref[g], jnp.int32), jnp.float32)
        dbf = meta_ref[4:5, :].astype(jnp.float32)
        wd_ref[...] = jnp.exp(jnp.clip(a_w * dbf + b_w, 0.0, _WD_CAP))

    # Broadcast scalars: row 0 = [kx_t, kx_j, kx_0, ky_t, ky_j, ky_0,
    # bx2, by2] (sample coords in k units are affine in tile/sample index;
    # bx2/by2 = box-filter variances of the coarse block in k units^2).
    kx_t = params_ref[0, 0]
    kx_j = params_ref[0, 1]
    kx_0 = params_ref[0, 2]
    ky_t = params_ref[0, 3]
    ky_j = params_ref[0, 4]
    ky_0 = params_ref[0, 5]
    bx2 = params_ref[0, 6]
    by2 = params_ref[0, 7]

    # Sample-grid offsets (n_samp, 1): sample s = (jy, jx).
    jy = jax.lax.broadcasted_iota(jnp.int32, (n_samp, 1), 0) // s_cx
    jx = jax.lax.broadcasted_iota(jnp.int32, (n_samp, 1), 0) % s_cx
    kx_off = kx_j * jx.astype(jnp.float32) + kx_0        # (n_samp, 1)
    ky_off = ky_j * jy.astype(jnp.float32) + ky_0
    rows_iota = jax.lax.broadcasted_iota(
        jnp.int32, (WIN_TX * WIN_TY, 1), 0)

    # Everything is evaluated in pair SUB-blocks of the chunk: a
    # full-chunk (n_samp, C) temporary is ~C/16 vregs per value — far
    # past the register file, so every elementwise op would stream
    # through VMEM (measured: the v1 kernel was VMEM-bound at 83 ms).
    # All loads below are STATIC lane slices of the refs, so sub-block
    # values carry standard layouts and stay in registers.
    SUB = min(512, chunk)
    nsub = chunk // SUB

    def do_slot(s, mask_s):
        # Full-chunk per-pair tile/liveness (pair-space (1, chunk) values
        # are small) — drives the per-slot window passes below. The
        # sample-space eval runs in SUB-blocks into the planes scratch:
        # a full-chunk (n_samp, chunk) temporary is ~chunk/16 vregs per
        # value, far past the register file (measured VMEM-bound).
        mtx0 = meta_ref[0:1, :]
        mtx1 = meta_ref[1:2, :]
        mty0 = meta_ref[2:3, :]
        mty1 = meta_ref[3:4, :]
        nxs_c = jnp.maximum(mtx1 - mtx0 + 1, 1)
        # Division-free slot walk: oy = floor(s / nxs) with STATIC s is
        # sum_{k=1..s} [k * nxs <= s] = sum_{k=1..s} [nxs <= s // k]
        # (s // k folds to a constant) — s compare+adds instead of a
        # vector i32 division, which Mosaic expands to a long
        # multiply/shift sequence on every (1, chunk) value (same trick
        # the XLA emitter uses via carried offsets, tiles.py).
        oy_c = jnp.zeros_like(nxs_c)
        for k in range(1, s + 1):
            oy_c = oy_c + (nxs_c <= s // k).astype(jnp.int32)
        ox_c = s - oy_c * nxs_c
        span_c = meta_ref[5:6, :]
        live_c = ((s < span_c) & (span_c > budget_lo)
                  & (span_c <= budget) & (oy_c <= mty1 - mty0))
        tx_c = mtx0 + ox_c
        ty_c = mty0 + oy_c
        tid_c = ty_c * nx + tx_c
        key_c = (tid_c << QUANT_DEPTH_BITS) | meta_ref[4:5, :]
        hi3 = (tid_c >> 7).reshape(chunk // 128, 128)
        lo3 = (tid_c & 127).reshape(chunk // 128, 128)
        cutv = jnp.zeros((chunk // 128, 128), jnp.int32)
        for h in range(CUT_ROWS):
            rowb = jnp.broadcast_to(cut_ref[h:h + 1, :], (chunk // 128, 128))
            got = jnp.take_along_axis(rowb, lo3, axis=1)
            cutv = jnp.where(hi3 == h, got, cutv)
        live_c = live_c & (key_c > cutv.reshape(1, chunk))
        # Stage (live, tx, ty) through a tiny scratch so the sample-space
        # eval below reads STATIC ref slices instead of recomputing the
        # slot walk and the 16-shuffle cut lookup per sub-block (measured
        # ~4 ms/frame of duplicate work).
        # (A rect-bounded pl.when skip of unused cut rows was measured
        # SLOWER — ~5 ms/frame of branch + scratch-RMW machinery at
        # chunk granularity; the 16 register-resident shuffles win.)
        ltx_ref[0:1, :] = live_c.astype(jnp.int32)
        ltx_ref[1:2, :] = tx_c
        ltx_ref[2:3, :] = ty_c

        for j, b0 in enumerate(range(0, chunk, SUB)):
          bit = (mask_s >> j) & 1

          @pl.when(bit == 0)
          def _zero(b0=b0):
            # Provably-dead (slot, sub-block): the planes scratch still
            # feeds this slot's window matmuls — zero it instead of the
            # ~25-op/sample evaluation.
            planes_ref[:, b0:b0 + SUB] = jnp.zeros(
                (planes_ref.shape[0], SUB), planes_ref.dtype)

          @pl.when(bit != 0)
          def _eval(b0=b0):
            sl = (slice(0, 1), slice(b0, b0 + SUB))
            live = ltx_ref[(slice(0, 1), slice(b0, b0 + SUB))] != 0
            tx = ltx_ref[(slice(1, 2), slice(b0, b0 + SUB))]
            ty = ltx_ref[(slice(2, 3), slice(b0, b0 + SUB))]

            sx = fields_ref[sl]
            sy = fields_ref[(slice(1, 2), slice(b0, b0 + SUB))]
            v0x = fields_ref[(slice(2, 3), slice(b0, b0 + SUB))]
            v0y = fields_ref[(slice(3, 4), slice(b0, b0 + SUB))]
            il0 = fields_ref[(slice(4, 5), slice(b0, b0 + SUB))]
            il1 = fields_ref[(slice(5, 6), slice(b0, b0 + SUB))]
            cr = fields_ref[(slice(6, 7), slice(b0, b0 + SUB))]
            cg = fields_ref[(slice(7, 8), slice(b0, b0 + SUB))]
            cb = fields_ref[(slice(8, 9), slice(b0, b0 + SUB))]
            a_eff = fields_ref[(slice(9, 10), slice(b0, b0 + SUB))]
            gate = live.astype(jnp.float32) * a_eff

            # Footprint widened by the coarse block's box-filter variance
            # (projected per eigen-axis): integrates out sub-sample
            # detail instead of point-sampling — no aliasing at any size.
            # Mass-preserving widening in inverse-eigenvalue space
            # (division-free; dead pairs with il=0 stay finite):
            # l_w^2 = l^2 + c  =>  il_w = il * rsqrt(1 + c il^2), and the
            # amplitude scales by sqrt(det Sigma / det(Sigma + B)) =
            # m0 * m1 — without it every tail pair's alpha integral
            # inflates by the widening factor.
            c0 = bx2 * v0x * v0x + by2 * v0y * v0y
            c1 = bx2 * v0y * v0y + by2 * v0x * v0x
            m0 = jax.lax.rsqrt(1.0 + c0 * il0 * il0)
            m1 = jax.lax.rsqrt(1.0 + c1 * il1 * il1)
            # _QSCALE folds the exponent's 64 * 0.5 factor into the
            # pair-space prescale: w = exp(-(n0^2 + n1^2)) — two fewer
            # sample-space ops on the hottest loop in the frame.
            il0w = il0 * m0 * _QSCALE
            il1w = il1 * m1 * _QSCALE
            gate = gate * (m0 * m1)

            kxs = kx_t * tx.astype(jnp.float32) + kx_off  # (n_samp, SUB)
            kys = ky_t * ty.astype(jnp.float32) + ky_off
            dx = kxs - sx
            dy = kys - sy
            n0 = (v0x * dx + v0y * dy) * il0w
            n1 = (v0y * dx - v0x * dy) * il1w
            w = jnp.exp(-(n0 * n0 + n1 * n1))
            if exact_clip:
                # The head's exact quad clip, in widened-n units: the
                # reference evaluates fragments only inside the |n| <=
                # 0.5 quad (Splat4DVertexShaderInstanced.GLSL:145-147);
                # n here is e * il * m * sqrt(32), so the bound is
                # 0.5 * sqrt(32) * m per axis. Without it the tail
                # accumulates the w in [1e-4, 3.4e-4] sliver OUTSIDE the
                # quad over ~1000 pairs/pixel — measured as the dominant
                # term of the parity gate's p99 (round 5).
                lim0 = (0.5 * _QSCALE) * m0
                lim1 = (0.5 * _QSCALE) * m1
                cov = (w >= 1e-4) & (jnp.abs(n0) <= lim0) \
                    & (jnp.abs(n1) <= lim1)
                alpha = jnp.where(cov, gate * w, 0.0)
            else:
                # Tail-grade coverage: the quad clip |n| <= 0.5 trims the
                # w >= 1e-4 ellipse's corners; only the weight floor — 2
                # VPU ops instead of 7 on the hottest loop in the frame.
                alpha = jnp.where(w >= 1e-4, gate * w, 0.0)
            alpha = jnp.minimum(alpha, ALPHA_MAX)
            # Depth-weighted OIT (band_weight_coeffs): the A/Ar/Ag/Ab/A2
            # planes carry w_d * alpha so the band's color/alpha mix is a
            # depth-biased weighted mean (near pairs occlude); the L
            # plane stays UNWEIGHTED — total transmittance is exact.
            aw_p = alpha * wd_ref[0:1, b0:b0 + SUB] if use_wd else alpha
            # Opacity-dominance weighting (alpha_pow): color/alpha mix
            # weights alpha^(1+p) so a near-opaque core out-votes many
            # low-alpha dust pairs — the exact-composite behavior the
            # plain mean loses (measured: depth weighting HURTS here;
            # alpha power is the lever that tracks the 1M parity gate).
            for _ in range(alpha_pow):
                aw_p = aw_p * alpha
            # 6 stacked planes (6*n_samp, SUB), bf16 for the MXU; the L
            # plane is 0 for dead pairs (log1p(-0) == 0) — no masking.
            planes_ref[:, b0:b0 + SUB] = jnp.concatenate([
                aw_p, aw_p * cr, aw_p * cg, aw_p * cb, aw_p * alpha,
                jnp.log1p(-alpha)], axis=0).astype(jnp.bfloat16)

        # Window passes over the step's tile rect, once per SLOT on the
        # full-chunk planes (a pass per SUB-block costs ~300 ns of loop/
        # branch/slice machinery each — measured dominant in v2). Morton
        # locality keeps (nwx, nwy) <= (1, 2) for almost every step;
        # those run as static predicated passes, rare bigger rects fall
        # back to a dynamic loop.
        planes = planes_ref[...]

        def one_pass(ix, iy, live=live_c, tx=tx_c, ty=ty_c, planes=planes):
            txw = txw0 + ix * WIN_TX
            tyw = tyw0 + iy * WIN_TY
            txl = tx - txw
            tyl = ty - tyw
            inw = live & (txl >= 0) & (txl < WIN_TX) \
                & (tyl >= 0) & (tyl < WIN_TY)
            row = jnp.where(inw, txl * WIN_TY + tyl, -1)
            # bf16 inputs, f32 accumulate: the f32 MXU path is ~4x
            # slower; planes are tail-grade (~0.4% bf16 quantization
            # on values summed in f32).
            onehot = (rows_iota == row).astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                onehot, planes, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            base = band * rows_per_band + tyw

            def flush(col):
                # base, ny_pad, tyw are multiples of 8 by construction;
                # Mosaic needs the hint.
                r0 = pl.multiple_of(base + (txw + col) * ny_pad, 8)

                @pl.when(txw + col < nx)
                def _():
                    blk = out[col * WIN_TY:(col + 1) * WIN_TY, :]
                    acc_ref[pl.ds(r0, WIN_TY), :] = \
                        acc_ref[pl.ds(r0, WIN_TY), :] + blk
            flush(0)
            flush(1)

        one_pass(0, 0)

        @pl.when(nwy >= 2)
        def _p2():
            one_pass(0, 1)

        @pl.when(nwx * nwy > 2)
        def _rest():
            def body(k, carry):
                iy = k // nwx
                ix = k - iy * nwx

                @pl.when(jnp.logical_not((ix == 0) & (iy <= 1)))
                def _go():
                    one_pass(ix, iy)
                return carry
            jax.lax.fori_loop(0, nwx * nwy, body, 0)

    for s in range(budget):
        if (s + 1) * nsub <= 30:
            mask_s = (mask >> (s * nsub)) & ((1 << nsub) - 1)
        else:
            mask_s = jnp.int32(-1 if nsub >= 31 else (1 << nsub) - 1)

        @pl.when(mask_s != 0)
        def _slot(s=s, mask_s=mask_s):
            do_slot(s, mask_s)


def tail_accumulate(fields, meta, band, rect, cut, params_row,
                    k_bands: int, nx: int, ny: int, chunk: int,
                    budget: int, s_cy: int, s_cx: int,
                    budget_lo: int = 0,
                    slot_mask=None, wd_ab=None, alpha_pow: int = 0,
                    exact_clip: bool = False,
                    interpret: bool | None = None):
    """Run the streaming tail kernel (differentiable w.r.t. `fields`
    through the hand-written backward kernel below).

    fields (10, Np) f32; meta (6, Np) i32 (Np a multiple of chunk);
    band (S,) i32; rect (S, 4) i32; cut (T,) i32; params_row (8,) f32;
    slot_mask (S,) i32 per-(slot, sub-block) liveness bits
    (step_slot_masks; None = no skipping); wd_ab (S, 2) f32 per-step
    depth-weight coefficients (band_weight_coeffs gathered by step band;
    None = unweighted OIT).
    Returns acc (k_bands * nx * ny_pad, 6 * s_cy * s_cx) f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _tail_core(fields, meta, band, rect, cut, params_row, slot_mask,
                      wd_ab, k_bands, nx, ny, chunk, budget, budget_lo,
                      s_cy, s_cx, alpha_pow, exact_clip, interpret)


def _mask_wa_wb(slot_mask, wd_ab, steps, chunk, budget):
    """Resolve optional skip/weight operands to the kernel's (S,) i32
    scalar-prefetch triplet (+ the static use_wd flag)."""
    nsub = max(1, chunk // min(512, chunk))
    if slot_mask is None:
        bits = min(budget * nsub, 30)
        slot_mask = jnp.full((steps,), (1 << bits) - 1, jnp.int32)
    if wd_ab is None:
        zeros = jnp.zeros((steps,), jnp.int32)
        return slot_mask, zeros, zeros, False
    wa = jax.lax.bitcast_convert_type(
        wd_ab[:, 0].astype(jnp.float32), jnp.int32)
    wb = jax.lax.bitcast_convert_type(
        wd_ab[:, 1].astype(jnp.float32), jnp.int32)
    return slot_mask, wa, wb, True


def _tail_fwd_raw(fields, meta, band, rect, cut, params_row, slot_mask,
                  wd_ab, k_bands, nx,
                  ny, chunk, budget, budget_lo, s_cy, s_cx, alpha_pow,
                  exact_clip, interpret):
    n_samp = s_cy * s_cx
    npts = meta.shape[1]
    if fields.shape[1] != npts:
        fields = jnp.pad(fields, ((0, 0), (0, npts - fields.shape[1])))
    steps = npts // chunk
    assert steps * chunk == npts and band.shape[0] == steps
    slot_mask, wa, wb, use_wd = _mask_wa_wb(slot_mask, wd_ab, steps, chunk,
                                            budget)
    ny_pad = _ceil_to(ny + WIN_TY, 8)    # tyw + WIN_TY never past the pad
    rows_per_band = nx * ny_pad
    rows = k_bands * rows_per_band
    tbl = jnp.concatenate(
        [cut.astype(jnp.int32),
         jnp.full((CUT_ROWS * 128 - cut.shape[0],),
                  jnp.iinfo(jnp.int32).max, jnp.int32)]).reshape(CUT_ROWS,
                                                                 128)
    params = jnp.zeros((8, 128), jnp.float32)
    params = params.at[0, :8].set(params_row)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,   # band, txw, tyw, nwx, nwy, mask, wa, wb
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CUT_ROWS, 128), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10, chunk), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, chunk), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, N_PLANES * n_samp),
                               lambda g, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N_PLANES * n_samp, chunk),
                                   jnp.bfloat16),
                        pltpu.VMEM((8, chunk), jnp.int32),
                        pltpu.VMEM((1, chunk), jnp.float32)],
    )
    kern = functools.partial(
        _tail_kernel, chunk=chunk, budget=budget, budget_lo=budget_lo,
        nx=nx, ny_pad=ny_pad, s_cy=s_cy, s_cx=s_cx,
        rows_per_band=rows_per_band, use_wd=use_wd, alpha_pow=alpha_pow,
        exact_clip=exact_clip)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, N_PLANES * n_samp),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(band, rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3],
      slot_mask, wa, wb,
      params, tbl, fields, meta)


def tail_accumulate_xla(fields, meta, band, rect, cut, params_row,
                        k_bands: int, nx: int, ny: int, chunk: int,
                        budget: int, s_cy: int, s_cx: int,
                        budget_lo: int = 0, wd_ab=None,
                        alpha_pow: int = 0, exact_clip: bool = False):
    """jnp reference twin of tail_accumulate (scatter-add based; tests)."""
    n_samp = s_cy * s_cx
    npts = meta.shape[1]
    if fields.shape[1] != npts:
        fields = jnp.pad(fields, ((0, 0), (0, npts - fields.shape[1])))
    steps = npts // chunk
    ny_pad = _ceil_to(ny + WIN_TY, 8)
    rows_per_band = nx * ny_pad
    acc = jnp.zeros((k_bands * rows_per_band, N_PLANES * n_samp),
                    jnp.float32)
    (sx, sy, v0x, v0y, il0, il1, cr, cg, cb, a_eff) = fields
    tx0, tx1, ty0, ty1, dbits, span = meta
    kx_t, kx_j, kx_0, ky_t, ky_j, ky_0, bx2, by2 = [params_row[i]
                                                    for i in range(8)]
    m0 = 1.0 / jnp.sqrt(1.0 + (bx2 * v0x ** 2 + by2 * v0y ** 2) * il0 ** 2)
    m1 = 1.0 / jnp.sqrt(1.0 + (bx2 * v0y ** 2 + by2 * v0x ** 2) * il1 ** 2)
    il0w = il0 * m0 * _QSCALE
    il1w = il1 * m1 * _QSCALE
    mass = m0 * m1                      # mass-preserving widening
    band_full = jnp.repeat(band, chunk)
    if wd_ab is not None:
        a_s = jnp.repeat(wd_ab[:, 0], chunk)
        b_s = jnp.repeat(wd_ab[:, 1], chunk)
        wd_full = jnp.exp(jnp.clip(a_s * dbits.astype(jnp.float32) + b_s,
                                   0.0, _WD_CAP))
    else:
        wd_full = jnp.ones((meta.shape[1],), jnp.float32)
    nx_span = tx1 - tx0 + 1
    jy = jnp.arange(n_samp) // s_cx
    jx = jnp.arange(n_samp) % s_cx
    ox = jnp.zeros_like(tx0)
    oy = jnp.zeros_like(ty0)
    cut_pad = jnp.concatenate(
        [cut, jnp.full((CUT_ROWS * 128 - cut.shape[0],),
                       jnp.iinfo(jnp.int32).max, jnp.int32)])
    for s in range(budget):
        live = ((s < span) & (span > budget_lo) & (span <= budget)
                & (oy < (ty1 - ty0 + 1)))
        tx = tx0 + ox
        ty = ty0 + oy
        tid = ty * nx + tx
        key = (tid << QUANT_DEPTH_BITS) | dbits
        live = live & (key > cut_pad[jnp.clip(tid, 0, CUT_ROWS * 128 - 1)])
        gate = live.astype(jnp.float32) * a_eff * mass
        kxs = kx_t * tx[:, None] + kx_j * jx[None, :] + kx_0
        kys = ky_t * ty[:, None] + ky_j * jy[None, :] + ky_0
        dx = kxs - sx[:, None]
        dy = kys - sy[:, None]
        n0 = (v0x[:, None] * dx + v0y[:, None] * dy) * il0w[:, None]
        n1 = (v0y[:, None] * dx - v0x[:, None] * dy) * il1w[:, None]
        w = jnp.exp(-(n0 * n0 + n1 * n1))
        if exact_clip:
            cov = ((w >= 1e-4)
                   & (jnp.abs(n0) <= (0.5 * _QSCALE) * m0[:, None])
                   & (jnp.abs(n1) <= (0.5 * _QSCALE) * m1[:, None]))
        else:
            # Mirrors the kernel's tail-grade coverage (weight floor only).
            cov = w >= 1e-4
        alpha = jnp.minimum(jnp.where(cov, gate[:, None] * w, 0.0),
                            ALPHA_MAX)
        aw = alpha * wd_full[:, None]
        for _ in range(alpha_pow):
            aw = aw * alpha
        planes = jnp.concatenate([
            aw, aw * cr[:, None], aw * cg[:, None],
            aw * cb[:, None], aw * alpha, jnp.log1p(-alpha)], axis=1)
        row = band_full * rows_per_band + tx * ny_pad + ty
        row = jnp.where(live, row, 0)
        contrib = jnp.where(live[:, None], planes, 0.0)
        acc = acc.at[row].add(contrib)
        if s + 1 < budget:
            wrap = ox + 1 >= nx_span
            ox = jnp.where(wrap, 0, ox + 1)
            oy = jnp.where(wrap, oy + 1, oy)
    return acc


# ---------------------------------------------------------------------------
# backward kernel (custom VJP): d(acc)/d(fields)
# ---------------------------------------------------------------------------
#
# Mirrors the forward stream exactly — same chunks, same slot walk, same
# sub-block evaluation — with the one-hot matmuls TRANSPOSED: per slot the
# window passes scatter the upstream cotangent d_acc back onto pairs
# (d_planes = onehot^T @ d_acc_window), then the per-sample chain rule
# accumulates field cotangents. Zero sorting, zero gathers, like the
# forward; cost ~2x forward (recompute + chain).

def _tail_bwd_kernel(band_ref, txw_ref, tyw_ref, nwx_ref, nwy_ref,
                     mask_ref, wa_ref, wb_ref,
                     params_ref, cut_ref, fields_ref, meta_ref, dacc_ref,
                     df_ref, dpl_ref, ltx_ref, wd_ref, *, chunk: int,
                     budget: int, budget_lo: int, nx: int, ny_pad: int,
                     s_cy: int, s_cx: int, rows_per_band: int,
                     use_wd: bool, alpha_pow: int, exact_clip: bool):
    g = pl.program_id(0)
    n_samp = s_cy * s_cx

    df_ref[...] = jnp.zeros(df_ref.shape, df_ref.dtype)

    band = band_ref[g]
    txw0 = txw_ref[g]
    tyw0 = tyw_ref[g]
    nwx = nwx_ref[g]
    nwy = nwy_ref[g]
    mask = mask_ref[g]

    if use_wd:
        a_w = jax.lax.bitcast_convert_type(
            jnp.full((1, 1), wa_ref[g], jnp.int32), jnp.float32)
        b_w = jax.lax.bitcast_convert_type(
            jnp.full((1, 1), wb_ref[g], jnp.int32), jnp.float32)
        dbf = meta_ref[4:5, :].astype(jnp.float32)
        wd_ref[...] = jnp.exp(jnp.clip(a_w * dbf + b_w, 0.0, _WD_CAP))

    kx_t = params_ref[0, 0]
    kx_j = params_ref[0, 1]
    kx_0 = params_ref[0, 2]
    ky_t = params_ref[0, 3]
    ky_j = params_ref[0, 4]
    ky_0 = params_ref[0, 5]
    bx2 = params_ref[0, 6]
    by2 = params_ref[0, 7]

    jy = jax.lax.broadcasted_iota(jnp.int32, (n_samp, 1), 0) // s_cx
    jx = jax.lax.broadcasted_iota(jnp.int32, (n_samp, 1), 0) % s_cx
    kx_off = kx_j * jx.astype(jnp.float32) + kx_0
    ky_off = ky_j * jy.astype(jnp.float32) + ky_0
    rows_iota = jax.lax.broadcasted_iota(
        jnp.int32, (WIN_TX * WIN_TY, 1), 0)

    SUB = min(512, chunk)
    nsub = chunk // SUB

    def do_slot(s, mask_s):
        # Full-chunk pair tile/liveness (as in the forward).
        mtx0 = meta_ref[0:1, :]
        mtx1 = meta_ref[1:2, :]
        mty0 = meta_ref[2:3, :]
        mty1 = meta_ref[3:4, :]
        nxs_c = jnp.maximum(mtx1 - mtx0 + 1, 1)
        # Division-free slot walk (see the forward kernel).
        oy_c = jnp.zeros_like(nxs_c)
        for k in range(1, s + 1):
            oy_c = oy_c + (nxs_c <= s // k).astype(jnp.int32)
        ox_c = s - oy_c * nxs_c
        span_c = meta_ref[5:6, :]
        live_c = ((s < span_c) & (span_c > budget_lo)
                  & (span_c <= budget) & (oy_c <= mty1 - mty0))
        tx_c = mtx0 + ox_c
        ty_c = mty0 + oy_c
        tid_c = ty_c * nx + tx_c
        key_c = (tid_c << QUANT_DEPTH_BITS) | meta_ref[4:5, :]
        hi3 = (tid_c >> 7).reshape(chunk // 128, 128)
        lo3 = (tid_c & 127).reshape(chunk // 128, 128)
        cutv = jnp.zeros((chunk // 128, 128), jnp.int32)
        for h in range(CUT_ROWS):
            rowb = jnp.broadcast_to(cut_ref[h:h + 1, :], (chunk // 128, 128))
            got = jnp.take_along_axis(rowb, lo3, axis=1)
            cutv = jnp.where(hi3 == h, got, cutv)
        live_c = live_c & (key_c > cutv.reshape(1, chunk))
        # Stage (live, tx, ty) for the chain-rule sub-blocks (see the
        # forward kernel: avoids duplicate slot-walk divides and cut
        # lookups per sub-block).
        ltx_ref[0:1, :] = live_c.astype(jnp.int32)
        ltx_ref[1:2, :] = tx_c
        ltx_ref[2:3, :] = ty_c

        # d_planes scratch: scatter d_acc windows back to pairs.
        dpl_ref[...] = jnp.zeros(dpl_ref.shape, dpl_ref.dtype)

        def one_pass(ix, iy, live=live_c, tx=tx_c, ty=ty_c):
            txw = txw0 + ix * WIN_TX
            tyw = tyw0 + iy * WIN_TY
            txl = tx - txw
            tyl = ty - tyw
            inw = live & (txl >= 0) & (txl < WIN_TX) \
                & (tyl >= 0) & (tyl < WIN_TY)
            row = jnp.where(inw, txl * WIN_TY + tyl, -1)
            onehot = (rows_iota == row).astype(jnp.float32)   # (32, C)
            base = band * rows_per_band + tyw

            def dwin(col):
                r0 = pl.multiple_of(base + (txw + col) * ny_pad, 8)
                ok = txw + col < nx
                blk = jnp.where(
                    ok, dacc_ref[pl.ds(jnp.where(ok, r0, 0), WIN_TY), :],
                    0.0)
                return blk                                    # (16, 384)
            d_win = jnp.concatenate([dwin(0), dwin(1)], axis=0)  # (32, 384)
            # (6*n_samp, C) += d_win^T routed to pairs (f32 dot: the
            # cotangent magnitudes matter more than the fwd planes).
            dpl_ref[...] = dpl_ref[...] + jax.lax.dot_general(
                d_win, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dpl_ref.dtype)

        one_pass(0, 0)

        @pl.when(nwy >= 2)
        def _p2():
            one_pass(0, 1)

        @pl.when(nwx * nwy > 2)
        def _rest():
            def body(k, carry):
                iy = k // nwx
                ix = k - iy * nwx

                @pl.when(jnp.logical_not((ix == 0) & (iy <= 1)))
                def _go():
                    one_pass(ix, iy)
                return carry
            jax.lax.fori_loop(0, nwx * nwy, body, 0)

        # Sub-block chain rule: recompute the forward, apply cotangents.
        # Provably-dead (slot, sub-block) passes contribute nothing to
        # df (zero-initialized) and are skipped outright.
        for j, b0 in enumerate(range(0, chunk, SUB)):
          bit = (mask_s >> j) & 1

          @pl.when(bit != 0)
          def _chain(b0=b0):
            sb = (slice(0, 1), slice(b0, b0 + SUB))
            live = ltx_ref[(slice(0, 1), slice(b0, b0 + SUB))] != 0
            tx = ltx_ref[(slice(1, 2), slice(b0, b0 + SUB))]
            ty = ltx_ref[(slice(2, 3), slice(b0, b0 + SUB))]
            livef = live.astype(jnp.float32)

            sx = fields_ref[sb]
            sy = fields_ref[(slice(1, 2), slice(b0, b0 + SUB))]
            v0x = fields_ref[(slice(2, 3), slice(b0, b0 + SUB))]
            v0y = fields_ref[(slice(3, 4), slice(b0, b0 + SUB))]
            il0 = fields_ref[(slice(4, 5), slice(b0, b0 + SUB))]
            il1 = fields_ref[(slice(5, 6), slice(b0, b0 + SUB))]
            cr = fields_ref[(slice(6, 7), slice(b0, b0 + SUB))]
            cg = fields_ref[(slice(7, 8), slice(b0, b0 + SUB))]
            cb = fields_ref[(slice(8, 9), slice(b0, b0 + SUB))]
            a_eff = fields_ref[(slice(9, 10), slice(b0, b0 + SUB))]

            c0 = bx2 * v0x * v0x + by2 * v0y * v0y
            c1 = bx2 * v0y * v0y + by2 * v0x * v0x
            u0 = 1.0 + c0 * il0 * il0
            u1 = 1.0 + c1 * il1 * il1
            m0 = jax.lax.rsqrt(u0)
            m1 = jax.lax.rsqrt(u1)
            # Scaled prescale (matches the forward): n are in sqrt(32)
            # units, w = exp(-(n0^2 + n1^2)).
            il0w = il0 * m0 * _QSCALE
            il1w = il1 * m1 * _QSCALE
            ga = livef * a_eff
            gate = ga * (m0 * m1)

            kxs = kx_t * tx.astype(jnp.float32) + kx_off
            kys = ky_t * ty.astype(jnp.float32) + ky_off
            dx = kxs - sx
            dy = kys - sy
            e0 = v0x * dx + v0y * dy
            e1 = v0y * dx - v0x * dy
            n0 = e0 * il0w
            n1 = e1 * il1w
            w = jnp.exp(-(n0 * n0 + n1 * n1))
            aw = gate * w
            if exact_clip:
                lim0 = (0.5 * _QSCALE) * m0
                lim1 = (0.5 * _QSCALE) * m1
                cov = (w >= 1e-4) & (jnp.abs(n0) <= lim0) \
                    & (jnp.abs(n1) <= lim1)
            else:
                cov = w >= 1e-4
            alpha = jnp.minimum(jnp.where(cov, aw, 0.0), ALPHA_MAX)

            dp = dpl_ref[:, b0:b0 + SUB]                 # (6*n_samp, SUB)
            dA = dp[0 * n_samp:1 * n_samp]
            dAr = dp[1 * n_samp:2 * n_samp]
            dAg = dp[2 * n_samp:3 * n_samp]
            dAb = dp[3 * n_samp:4 * n_samp]
            dA2 = dp[4 * n_samp:5 * n_samp]
            dL = dp[5 * n_samp:6 * n_samp]

            # Planes are [w a^(1+p), w a^(1+p) c, w a^(2+p), log1p(-a)]
            # with w = wd (or 1) and p = alpha_pow; chain accordingly.
            s1 = jnp.ones_like(alpha)
            for _ in range(alpha_pow):
                s1 = s1 * alpha
            core = ((1.0 + alpha_pow) * s1
                    * (dA + dAr * cr + dAg * cg + dAb * cb)
                    + (2.0 + alpha_pow) * s1 * alpha * dA2)
            if use_wd:
                wd = wd_ref[0:1, b0:b0 + SUB]
                core = core * wd
            else:
                wd = None
            d_alpha = core - dL / (1.0 - alpha)
            live_d = (cov & (aw < ALPHA_MAX)).astype(jnp.float32)
            d_aw = d_alpha * live_d
            d_gate = jnp.sum(d_aw * w, axis=0, keepdims=True)   # (1, SUB)
            dw = d_aw * gate
            dqn = dw * w * (-2.0)          # d w / d n_i = -2 n_i w
            dn0 = n0 * dqn
            dn1 = n1 * dqn
            d_dx = dn0 * v0x * il0w + dn1 * v0y * il1w
            d_dy = dn0 * v0y * il0w - dn1 * v0x * il1w
            d_sx = -jnp.sum(d_dx, axis=0, keepdims=True)
            d_sy = -jnp.sum(d_dy, axis=0, keepdims=True)
            # Cotangents of the UNSCALED il0*m0 basis: n = e * il*m*S, so
            # d(il*m) = S * sum(dn * e).
            d_il0w = _QSCALE * jnp.sum(dn0 * e0, axis=0, keepdims=True)
            d_il1w = _QSCALE * jnp.sum(dn1 * e1, axis=0, keepdims=True)
            d_v0x_e = jnp.sum(dn0 * dx * il0w - dn1 * dy * il1w,
                              axis=0, keepdims=True)
            d_v0y_e = jnp.sum(dn0 * dy * il0w + dn1 * dx * il1w,
                              axis=0, keepdims=True)
            alpha_w = alpha * s1 * wd if use_wd else alpha * s1
            d_cr = jnp.sum(dAr * alpha_w, axis=0, keepdims=True)
            d_cg = jnp.sum(dAg * alpha_w, axis=0, keepdims=True)
            d_cb = jnp.sum(dAb * alpha_w, axis=0, keepdims=True)
            d_a_eff = d_gate * livef * m0 * m1
            # Mass-preserving-widening chain: il_w = il * m,
            # m = rsqrt(1 + c il^2), gate scales with m0 m1.
            d_m0 = d_il0w * il0 + d_gate * ga * m1
            d_m1 = d_il1w * il1 + d_gate * ga * m0
            d_u0 = d_m0 * (-0.5) * m0 * m0 * m0
            d_u1 = d_m1 * (-0.5) * m1 * m1 * m1
            d_il0 = d_il0w * m0 + d_u0 * 2.0 * c0 * il0
            d_il1 = d_il1w * m1 + d_u1 * 2.0 * c1 * il1
            d_c0 = d_u0 * il0 * il0
            d_c1 = d_u1 * il1 * il1
            d_v0x = d_v0x_e + 2.0 * v0x * (d_c0 * bx2 + d_c1 * by2)
            d_v0y = d_v0y_e + 2.0 * v0y * (d_c0 * by2 + d_c1 * bx2)

            dcols = jnp.concatenate([
                d_sx, d_sy, d_v0x, d_v0y, d_il0, d_il1, d_cr, d_cg,
                d_cb, d_a_eff], axis=0)                     # (10, SUB)
            df_ref[:, b0:b0 + SUB] = df_ref[:, b0:b0 + SUB] + dcols

    for s in range(budget):
        if (s + 1) * nsub <= 30:
            mask_s = (mask >> (s * nsub)) & ((1 << nsub) - 1)
        else:
            mask_s = jnp.int32(-1 if nsub >= 31 else (1 << nsub) - 1)

        @pl.when(mask_s != 0)
        def _slot(s=s, mask_s=mask_s):
            do_slot(s, mask_s)


def _tail_bwd(fields, meta, band, rect, cut, params_row, slot_mask, wd_ab,
              d_acc,
              k_bands: int, nx: int, ny: int, chunk: int, budget: int,
              budget_lo: int, s_cy: int, s_cx: int, alpha_pow: int,
              exact_clip: bool, interpret: bool):
    n_samp = s_cy * s_cx
    npts = meta.shape[1]
    n_fields = fields.shape[1]
    if n_fields != npts:
        fields = jnp.pad(fields, ((0, 0), (0, npts - n_fields)))
    steps = npts // chunk
    slot_mask, wa, wb, use_wd = _mask_wa_wb(slot_mask, wd_ab, steps, chunk,
                                            budget)
    ny_pad = _ceil_to(ny + WIN_TY, 8)
    rows_per_band = nx * ny_pad
    rows = k_bands * rows_per_band
    tbl = jnp.concatenate(
        [cut.astype(jnp.int32),
         jnp.full((CUT_ROWS * 128 - cut.shape[0],),
                  jnp.iinfo(jnp.int32).max, jnp.int32)]).reshape(CUT_ROWS,
                                                                 128)
    params = jnp.zeros((8, 128), jnp.float32)
    params = params.at[0, :8].set(params_row)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CUT_ROWS, 128), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10, chunk), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, chunk), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, N_PLANES * n_samp), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((10, chunk), lambda g, *_: (0, g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N_PLANES * n_samp, chunk),
                                   jnp.float32),
                        pltpu.VMEM((8, chunk), jnp.int32),
                        pltpu.VMEM((1, chunk), jnp.float32)],
    )
    kern = functools.partial(
        _tail_bwd_kernel, chunk=chunk, budget=budget, budget_lo=budget_lo,
        nx=nx, ny_pad=ny_pad, s_cy=s_cy, s_cx=s_cx,
        rows_per_band=rows_per_band, use_wd=use_wd, alpha_pow=alpha_pow,
        exact_clip=exact_clip)
    df = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((10, npts), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(band, rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3],
      slot_mask, wa, wb,
      params, tbl, fields, meta, d_acc)
    return df[:, :n_fields]


def _float0_like(x):
    return np.zeros(x.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13,
                                                    14, 15, 16, 17, 18))
def _tail_core(fields, meta, band, rect, cut, params_row, slot_mask, wd_ab,
               k_bands, nx, ny,
               chunk, budget, budget_lo, s_cy, s_cx, alpha_pow, exact_clip,
               interpret):
    return _tail_fwd_raw(fields, meta, band, rect, cut, params_row,
                         slot_mask, wd_ab,
                         k_bands, nx, ny, chunk, budget, budget_lo, s_cy,
                         s_cx, alpha_pow, exact_clip, interpret)


def _tail_core_fwd(fields, meta, band, rect, cut, params_row, slot_mask,
                   wd_ab, k_bands, nx,
                   ny, chunk, budget, budget_lo, s_cy, s_cx, alpha_pow,
                   exact_clip, interpret):
    acc = _tail_fwd_raw(fields, meta, band, rect, cut, params_row,
                        slot_mask, wd_ab, k_bands,
                        nx, ny, chunk, budget, budget_lo, s_cy, s_cx,
                        alpha_pow, exact_clip, interpret)
    return acc, (fields, meta, band, rect, cut, params_row, slot_mask,
                 wd_ab)


def _tail_core_bwd(k_bands, nx, ny, chunk, budget, budget_lo, s_cy, s_cx,
                   alpha_pow, exact_clip, interpret, res, d_acc):
    fields, meta, band, rect, cut, params_row, slot_mask, wd_ab = res
    df = _tail_bwd(fields, meta, band, rect, cut, params_row, slot_mask,
                   wd_ab, d_acc,
                   k_bands, nx, ny, chunk, budget, budget_lo, s_cy, s_cx,
                   alpha_pow, exact_clip, interpret)
    return (df, _float0_like(meta), _float0_like(band), _float0_like(rect),
            _float0_like(cut), jnp.zeros_like(params_row),
            None if slot_mask is None else _float0_like(slot_mask),
            None if wd_ab is None else jnp.zeros_like(wd_ab))


_tail_core.defvjp(_tail_core_fwd, _tail_core_bwd)
