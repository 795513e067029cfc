"""Pallas TPU kernel: row-stack repack for kernel operand matrices.

`jnp.stack([...(N,) fields...])` into the (R, N) T(8,128)-tiled operand
matrices the composite/tail kernels consume costs XLA one relayout loop
PER ROW plus a concatenate (each (N,) field carries the linear T(1024)
layout; a (1, N) row of the stack needs T(1,128)) — measured ~6.6 ms of
the 10M bench frame for the 10-row record matrix alone (trace: 10
`while` relayouts + `concatenate.29`).

A (N,) linear array IS bitcast-identical to (N/128, 128) under the
standard (8, 128) tile when N is a multiple of 1024 — so this kernel
takes R free-bitcast (N/128, 128) views and emits the (R, N) matrix with
one in-register sublane→lane reshape per block row: pure HBM bandwidth
(read + write) instead of R relayout loops.

Differentiable: the custom VJP runs the transpose kernel (row slices of
the cotangent reshaped back to (N/128, 128) views), so training steps
pay the same two passes, not R backward relayouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blk_for(pad_to: int) -> int:
    for blk in (65536, 32768, 16384, 8192, 4096, 2048, 1024):
        if pad_to % blk == 0:
            return blk
    raise ValueError(f"pad_to={pad_to} must be a multiple of 1024")


def _pack_kernel(*refs, r: int, blk: int):
    in_refs, out_ref = refs[:r], refs[r]
    for i in range(r):
        out_ref[i:i + 1, :] = in_refs[i][...].reshape(1, blk)


def _unpack_kernel(dout_ref, *out_refs, r: int, blk: int):
    for i in range(r):
        out_refs[i][...] = dout_ref[i:i + 1, :].reshape(blk // 128, 128)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pack_core(views, blk: int, interpret: bool):
    return _pack_fwd_raw(views, blk, interpret)


def _pack_fwd_raw(views, blk: int, interpret: bool):
    r = len(views)
    g = views[0].shape[0] * 128 // blk
    kern = functools.partial(_pack_kernel, r=r, blk=blk)
    return pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[pl.BlockSpec((blk // 128, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * r,
        out_specs=pl.BlockSpec((r, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, g * blk), views[0].dtype),
        interpret=interpret,
    )(*views)


def _pack_core_fwd(views, blk, interpret):
    return _pack_fwd_raw(views, blk, interpret), None


def _pack_core_bwd(blk, interpret, res, d_out):
    del res
    r, dtype = d_out.shape[0], d_out.dtype
    g = d_out.shape[1] // blk
    kern = functools.partial(_unpack_kernel, r=r, blk=blk)
    shapes = tuple(jax.ShapeDtypeStruct((g * blk // 128, 128), dtype)
                   for _ in range(r))
    d_views = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[pl.BlockSpec((r, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec((blk // 128, 128), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(r)),
        out_shape=shapes,
        interpret=interpret,
    )(d_out)
    return (tuple(d_views),)


_pack_core.defvjp(_pack_core_fwd, _pack_core_bwd)


_REC_COPY_ROWS = (2, 3, 6, 7, 8, 9)   # v0x, v0y, r, g, b, a_eff
_REC_SCALE_ROWS = {0: 0, 1: 1}        # mx * inv_p00, my * inv_p11
_REC_RECIP_ROWS = (4, 5)              # 1 / l0, 1 / l1


def _pack_rec_kernel(scal_ref, *refs, blk: int):
    """Fused record_fields + repack: compute the 5 derived rows (center
    scaling, inverse eigenvalues) IN the pack kernel instead of
    materializing each as its own (N,) array first (XLA traced ~1.6 ms of
    divide/multiply+relayout fusions per 10M frame building them)."""
    in_refs, out_ref = refs[:10], refs[10]
    inv00 = scal_ref[0, 0]
    inv11 = scal_ref[0, 1]
    for i in range(10):
        x = in_refs[i][...]
        if i in _REC_SCALE_ROWS:
            x = x * (inv00 if i == 0 else inv11)
        elif i in _REC_RECIP_ROWS:
            # Dead/padded entries carry l == 0: keep il finite (their
            # a_eff is 0, so the value is never consumed).
            x = jnp.where(x != 0.0, 1.0 / x, 0.0)
        out_ref[i:i + 1, :] = x.reshape(1, blk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _pack_rec_core(views, scal, blk: int, interpret: bool):
    return _pack_rec_fwd_raw(views, scal, blk, interpret)


def _pack_rec_fwd_raw(views, scal, blk: int, interpret: bool):
    g = views[0].shape[0] * 128 // blk
    kern = functools.partial(_pack_rec_kernel, blk=blk)
    return pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((blk // 128, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec((10, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((10, g * blk), views[0].dtype),
        interpret=interpret,
    )(scal, *views)


def _pack_rec_core_fwd(views, scal, blk, interpret):
    out = _pack_rec_fwd_raw(views, scal, blk, interpret)
    return out, (views[0], views[1], views[4], views[5], scal)


def _pack_rec_core_bwd(blk, interpret, res, d_out):
    # Elementwise chain back to the raw component views — plain traced
    # ops (training-only path; the forward's fusion win is what matters).
    mx, my, l0, l1, scal = res
    inv00 = scal[0, 0]
    inv11 = scal[0, 1]

    def row(i):
        return d_out[i].reshape(mx.shape)

    il0 = jnp.where(l0 != 0.0, 1.0 / l0, 0.0)
    il1 = jnp.where(l1 != 0.0, 1.0 / l1, 0.0)
    d_views = (row(0) * inv00, row(1) * inv11,
               row(2), row(3),
               -row(4) * il0 * il0, -row(5) * il1 * il1,
               row(6), row(7), row(8), row(9))
    d_scal = jnp.zeros_like(scal).at[0, 0].set(
        jnp.sum(row(0) * mx)).at[0, 1].set(jnp.sum(row(1) * my))
    return d_views, d_scal


_pack_rec_core.defvjp(_pack_rec_core_fwd, _pack_rec_core_bwd)


def pack_record_fields(mx, my, v0x, v0y, l0, l1, r, g, b, a_eff,
                       p00, p11, pad_to: int,
                       interpret: bool | None = None) -> jax.Array:
    """(10, pad_to) composite/tail record matrix straight from projected
    components: [mx/p00, my/p11, v0x, v0y, 1/l0, 1/l1, r, g, b, a_eff],
    derived rows computed inside the pack kernel (zero intermediate (N,)
    materializations). Padded tail columns are zero (il rows included:
    the kernel maps l == 0 to il == 0, matching the jnp construction
    that pads AFTER the reciprocal)."""
    n = mx.shape[0]
    assert pad_to >= n and pad_to % 1024 == 0, (n, pad_to)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scal = jnp.zeros((1, 128), mx.dtype).at[0, 0].set(1.0 / p00) \
                                        .at[0, 1].set(1.0 / p11)
    rows = (mx, my, v0x, v0y, l0, l1, r, g, b, a_eff)
    views = tuple(jnp.pad(f, (0, pad_to - n)).reshape(pad_to // 128, 128)
                  for f in rows)
    return _pack_rec_core(views, scal, _blk_for(pad_to), interpret)


def pack_rows(rows, pad_to: int, interpret: bool | None = None) -> jax.Array:
    """Stack R same-dtype (N,) arrays into an (R, pad_to) matrix (tail
    entries zero-padded), avoiding XLA's per-row relayout loops.

    pad_to must be a multiple of 1024 (the f32/i32 tile volume) so the
    flat→(pad_to/128, 128) reshape is a pure bitcast. Off-TPU (or under
    interpret) this is exactly jnp.stack(pad(rows))."""
    n = rows[0].shape[0]
    assert pad_to >= n and pad_to % 1024 == 0, (n, pad_to)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        return jnp.stack([jnp.pad(f, (0, pad_to - n)) for f in rows])
    views = tuple(jnp.pad(f, (0, pad_to - n)).reshape(pad_to // 128, 128)
                  for f in rows)
    return _pack_core(views, _blk_for(pad_to), False)
