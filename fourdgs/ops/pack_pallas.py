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
    for blk in (16384, 8192, 4096, 2048, 1024):
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
