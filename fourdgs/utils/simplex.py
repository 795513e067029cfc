"""2D/3D simplex noise (+ fractal sum), differentiable jnp implementation.

The reference vendors SimplexNoise (Dependencies/SIMPLEX_NOISE/
SimplexNoise.{h,cpp}; compiled into the project, 4DSplatRendering.vcxproj:154
— no app call sites, presumably intended for procedural cloud scenes). We
provide the equivalent utility natively in JAX so procedural scene
generators (e.g. richer Clouds variants) can run on device.

Implementation follows the classic Gustavson simplex construction with a
hash-free permutation (integer mix), vectorized and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_F2 = 0.5 * (jnp.sqrt(3.0) - 1.0)
_G2 = (3.0 - jnp.sqrt(3.0)) / 6.0


def _hash2(ix: jax.Array, iy: jax.Array) -> jax.Array:
    """Integer mix hash -> [0, 8) gradient index (replaces the permutation
    table, which would be a gathered lookup — hostile to fusion)."""
    h = ix.astype(jnp.uint32) * jnp.uint32(374761393) \
        + iy.astype(jnp.uint32) * jnp.uint32(668265263)
    h = (h ^ (h >> 13)) * jnp.uint32(1274126177)
    return ((h ^ (h >> 16)) % 8).astype(jnp.int32)


_GRADS2 = jnp.array([[1, 1], [-1, 1], [1, -1], [-1, -1],
                     [1, 0], [-1, 0], [0, 1], [0, -1]], jnp.float32)


def _grad_dot2(gi: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    g = _GRADS2[gi]
    return g[..., 0] * x + g[..., 1] * y


def snoise2(x: jax.Array, y: jax.Array) -> jax.Array:
    """2D simplex noise in ~[-1, 1]; broadcasts over any shape."""
    s = (x + y) * _F2
    i = jnp.floor(x + s)
    j = jnp.floor(y + s)
    t = (i + j) * _G2
    x0 = x - (i - t)
    y0 = y - (j - t)
    i1 = (x0 > y0).astype(x0.dtype)
    j1 = 1.0 - i1
    x1 = x0 - i1 + _G2
    y1 = y0 - j1 + _G2
    x2 = x0 - 1.0 + 2.0 * _G2
    y2 = y0 - 1.0 + 2.0 * _G2
    ii = i.astype(jnp.int32)
    jj = j.astype(jnp.int32)

    def corner(cx, cy, gi):
        t = 0.5 - cx * cx - cy * cy
        t = jnp.maximum(t, 0.0)
        return (t * t) * (t * t) * _grad_dot2(gi, cx, cy)

    n0 = corner(x0, y0, _hash2(ii, jj))
    n1 = corner(x1, y1, _hash2(ii + i1.astype(jnp.int32), jj + j1.astype(jnp.int32)))
    n2 = corner(x2, y2, _hash2(ii + 1, jj + 1))
    return 70.0 * (n0 + n1 + n2)


def fractal2(x: jax.Array, y: jax.Array, octaves: int = 4,
             lacunarity: float = 2.0, gain: float = 0.5) -> jax.Array:
    """Fractal (fBm) sum of snoise2 — SimplexNoise::fractal analog."""
    total = jnp.zeros_like(jnp.asarray(x, jnp.float32))
    amp = 1.0
    freq = 1.0
    norm = 0.0
    for _ in range(octaves):
        total = total + amp * snoise2(x * freq, y * freq)
        norm += amp
        freq *= lacunarity
        amp *= gain
    return total / norm
