"""1D/2D/3D simplex noise (+ fractal sums), differentiable jnp implementation.

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


def snoise1(x: jax.Array) -> jax.Array:
    """1D simplex noise in ~[-1, 1] (SimplexNoise::noise(float) analog,
    Dependencies/SIMPLEX_NOISE/SimplexNoise.cpp): two integer corners with
    quartic falloff and hashed gradient magnitudes."""
    i0 = jnp.floor(x)
    i1 = i0 + 1.0
    x0 = x - i0
    x1 = x0 - 1.0

    def grad1(ih):
        # hash -> gradient in {-8..-1, 1..8} (classic grad1 table semantics)
        h = ih.astype(jnp.uint32) * jnp.uint32(374761393)
        h = (h ^ (h >> 13)) * jnp.uint32(1274126177)
        h = (h ^ (h >> 16)) & jnp.uint32(15)
        mag = 1.0 + (h & jnp.uint32(7)).astype(jnp.float32)
        return jnp.where((h & jnp.uint32(8)) > 0, -mag, mag)

    def corner(cx, ih):
        t = 1.0 - cx * cx
        t = jnp.maximum(t, 0.0)
        return (t * t) * (t * t) * grad1(ih) * cx

    n = corner(x0, i0.astype(jnp.int32)) + corner(x1, i1.astype(jnp.int32))
    # 0.395 scales the two-corner sum into ~[-1, 1] (Gustavson's constant).
    return 0.395 * n


_F3 = 1.0 / 3.0
_G3 = 1.0 / 6.0

_GRADS3 = jnp.array([[1, 1, 0], [-1, 1, 0], [1, -1, 0], [-1, -1, 0],
                     [1, 0, 1], [-1, 0, 1], [1, 0, -1], [-1, 0, -1],
                     [0, 1, 1], [0, -1, 1], [0, 1, -1], [0, -1, -1]],
                    jnp.float32)


def _hash3(ix, iy, iz):
    h = (ix.astype(jnp.uint32) * jnp.uint32(374761393)
         + iy.astype(jnp.uint32) * jnp.uint32(668265263)
         + iz.astype(jnp.uint32) * jnp.uint32(2246822519))
    h = (h ^ (h >> 13)) * jnp.uint32(1274126177)
    return ((h ^ (h >> 16)) % 12).astype(jnp.int32)


def snoise3(x: jax.Array, y: jax.Array, z: jax.Array) -> jax.Array:
    """3D simplex noise in ~[-1, 1] (SimplexNoise::noise(x, y, z) analog):
    the standard skewed-tetrahedron traversal, branch-free (the reference's
    six-way rank comparison becomes boolean arithmetic)."""
    s = (x + y + z) * _F3
    i = jnp.floor(x + s)
    j = jnp.floor(y + s)
    k = jnp.floor(z + s)
    t = (i + j + k) * _G3
    x0 = x - (i - t)
    y0 = y - (j - t)
    z0 = z - (k - t)

    # Simplex corner ordering by coordinate ranking (branch-free form of
    # the reference's if-ladder).
    gx = ((x0 >= y0) & (x0 >= z0))
    gy = (~gx) & (y0 >= z0)
    gz = ~(gx | gy)
    i1 = gx.astype(x0.dtype)
    j1 = gy.astype(x0.dtype)
    k1 = gz.astype(x0.dtype)
    # Second-largest coordinate: not the smallest.
    sx = (x0 >= y0) | (x0 >= z0)
    sy = (y0 > x0) | (y0 >= z0)
    sz = (z0 > x0) | (z0 > y0)
    i2 = sx.astype(x0.dtype)
    j2 = sy.astype(x0.dtype)
    k2 = sz.astype(x0.dtype)

    x1 = x0 - i1 + _G3
    y1 = y0 - j1 + _G3
    z1 = z0 - k1 + _G3
    x2 = x0 - i2 + 2.0 * _G3
    y2 = y0 - j2 + 2.0 * _G3
    z2 = z0 - k2 + 2.0 * _G3
    x3 = x0 - 1.0 + 3.0 * _G3
    y3 = y0 - 1.0 + 3.0 * _G3
    z3 = z0 - 1.0 + 3.0 * _G3

    ii = i.astype(jnp.int32)
    jj = j.astype(jnp.int32)
    kk = k.astype(jnp.int32)

    def corner(cx, cy, cz, gi):
        t = 0.6 - cx * cx - cy * cy - cz * cz
        t = jnp.maximum(t, 0.0)
        g = _GRADS3[gi]
        return (t * t) * (t * t) * (g[..., 0] * cx + g[..., 1] * cy
                                    + g[..., 2] * cz)

    n0 = corner(x0, y0, z0, _hash3(ii, jj, kk))
    n1 = corner(x1, y1, z1, _hash3(ii + i1.astype(jnp.int32),
                                   jj + j1.astype(jnp.int32),
                                   kk + k1.astype(jnp.int32)))
    n2 = corner(x2, y2, z2, _hash3(ii + i2.astype(jnp.int32),
                                   jj + j2.astype(jnp.int32),
                                   kk + k2.astype(jnp.int32)))
    n3 = corner(x3, y3, z3, _hash3(ii + 1, jj + 1, kk + 1))
    return 32.0 * (n0 + n1 + n2 + n3)


def _fractal(noise_fn, coords, octaves, lacunarity, gain):
    total = jnp.zeros_like(jnp.asarray(coords[0], jnp.float32))
    amp = 1.0
    freq = 1.0
    norm = 0.0
    for _ in range(octaves):
        total = total + amp * noise_fn(*(c * freq for c in coords))
        norm += amp
        freq *= lacunarity
        amp *= gain
    return total / norm


def fractal1(x, octaves: int = 4, lacunarity: float = 2.0,
             gain: float = 0.5) -> jax.Array:
    """Fractal (fBm) sum of snoise1 — SimplexNoise::fractal(o, x) analog."""
    return _fractal(snoise1, (x,), octaves, lacunarity, gain)


def fractal2(x: jax.Array, y: jax.Array, octaves: int = 4,
             lacunarity: float = 2.0, gain: float = 0.5) -> jax.Array:
    """Fractal (fBm) sum of snoise2 — SimplexNoise::fractal analog."""
    return _fractal(snoise2, (x, y), octaves, lacunarity, gain)


def fractal3(x, y, z, octaves: int = 4, lacunarity: float = 2.0,
             gain: float = 0.5) -> jax.Array:
    """Fractal (fBm) sum of snoise3 — SimplexNoise::fractal(o, x, y, z)."""
    return _fractal(snoise3, (x, y, z), octaves, lacunarity, gain)
