"""Quaternion / rotation helpers shared by the covariance builders.

Quaternions are stored (w, x, y, z), matching glm::quat memory order used all
over the reference (`Splat.h:91-160`). All functions are batched: a leading
`...` batch shape is supported everywhere, and everything is differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def quat_normalize(q: jax.Array) -> jax.Array:
    return normalize(q)


def quat_to_mat3(q: jax.Array) -> jax.Array:
    """Rotation matrix of a (w,x,y,z) quaternion — glm::toMat3 (Splat.h:141,341).

    Matches GLM's mat3_cast: assumes q is normalized.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
    ], axis=-2)
    return m


def mat3_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix -> (w,x,y,z) quaternion, branch-free for jit.

    Computes all four of GLM's quat_cast branches and selects the one keyed by
    the largest diagonal combination — numerically equivalent to
    glm::quat_cast but expressed with jnp.where so it traces.
    """
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    # Candidate squared magnitudes (times 4) of w, x, y, z.
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # Branch w
    sw = safe_sqrt(tw) * 0.5
    qw = jnp.stack([sw,
                    (m[..., 2, 1] - m[..., 1, 2]) / (4 * sw),
                    (m[..., 0, 2] - m[..., 2, 0]) / (4 * sw),
                    (m[..., 1, 0] - m[..., 0, 1]) / (4 * sw)], axis=-1)
    # Branch x
    sx = safe_sqrt(tx) * 0.5
    qx = jnp.stack([(m[..., 2, 1] - m[..., 1, 2]) / (4 * sx),
                    sx,
                    (m[..., 0, 1] + m[..., 1, 0]) / (4 * sx),
                    (m[..., 0, 2] + m[..., 2, 0]) / (4 * sx)], axis=-1)
    # Branch y
    sy = safe_sqrt(ty) * 0.5
    qy = jnp.stack([(m[..., 0, 2] - m[..., 2, 0]) / (4 * sy),
                    (m[..., 0, 1] + m[..., 1, 0]) / (4 * sy),
                    sy,
                    (m[..., 1, 2] + m[..., 2, 1]) / (4 * sy)], axis=-1)
    # Branch z
    sz = safe_sqrt(tz) * 0.5
    qz = jnp.stack([(m[..., 1, 0] - m[..., 0, 1]) / (4 * sz),
                    (m[..., 0, 2] + m[..., 2, 0]) / (4 * sz),
                    (m[..., 1, 2] + m[..., 2, 1]) / (4 * sz),
                    sz], axis=-1)

    best = jnp.argmax(jnp.stack([tw, tx, ty, tz], axis=-1), axis=-1)
    out = jnp.where((best == 0)[..., None], qw,
          jnp.where((best == 1)[..., None], qx,
          jnp.where((best == 2)[..., None], qy, qz)))
    return quat_normalize(out)


def quat_look_at(direction: jax.Array, up: jax.Array) -> jax.Array:
    """glm::quatLookAt for a right-handed system (used in every scene
    generator, e.g. Scenes.h:267): rotation whose -Z axis is `direction`."""
    return mat3_to_quat(look_rotation(direction, up))


def look_rotation(direction: jax.Array, up: jax.Array) -> jax.Array:
    """Rotation matrix with columns (right, up', -direction) — the matrix form
    of glm::quatLookAt(direction, up)."""
    col2 = -normalize(direction)
    col0 = normalize(jnp.cross(jnp.broadcast_to(up, col2.shape), col2))
    col1 = jnp.cross(col2, col0)
    return jnp.stack([col0, col1, col2], axis=-1)


def rotate_about_axis(v: jax.Array, angle_rad: jax.Array, axis: jax.Array) -> jax.Array:
    """glm::rotate(vec, angle, axis) — Rodrigues rotation (used by the
    NonLinear/Rotation/Combined scene path generators, Scenes.h:519-536)."""
    k = normalize(axis)
    c = jnp.cos(angle_rad)[..., None]
    s = jnp.sin(angle_rad)[..., None]
    return v * c + jnp.cross(k, v) * s + k * jnp.sum(k * v, axis=-1, keepdims=True) * (1.0 - c)


def rotation_2d(angle_rad: jax.Array) -> jax.Array:
    """2x2 rotation matrix matching the reference's 2D scene construction
    `glm::mat2 R{cos, -sin, sin, cos}` (Scenes.h:1493). GLM fills columns, so
    the math matrix is [[c, s], [-s, c]]."""
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    row0 = jnp.stack([c, s], axis=-1)
    row1 = jnp.stack([-s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)
