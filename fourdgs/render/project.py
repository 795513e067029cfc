"""EWA projection: world-space 3D covariance -> screen-space conic + footprint.

Re-derivation of the per-vertex math in the reference's flagship shader
`Shader/Splats4D/Splat4DVertexShaderInstanced.GLSL:97-147` (identical in the
3D shader `Splat3DVertexShaderFull.GLSL:64-95` and the CPU mirror
`Splat.h:355-431`), vectorized over all splats at once.

With V3 = view[:3,:3] (row-major) and camera-space position (x, y, z), the
reference computes (de-transposing its column-major GLM literals):

    J_std = [[1/z, 0, -x/z^2],
             [0, 1/z, -y/z^2],          (GLSL :119-123)
             [0,   0,    0  ]]
    cov2  = (J_std V3) Sigma3 (J_std V3)^T   upper-left 2x2   (:125-130)

i.e. textbook EWA in NDC units (no focal-length scaling — the projection
matrix diagonal is applied when positioning the quad instead). The 2x2
eigendecomposition (:59-78) then yields the splat's screen frame:

    lambda_min/max = max(m -/+ sqrt(m^2 - p), 1e-6)
    v0 = normalize((b, lambda_min - a)),  v1 = perp(v0)
    conic = (R S S R^T)^{-1},  S = diag(sqrt(lambda))

A pixel at NDC offset delta from the splat center maps to the shader's
interpolated fragment coordinate x_f = 8 k, where

    k = (delta_x / P00, delta_y / P11)

(P00/P11 the projection diagonal; the factor 8 is the reference's fragment
footprint trick, GLSL :145-146 — the unit quad spans 1 sigma but fragment
coordinates are scaled 8x, giving a 4-sigma half-extent). The Gaussian weight
is exp(-0.5 x_f^T conic x_f), discarded below 1e-4 (Splat4DFragShader:30) and
clipped to the rasterized quad |k_eig,i| <= 0.5 * l_i.

Frustum cull (GLSL :108-115): drop the splat when z_ndc < 0 or > 1 or
|x_ndc|, |y_ndc| > 1.2 (note the asymmetric z test against the GL [-1, 1]
depth range — a reference quirk we reproduce).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from fourdgs.core.camera import Camera

# Reference constants.
LAMBDA_EPS = 1e-6          # eigenvalue clamp (GLSL :67)
CULL_BOUND = 1.2           # NDC xy cull bound (GLSL :109)
ALPHA_DISCARD = 1e-4       # fragment discard threshold (Splat4DFragShader:30)
FOOTPRINT_SCALE = 8.0      # fragment-coordinate scale (GLSL :146)


def eigen2x2(cov2: jax.Array):
    """Closed-form symmetric 2x2 eigendecomposition, matching the shader's
    GetEigenValues2x2/GetEigenVectors2x2 (GLSL :59-78) including the 1e-6
    clamp. Returns (lmin, lmax, v0) with v0 the unit eigenvector of lmin.

    The reference computes v0 = normalize((b, lmin - a)) with no guard: for
    b == 0 that vector can vanish and GLSL normalize(0) is undefined. We
    resolve the UB deterministically: fall back to the axis (1, 0) or (0, 1)
    matching the smaller diagonal entry.
    """
    a = cov2[..., 0, 0]
    b = cov2[..., 0, 1]
    c = cov2[..., 1, 1]
    m = 0.5 * (a + c)
    p = a * c - b * b
    # m^2 - p = ((a-c)/2)^2 + b^2 >= 0 for symmetric input; clamp for safe
    # sqrt gradients at the isotropic point.
    d = jnp.sqrt(jnp.maximum(m * m - p, 1e-24))
    lmin = jnp.maximum(m - d, LAMBDA_EPS)
    lmax = jnp.maximum(m + d, LAMBDA_EPS)
    v = jnp.stack([b, lmin - a], axis=-1)
    vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.where(
        (a <= c)[..., None],
        jnp.broadcast_to(jnp.asarray([1.0, 0.0], cov2.dtype), v.shape),
        jnp.broadcast_to(jnp.asarray([0.0, 1.0], cov2.dtype), v.shape),
    )
    v0 = jnp.where(vnorm > 1e-12, v / jnp.maximum(vnorm, 1e-30), fallback)
    return lmin, lmax, v0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Projected:
    """Structure-of-arrays of screen-space splats — the TPU-native analog of
    the vertex-shader outputs (oSig/oColor/oFragPos/oFaulty/oTimeOpacity).

    All fields have leading shape (N,). Lengths l are in the k-coordinate
    system (NDC offset divided by the projection diagonal); `eight_k` pixel
    evaluation happens in render/dense.py and the composite kernels.
    """
    mean_ndc: jax.Array    # (N, 2) splat center in NDC
    depth: jax.Array       # (N,) sort key: 1 / |mu(t) - cam| (Scenes.h:318)
    view_z: jax.Array      # (N,) camera-space -z (positive in front)
    v0: jax.Array          # (N, 2) unit eigenvector of lambda_min
    l0: jax.Array          # (N,) sqrt(lambda_min)
    l1: jax.Array          # (N,) sqrt(lambda_max)
    color: jax.Array       # (N, 4) rgba
    opacity: jax.Array     # (N,) temporal (or 1.0) opacity multiplier
    valid: jax.Array       # (N,) bool: survived frustum cull

    @property
    def count(self) -> int:
        return self.mean_ndc.shape[0]

    def half_extent_ndc(self, p00: jax.Array, p11: jax.Array):
        """Half extents (hx, hy) in NDC of the rasterized quad: the image of
        [-0.5, 0.5]^2 under k -> (P00, P11) * R S k. Used for tile binning."""
        v0x, v0y = self.v0[..., 0], self.v0[..., 1]
        # R columns: v0=(v0x, v0y), v1=(v0y, -v0x). |row| extents of R S.
        hx = 0.5 * (jnp.abs(v0x) * self.l0 + jnp.abs(v0y) * self.l1)
        hy = 0.5 * (jnp.abs(v0y) * self.l0 + jnp.abs(v0x) * self.l1)
        return hx * p00, hy * p11


def project_splats(mean3: jax.Array, cov3: jax.Array, color: jax.Array,
                   opacity: jax.Array, camera: Camera,
                   sort_mean3: Optional[jax.Array] = None) -> Projected:
    """Project N world-space 3D Gaussians to screen space (vectorized K5/K3).

    mean3 (N,3), cov3 (N,3,3), color (N,4), opacity (N,) — opacity is the 4D
    temporal term (1.0 for plain 3D splats). sort_mean3 optionally overrides
    the position used for the distance sort key (the reference sorts 4D
    scenes by the quirky SplatData::GetMeanInTime position, Scenes.h:317).
    """
    dtype = mean3.dtype
    view = camera.view_matrix().astype(dtype)
    proj = camera.proj_matrix().astype(dtype)
    v3 = view[:3, :3]

    # Camera-space and clip-space centers (GLSL :104-106).
    pos_cam = mean3 @ v3.T + view[:3, 3]
    pos_clip = pos_cam @ proj[:3, :3].T + proj[:3, 3]
    clip_w = -pos_cam[..., 2]  # proj row 3 = (0,0,-1,0)
    inv_w = 1.0 / clip_w
    ndc = pos_clip * inv_w[..., None]  # (N, 3)

    # Frustum cull (GLSL :108-115). posScreenSpace is already w-normalized in
    # the shader, so its z/w == ndc.z and bound == 1.2.
    z = ndc[..., 2]
    valid = ((z >= 0.0) & (z <= 1.0)
             & (jnp.abs(ndc[..., 0]) <= CULL_BOUND)
             & (jnp.abs(ndc[..., 1]) <= CULL_BOUND))

    # EWA: cov2 = (J V3) Sigma (J V3)^T, J rows = d(x/z, y/z)/d cam.
    x, y, zc = pos_cam[..., 0], pos_cam[..., 1], pos_cam[..., 2]
    # Guard z ~ 0 (behind/at camera, culled anyway) against inf/nan.
    zs = jnp.where(jnp.abs(zc) > 1e-6, zc, jnp.where(zc < 0, -1e-6, 1e-6))
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(inv_z)
    j = jnp.stack([
        jnp.stack([inv_z, zeros, -x * inv_z2], axis=-1),
        jnp.stack([zeros, inv_z, -y * inv_z2], axis=-1),
    ], axis=-2)  # (N, 2, 3)
    t_mat = j @ v3  # (N, 2, 3)
    cov2 = t_mat @ cov3 @ jnp.swapaxes(t_mat, -1, -2)  # (N, 2, 2)

    lmin, lmax, v0 = eigen2x2(cov2)

    # Depth sort key: 1 / euclidean distance of the (sort) mean to the camera
    # (Scenes.h:314-319). Ascending key == back-to-front painter order.
    sm = mean3 if sort_mean3 is None else sort_mean3
    dist = jnp.linalg.norm(sm - camera.position.astype(dtype), axis=-1)
    depth = 1.0 / jnp.maximum(dist, 1e-12)

    return Projected(
        mean_ndc=ndc[..., :2],
        depth=depth,
        view_z=-zc,
        v0=v0,
        l0=jnp.sqrt(lmin),
        l1=jnp.sqrt(lmax),
        color=color,
        opacity=jnp.broadcast_to(opacity, mean3.shape[:-1]).astype(dtype),
        valid=valid,
    )


def pixel_weight(proj2d: Projected, px: jax.Array, py: jax.Array,
                 p00: jax.Array, p11: jax.Array):
    """Gaussian weight of every (splat, pixel) pair plus the quad-coverage
    mask — the fragment-shader math (Splat4DFragShader.GLSL:16-30).

    px, py: pixel NDC coords with shape P... (any shape); splat fields (N,).
    Returns (weight, coverage) with shape (N,) + P.

    weight = exp(-0.5 * 64 * ((k_eig0 / l0)^2 + (k_eig1 / l1)^2)), i.e. the
    conic applied to x_f = 8 k in the splat eigenframe; coverage is the
    rasterized-quad clip |k_eig,i| <= 0.5 l_i AND weight >= 1e-4.
    """
    pshape = px.shape
    n = proj2d.count
    px = px.reshape((1,) + pshape)
    py = py.reshape((1,) + pshape)
    expand = (slice(None),) + (None,) * len(pshape)

    dx = (px - proj2d.mean_ndc[..., 0][expand]) / p00
    dy = (py - proj2d.mean_ndc[..., 1][expand]) / p11
    v0x = proj2d.v0[..., 0][expand]
    v0y = proj2d.v0[..., 1][expand]
    k0 = v0x * dx + v0y * dy        # component along v0 (lambda_min axis)
    k1 = v0y * dx - v0x * dy        # component along v1 = (v0y, -v0x)
    inv_l0 = 1.0 / proj2d.l0[expand]
    inv_l1 = 1.0 / proj2d.l1[expand]
    n0 = k0 * inv_l0
    n1 = k1 * inv_l1
    q = (FOOTPRINT_SCALE * FOOTPRINT_SCALE) * (n0 * n0 + n1 * n1)
    weight = jnp.exp(-0.5 * q)
    coverage = (jnp.abs(n0) <= 0.5) & (jnp.abs(n1) <= 0.5) & (weight >= ALPHA_DISCARD)
    return weight, coverage
