"""Multi-chip sharded rendering and training (shard_map over a ("data",
"tile") mesh).

This is the component inventory row the reference lacks entirely (SURVEY.md
section 2.4): its scaling story is one SSBO + the GL rasterizer on a single
GPU. Here:

  * splat parameters are sharded over the "data" axis (each device projects
    its shard — the parameter-heavy stage),
  * compact projected records are all-gathered over "data" (ICI),
  * every device owns a disjoint slice of image tiles (tiles partitioned
    over the flattened mesh) and composites only those,
  * in training, gradients flow backward through the all_gather as an
    AD-inserted reduce-scatter, and the scalar loss is psum'd over the whole
    mesh — the standard "annotate shardings, let XLA/AD place collectives"
    recipe.

Everything is one jit; there is no host in the loop.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from fourdgs.core.camera import Camera
from fourdgs.parallel.mesh import DATA_AXIS, TILE_AXIS, pad_to_multiple
from fourdgs.render.pipeline import (RenderConfig, _composite_pallas_progressive,
                                     _composite_tiles_xla, _gather_tile_lists)
from fourdgs.render.project import project_splats
from fourdgs.render.sort import front_to_back_order
from fourdgs.render.tiles import bin_splats, tile_grid, tile_pixel_ndc
from fourdgs.splats.gaussians import Splats4D, mean_in_time_sortkey

MESH_AXES = (DATA_AXIS, TILE_AXIS)


def _all_gather_tree(tree, axis_name):
    return jax.tree_util.tree_map(
        lambda a: jax.lax.all_gather(a, axis_name, axis=0, tiled=True), tree)


def _device_linear_index(mesh: Mesh) -> jax.Array:
    d = jax.lax.axis_index(DATA_AXIS)
    t = jax.lax.axis_index(TILE_AXIS)
    return d * mesh.shape[TILE_AXIS] + t


def _render_my_tiles(splats: Splats4D, t, camera: Camera, cfg: RenderConfig,
                     mesh: Mesh, min_opacity, tiles_per_device: int):
    """Device-local body: project my splat shard, all_gather records, bin and
    composite my tile slice. Returns (tiles_per_device, P, 4)."""
    dtype = splats.position.dtype
    sliced, top = splats.at_time(t, min_opacity)
    sort_mean = mean_in_time_sortkey(splats.position, splats.cov, t)
    proj_local = project_splats(sliced.position, sliced.cov, sliced.color,
                                top, camera, sort_mean3=sort_mean)
    proj = _all_gather_tree(proj_local, DATA_AXIS)

    pmat = camera.proj_matrix().astype(dtype)
    p00, p11 = pmat[0, 0], pmat[1, 1]
    w, h = camera.width, camera.height
    order = front_to_back_order(proj.depth)
    proj = jax.tree_util.tree_map(lambda a: a[order], proj)
    # Bin only this device's tile window: pairs outside it die before the
    # sort, and the CSR/gather/composite are all local-size — per-device
    # tile work scales 1/n_devices instead of every device re-binning the
    # whole image.
    my = _device_linear_index(mesh) * tiles_per_device
    binning = bin_splats(proj, p00, p11, w, h,
                         tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                         max_tiles_per_splat=cfg.max_tiles_per_splat,
                         tile_range=(my, tiles_per_device))
    px, py, _ = tile_pixel_ndc(w, h, cfg.tile_h, cfg.tile_w, dtype)
    take = lambda a: jax.lax.dynamic_slice_in_dim(a, my, tiles_per_device, 0)
    # Pad the pixel-coordinate arrays so every device's slice is in range.
    n_total = mesh.shape[DATA_AXIS] * mesh.shape[TILE_AXIS]
    tt_pad = tiles_per_device * n_total

    def padt(a):
        short = tt_pad - a.shape[0]
        if short <= 0:
            return a
        return jnp.pad(a, [(0, short)] + [(0, 0)] * (a.ndim - 1))
    px, py = padt(px), padt(py)

    if cfg.backend == "pallas":
        # Same progressive-deepening compositor as the unsharded path
        # (per-tile slab counters over the local window CSR), so sharded
        # and unsharded configs agree for any deepening_passes.
        tiles = _composite_pallas_progressive(
            proj, binning, take(px), take(py), p00, p11,
            jnp.asarray(cfg.background, dtype), cfg)
    else:
        tile_splat, tile_live = _gather_tile_lists(proj, binning, cfg, None)
        tiles = _composite_tiles_xla(
            proj, tile_splat, tile_live, take(px), take(py),
            p00, p11, jnp.asarray(cfg.background, dtype), cfg.splat_chunk)
    return tiles


def render_splats4d_sharded(splats: Splats4D, camera: Camera, t,
                            mesh: Mesh, min_opacity=0.0,
                            cfg: RenderConfig = RenderConfig()) -> jax.Array:
    """Sharded forward render. `splats` arrays must be sharded (or shardable)
    along axis 0 over the "data" axis; returns the assembled (H, W, 4) image
    (sharded over tiles internally, gathered at assembly)."""
    n_total = mesh.shape[DATA_AXIS] * mesh.shape[TILE_AXIS]
    ny, nx = tile_grid(camera.width, camera.height, cfg.tile_h, cfg.tile_w)
    tiles_per_device = -(-ny * nx // n_total)

    splats = jax.tree_util.tree_map(
        lambda a: pad_to_multiple(a, mesh.shape[DATA_AXIS]), splats)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS),),
             out_specs=P((DATA_AXIS, TILE_AXIS)),
             check_vma=False)
    def body(sp):
        return _render_my_tiles(sp, t, camera, cfg, mesh, min_opacity,
                                tiles_per_device)

    tiles = body(splats)  # (tt_pad, P, 4) sharded over tiles
    from fourdgs.render.tiles import assemble_image
    return assemble_image(tiles[: ny * nx], camera.width, camera.height,
                          cfg.tile_h, cfg.tile_w)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def materialize_splats(params: Dict[str, jax.Array]) -> Splats4D:
    """Raw trainable parameter pytree -> Splats4D (motion parameterization,
    Splat4D ctor B). Scales/lifetime are kept positive via softplus-free
    abs+eps (cheap, monotone)."""
    scale = jnp.abs(params["scale3"]) + 1e-4
    lifetime = jnp.abs(params["lifetime"]) + 1e-4
    fade = jnp.clip(params["fade"], 1e-3, 1.0 - 1e-3)
    color = jnp.clip(params["color"], 0.0, 1.0)
    return Splats4D.from_motion(params["position4"], params["quat"], scale,
                                lifetime, fade, params["velocity"], color)


def splats_to_params(position4, quat, scale3, lifetime, fade, velocity,
                     color) -> Dict[str, jax.Array]:
    return dict(position4=jnp.asarray(position4), quat=jnp.asarray(quat),
                scale3=jnp.asarray(scale3), lifetime=jnp.asarray(lifetime),
                fade=jnp.asarray(fade), velocity=jnp.asarray(velocity),
                color=jnp.asarray(color))


def make_sharded_loss(camera: Camera, mesh: Mesh,
                      cfg: RenderConfig = RenderConfig(), min_opacity=0.0):
    """Photometric L2 between the sharded render and a target image.

    Returns loss_fn(params_sharded, target_hw4, t) -> replicated scalar.
    Differentiable: jax.grad(loss_fn) yields grads sharded like params, with
    the cross-device reductions (reduce-scatter of record grads over "data",
    psum of the scalar) inserted by AD.
    """
    n_total = mesh.shape[DATA_AXIS] * mesh.shape[TILE_AXIS]
    ny, nx = tile_grid(camera.width, camera.height, cfg.tile_h, cfg.tile_w)
    tiles_per_device = -(-ny * nx // n_total)
    tt_pad = tiles_per_device * n_total
    h, w = camera.height, camera.width
    th, tw = cfg.tile_h, cfg.tile_w

    def tiles_of(img):
        """(H, W, 4) -> (ny*nx, P, 4) tile view, padded to tt_pad."""
        img = jnp.pad(img, ((0, ny * th - h), (0, nx * tw - w), (0, 0)))
        tl = img.reshape(ny, th, nx, tw, 4).transpose(0, 2, 1, 3, 4)
        tl = tl.reshape(ny * nx, th * tw, 4)
        return pad_to_multiple(tl, tt_pad)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS), P(), P()),
             out_specs=P(),
             check_vma=False)
    def loss_fn(params_shard, target, t):
        splats = materialize_splats(params_shard)
        my_tiles = _render_my_tiles(splats, t, camera, cfg, mesh, min_opacity,
                                    tiles_per_device)
        tgt = tiles_of(target)
        my = _device_linear_index(mesh) * tiles_per_device
        tgt_my = jax.lax.dynamic_slice_in_dim(tgt, my, tiles_per_device, 0)
        local = jnp.sum((my_tiles[..., :3] - tgt_my[..., :3]) ** 2)
        total = jax.lax.psum(local, MESH_AXES)
        return total / (h * w * 3)

    return loss_fn


def make_sharded_train_step(camera: Camera, mesh: Mesh, optimizer,
                            cfg: RenderConfig = RenderConfig(),
                            min_opacity=0.0):
    """One full differentiable-rendering training step: render -> L2 ->
    grads (reduce-scattered to shards) -> optax update. jit-ready; all
    collectives ride the mesh."""
    loss_fn = make_sharded_loss(camera, mesh, cfg, min_opacity)

    def train_step(params, opt_state, target, t):
        loss, grads = jax.value_and_grad(loss_fn)(params, target, t)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
