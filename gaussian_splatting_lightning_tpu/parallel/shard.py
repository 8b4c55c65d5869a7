"""Tile- and view-sharded rendering/training over a device mesh.

The multi-chip design (SURVEY §2.3 "consequence", BASELINE north star):
splats replicated; image tile rows sharded over the "tile" mesh axis (each
chip bins + composites a horizontal band); training views sharded over the
"view" axis (data parallel). Per step:

  1. every device runs the (cheap, embarrassingly parallel) per-splat
     preprocess on the full replicated splat set;
  2. binning + compositing only for the device's tile band of its view group's
     camera — the expensive stage, perfectly divided;
  3. rendered bands are all-gathered along the tile ring (ICI) to evaluate
     the windowed SSIM on the full image;
  4. parameter gradients are combined with one psum over ("view", "tile") —
     XLA overlaps the reduction with the remaining compositing backward;
  5. the Adam update runs replicated, keeping every device's state identical.

No NCCL/MPI translation — the collectives are the shard_map primitives.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gaussian_splatting_lightning_tpu.core.camera import Camera
from gaussian_splatting_lightning_tpu.models import gaussians as gm
from gaussian_splatting_lightning_tpu.ops.common import BLOCK_Y
from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import (
    TilingConfig,
    rasterize_tiled,
)
from gaussian_splatting_lightning_tpu.training.densify import accumulate_stats
from gaussian_splatting_lightning_tpu.training.loss import photometric_loss
from gaussian_splatting_lightning_tpu.training.optimizer import (
    adam_update,
    make_lr_schedules,
)


def _band_geometry(height: int, n_tile: int):
    grid_y = (height + BLOCK_Y - 1) // BLOCK_Y
    gy_local = -(-grid_y // n_tile)  # pad so every device owns an equal band
    return grid_y, gy_local


def sharded_render(
    scene: gm.GaussianScene,
    camera: Camera,
    width: int,
    height: int,
    background: jnp.ndarray,
    mesh: Mesh,
    tiling: TilingConfig = TilingConfig(),
    antialias: bool = False,
):
    """Render one view with tiles sharded across the whole mesh (both axes
    act as one tile ring). Returns the full (3, H, W) image, replicated."""
    n_dev = mesh.devices.size
    _, gy_local = _band_geometry(height, n_dev)

    def device_fn(scene):
        ax_v = jax.lax.axis_index("view")
        ax_t = jax.lax.axis_index("tile")
        band_idx = ax_v * jax.lax.axis_size("tile") + ax_t
        out, _ = rasterize_tiled(
            scene.params.xyz, scene.get_opacity(), scene.get_scales(),
            scene.get_rotation(), scene.get_features(), camera, width, height,
            background, scene.active_sh_degree, config=tiling,
            max_sh_degree=scene.max_sh_degree, antialias=antialias,
            alive=scene.alive,
            tile_y_offset=band_idx * gy_local, grid_y_local=gy_local,
        )
        bands = jax.lax.all_gather(
            out.image, ("view", "tile"), axis=1, tiled=True
        )
        return bands[:, :height], out.radii, jax.lax.all_gather(
            out.depth, ("view", "tile"), axis=1, tiled=True
        )[:, :height]

    image, radii, depth = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(),), out_specs=(P(), P(), P()), check_vma=False,
    )(scene)
    return image, radii, depth


def make_sharded_train_step(
    cfg,  # TrainConfig
    spatial_scale: float,
    width: int,
    height: int,
    mesh: Mesh,
):
    """Build the jitted multi-device train step.

    Inputs: cameras/images/backgrounds carry a leading global batch dim
    B = mesh 'view' size x local batch, sharded over 'view'; scene and Adam
    state are replicated and returned replicated.
    """
    from gaussian_splatting_lightning_tpu.training.trainer import (
        resolve_rasterizer,
    )

    schedules = make_lr_schedules(cfg.optimizer, spatial_scale)
    rasterize_fn = resolve_rasterizer(getattr(cfg, "rasterizer", "auto"))
    n_tile = mesh.shape["tile"]
    n_view = mesh.shape["view"]
    _, gy_local = _band_geometry(height, n_tile)

    def device_fn(scene, adam, step, cameras, images, backgrounds):
        # leading dim of cameras/images here is B_local = B / n_view
        ax_t = jax.lax.axis_index("tile")
        b_local = images.shape[0]
        b_global = n_view * b_local
        offset0 = jnp.zeros(
            (b_local, scene.capacity, 2), scene.params.xyz.dtype
        )

        def loss_fn(params, offsets):
            live = dataclasses.replace(scene, params=params)

            def render_one(cam, bg, offset):
                out, stats = rasterize_fn(
                    live.params.xyz, live.get_opacity(), live.get_scales(),
                    live.get_rotation(), live.get_features(), cam, width,
                    height, bg, live.active_sh_degree, config=cfg.tiling,
                    max_sh_degree=live.max_sh_degree, antialias=cfg.antialias,
                    alive=live.alive, means2d_ndc_offset=offset,
                    tile_y_offset=ax_t * gy_local, grid_y_local=gy_local,
                )
                return out.image, out.radii, stats["num_dropped_pairs"]

            bands, radii, dropped = jax.vmap(render_one)(
                cameras, backgrounds, offsets
            )  # bands: (B_local, 3, band_h, W)
            # Full image per device, but with a *collective-free gradient
            # path*: gather the ring's bands without gradients, then splice
            # this device's live band back in. The loss VALUE is the true
            # full-image loss (SSIM windows cross band seams correctly),
            # while its gradient flows only through local compute — every
            # pixel's gradient is produced by exactly one device, so the
            # cross-device combination below is a plain psum of partials
            # with no reliance on collective-transpose conventions.
            band_h = bands.shape[2]
            gathered = jax.lax.all_gather(
                jax.lax.stop_gradient(bands), "tile", axis=2, tiled=True
            )
            full = jax.lax.dynamic_update_slice_in_dim(
                gathered, bands, ax_t * band_h, axis=2
            )
            full = full[:, :, :height]

            losses, logs = jax.vmap(
                lambda img, tgt: photometric_loss(img, tgt, cfg.w_ssim)
            )(full, images)
            loss_local = jnp.mean(losses)  # over the device's local views
            logs = jax.tree.map(lambda x: jnp.mean(x), logs)
            return loss_local, (radii, logs, jnp.sum(dropped))

        grads, (radii, logs, dropped) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(scene.params, offset0)
        param_grads, screen_grads = grads
        # d(batch-mean loss)/d(params): each device's partial is
        # (1/b_local) * d loss_v / d theta restricted to its band; summing the
        # ring reassembles each view's full gradient, summing views and
        # dividing by n_view yields the global batch mean.
        param_grads = jax.tree.map(
            lambda g: jax.lax.psum(g, ("view", "tile")) / n_view, param_grads
        )
        # per-view screen-space signal: the reference accumulates the gradient
        # of each view's *own* loss (gs_lightning_module.py:175-178), so undo
        # the 1/b_local from the local mean; no batch-size dependence remains.
        screen_grads = jax.lax.psum(screen_grads, "tile") * b_local

        new_params, adam = adam_update(
            scene.params, param_grads, adam, schedules, cfg.optimizer, step
        )
        scene = dataclasses.replace(scene, params=new_params)

        # densification statistics: per-view contributions combined across
        # the batch; identical on every device afterwards
        seen = radii > 0  # (B_local, C)
        norms = jnp.linalg.norm(screen_grads[..., :2], axis=-1)  # (B_local, C)
        d_accum = jax.lax.psum(
            jnp.sum(jnp.where(seen, norms, 0.0), axis=0), "view"
        )
        d_count = jax.lax.psum(
            jnp.sum(seen.astype(jnp.float32), axis=0), "view"
        )
        max_radii = jax.lax.pmax(jnp.max(radii, axis=0), "view")
        scene = dataclasses.replace(
            scene,
            max_radii2d=jnp.maximum(scene.max_radii2d, max_radii),
            grad_accum=scene.grad_accum + d_accum,
            grad_count=scene.grad_count + d_count,
        )
        logs = dict(logs)
        logs = {k: jax.lax.pmean(v, ("view", "tile")) for k, v in logs.items()}
        logs["n_gaussians"] = scene.n_alive()
        logs["num_dropped_pairs"] = jax.lax.psum(dropped, ("view", "tile"))
        return scene, adam, logs

    sharded = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P("view"), P("view"), P("view")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def batch_cameras(views) -> Camera:
    """Stack host-side ViewItems into a batched Camera pytree."""
    import numpy as np

    return Camera(
        viewmatrix=jnp.asarray(np.stack([v.viewmatrix for v in views])),
        projmatrix=jnp.asarray(np.stack([v.projmatrix for v in views])),
        campos=jnp.asarray(np.stack([v.campos for v in views])),
        tanfovx=jnp.asarray(np.stack([np.float32(v.tanfovx) for v in views])),
        tanfovy=jnp.asarray(np.stack([np.float32(v.tanfovy) for v in views])),
    )
