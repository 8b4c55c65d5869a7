"""Production tiled rasterizer, XLA path: fixed shapes, differentiable,
single compiled program.

Pipeline: shared preprocess (ops/common.py) -> tile binning (ops/binning.py)
-> per-tile front-to-back compositing over a (tiles, capacity) member table,
scanned in depth-ordered chunks with rematerialization (memory stays
O(tiles * pixels * chunk) while gradients recompute per chunk).

This is also the multi-chip building block: under shard_map each device runs
this on its slice of tile rows (see parallel/).

The Pallas kernel path (ops/rasterize_pallas.py) shares preprocess + binning
and replaces only the compositing stage.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.core.camera import Camera
from gaussian_splatting_lightning_tpu.ops import binning
from gaussian_splatting_lightning_tpu.ops.common import (
    ALPHA_CLAMP,
    ALPHA_THRESHOLD,
    BLOCK_X,
    BLOCK_Y,
    TRANSMITTANCE_EPS,
    Preprocessed,
    RenderOutput,
    preprocess,
)


@dataclasses.dataclass(frozen=True)
class TilingConfig:
    """Static shape budgets (compile-time constants)."""

    max_pairs: int = 1 << 18  # (splat, tile) duplication budget
    tile_capacity: int = 1024  # deepest splats beyond this are dropped per tile
    chunk: int = 64  # splats composited per scan step
    # Tile edge in pixels. None = per-path default: 16 for the XLA/oracle
    # paths (the reference's CUDA-block-shaped spec, rasterize.py:19-20),
    # 32 for the Pallas path — TPU routing (expansion/sort/gather) costs
    # scale with the pair count, which shrinks ~2x at 32px tiles, while the
    # extra per-pair blend area lands on the MXU where it is nearly free.
    block: int | None = None
    # Route per-pair cotangents (bwd compositor -> permute -> segment-reduce)
    # in bfloat16 with f32 accumulation (Pallas path only). Halves the
    # HBM-bound backward routing; per-splat sums stay f32 on the MXU.
    pair_grad_bf16: bool = True

    def resolve_block(self, impl: str) -> int:
        return self.block or (32 if impl == "pallas" else 16)


def composite_tiles_tabled(
    prep: Preprocessed,
    table: jnp.ndarray,  # (T, K) pair indices, -1 padded
    pair_gaussian: jnp.ndarray,  # (M,)
    grid_x: int,
    grid_y: int,
    background: jnp.ndarray,
    chunk: int,
    tile_y_offset=0,
):
    n_tiles, capacity = table.shape
    p = BLOCK_X * BLOCK_Y
    dtype = prep.p_pix.dtype

    # Member gaussian index per table slot (-1 padding -> index 0, masked out).
    gidx = jnp.where(table >= 0, pair_gaussian[jnp.clip(table, 0)], 0)
    slot_valid = table >= 0

    # Pixel centers per tile, (T, P, 2). ``tile_y_offset`` shifts the band
    # into global pixel coordinates for tile-sharded rendering.
    tx = jnp.arange(grid_x, dtype=dtype) * BLOCK_X
    ty = (jnp.arange(grid_y, dtype=dtype) + tile_y_offset) * BLOCK_Y
    origin = jnp.stack(
        [jnp.tile(tx, grid_y), jnp.repeat(ty, grid_x)], axis=-1
    )  # (T, 2)
    dy, dx = jnp.meshgrid(
        jnp.arange(BLOCK_Y, dtype=dtype), jnp.arange(BLOCK_X, dtype=dtype),
        indexing="ij",
    )
    offs = jnp.stack([dx, dy], -1).reshape(-1, 2)  # (P, 2) as (x, y)
    coords = origin[:, None, :] + offs[None, :, :]  # (T, P, 2)

    inv_depth = 1.0 / prep.depth

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def step(carry, chunk_cols):
        color, invd, trans = carry  # (T,P,3), (T,P), (T,P)
        idx = jax.lax.dynamic_slice_in_dim(gidx, chunk_cols, chunk, axis=1)
        valid = jax.lax.dynamic_slice_in_dim(slot_valid, chunk_cols, chunk, axis=1)
        pos = prep.p_pix[idx]  # (T, C, 2)
        con = prep.conic[idx]  # (T, C, 3)
        rgb = prep.rgb[idx]  # (T, C, 3)
        op = prep.opacity[idx]  # (T, C)
        ivd = inv_depth[idx]  # (T, C)

        d = pos[:, None, :, :] - coords[:, :, None, :]  # (T, P, C, 2)
        power = -0.5 * (
            con[:, None, :, 0] * d[..., 0] * d[..., 0]
            + 2.0 * con[:, None, :, 1] * d[..., 0] * d[..., 1]
            + con[:, None, :, 2] * d[..., 1] * d[..., 1]
        )
        alpha = jnp.minimum(jnp.exp(power) * op[:, None, :], ALPHA_CLAMP)
        alpha = jnp.where(
            valid[:, None, :] & (alpha > ALPHA_THRESHOLD), alpha, 0.0
        )  # (T, P, C)
        one_minus = 1.0 - alpha
        cp = jnp.cumprod(one_minus, axis=-1)
        t_in = trans[..., None] * (cp / one_minus)  # exclusive; alpha <= 0.99
        w = jnp.where(t_in > TRANSMITTANCE_EPS, alpha * t_in, 0.0)
        color = color + jnp.einsum("tpc,tcr->tpr", w, rgb)
        invd_new = invd + jnp.einsum("tpc,tc->tp", w, ivd)
        trans_new = trans * cp[..., -1]
        return (color, invd_new, trans_new), None

    init = (
        jnp.zeros((n_tiles, p, 3), dtype),
        jnp.zeros((n_tiles, p), dtype),
        jnp.ones((n_tiles, p), dtype),
    )
    n_chunks = capacity // chunk
    (color, invd, trans), _ = jax.lax.scan(
        step, init, jnp.arange(n_chunks) * chunk
    )
    color = color + trans[..., None] * background[None, None, :]
    return color, invd


def _assemble(canvas_tiles, grid_x, grid_y, width, height, channels=None,
              block_x=BLOCK_X, block_y=BLOCK_Y):
    if channels is None:
        t = canvas_tiles.reshape(grid_y, grid_x, block_y, block_x)
        t = t.transpose(0, 2, 1, 3).reshape(grid_y * block_y, grid_x * block_x)
        return t[:height, :width]
    t = canvas_tiles.reshape(grid_y, grid_x, block_y, block_x, channels)
    t = t.transpose(0, 2, 1, 3, 4).reshape(
        grid_y * block_y, grid_x * block_x, channels
    )
    return t[:height, :width]


def rasterize_tiled(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    sh: jnp.ndarray,
    camera: Camera,
    width: int,
    height: int,
    background: jnp.ndarray,
    sh_degree,
    config: TilingConfig = TilingConfig(),
    max_sh_degree: Optional[int] = None,
    scale_modifier: float = 1.0,
    antialias: bool = False,
    alive: Optional[jnp.ndarray] = None,
    means2d_ndc_offset: Optional[jnp.ndarray] = None,
    tile_y_offset=0,
    grid_y_local: Optional[int] = None,
    prep=None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
):
    """Returns (RenderOutput, stats dict). Same semantics as
    rasterize_reference with reference_quirks=False (CUDA visibility rules).

    ``tile_y_offset`` (traced ok) + ``grid_y_local`` (static) render only a
    band of tile rows — the tile-sharding unit. The returned image then has
    height ``grid_y_local * 16`` (clipped to the band's extent within the
    full image).

    ``prep``: an externally computed ``Preprocessed`` — the tile-sharded
    step preprocesses each device's splat shard and all-gathers the compact
    per-splat outputs so the O(capacity) preprocess divides across the mesh
    (parallel/shard.py); single-device callers leave it None.
    """
    if prep is None:
        prep = preprocess(
            means3d, opacities, scales, quats, sh, camera, width, height,
            sh_degree, max_sh_degree, scale_modifier, antialias, alive,
            means2d_ndc_offset, colors_precomp, cov3d_precomp,
        )
    grid_x, grid_y = binning.grid_shape(width, height)
    banded = grid_y_local is not None
    gy = grid_y_local if banded else grid_y
    n_tiles = grid_x * gy

    bins = binning.build_tile_bins(
        prep, grid_x, grid_y, config.max_pairs, tile_y_offset, gy
    )
    table = binning.build_tile_table(bins, n_tiles, config.tile_capacity)
    max_tile_count = jnp.max(bins.tile_count)

    color, invd = composite_tiles_tabled(
        prep, table, bins.pair_gaussian, grid_x, gy, background,
        config.chunk, tile_y_offset,
    )
    out_h = gy * BLOCK_Y if banded else height
    image = _assemble(color, grid_x, gy, width, out_h, 3)
    depth = _assemble(invd, grid_x, gy, width, out_h)
    out = RenderOutput(
        image=jnp.moveaxis(image, -1, 0), radii=prep.radius, depth=depth[None]
    )
    stats = {
        "num_pairs": bins.num_pairs,
        "num_dropped_pairs": bins.num_dropped,
        "max_tile_count": max_tile_count,
        "num_tile_overflow": jnp.maximum(
            max_tile_count - config.tile_capacity, 0
        ),
        "num_visible": jnp.sum(prep.visible.astype(jnp.int32)),
    }
    return out, stats
