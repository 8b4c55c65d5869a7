"""The jnp oracle rasterizer: slow, readable, differentiable, CPU-runnable.

This is our equivalent of the reference's pure-PyTorch rasterizer
(``gs_lightning/rasterize/rasterize.py``) — the executable specification that
the fast tiled/Pallas implementations are verified against (BASELINE config 1:
forward + backward allclose). It is pure jnp, fixed-shape, and JAX-AD
differentiable end to end.

Semantics note (``reference_quirks``): the reference zeroes the radius of
culled splats (rasterize.py:80) but then computes tile membership from that
zeroed radius (rasterize.py:94, 129-152) — a radius-0 rect still covers one
tile, so culled splats *do* composite in the reference. The CUDA rasterizer
excludes them (tiles_touched stays 0 on the early frustum exit). We default to
the CUDA/production semantics (membership requires visibility) and reproduce
the reference quirk behind ``reference_quirks=True`` for parity tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.core import transforms as tf
from gaussian_splatting_lightning_tpu.core.camera import Camera
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


def mark_visible(
    means3d: jnp.ndarray, viewmatrix: jnp.ndarray, projmatrix: jnp.ndarray
) -> jnp.ndarray:
    """Parity with reference ``rasterize.py:23-26`` / CUDA ``markVisible``."""
    p_view = tf.apply_extrinsic(means3d, viewmatrix)
    del projmatrix  # the reference computes but ignores the projection
    return tf.in_frustum(p_view)


def composite_tiles_dense(
    prep: Preprocessed,
    member: jnp.ndarray,  # (T, N) bool tile membership
    order: jnp.ndarray,  # (N,) depth-ascending permutation
    width: int,
    height: int,
    background: jnp.ndarray,  # (3,)
    grid_x: int,
    grid_y: int,
):
    """Front-to-back alpha compositing, one tile at a time (lax.map).

    Spec: reference ``rasterize.py:210-261`` (render_tile_noloop), vectorized:
    non-member / sub-threshold alphas are zeroed, which contributes a factor
    of 1 to the transmittance cumprod — identical math to gathering members.
    """
    p_pix = prep.p_pix[order]
    conic = prep.conic[order]
    rgb = prep.rgb[order]
    opacity = prep.opacity[order]
    depth = prep.depth[order]
    member = member[:, order]

    ys = jnp.arange(BLOCK_Y, dtype=p_pix.dtype)
    xs = jnp.arange(BLOCK_X, dtype=p_pix.dtype)
    tile_dy, tile_dx = jnp.meshgrid(ys, xs, indexing="ij")
    tile_dyx = jnp.stack([tile_dx, tile_dy], -1).reshape(-1, 2)  # (P, 2) x,y

    def render_one_tile(args):
        tile_x, tile_y, m = args  # scalars, (N,)
        origin = jnp.stack(
            [tile_x * BLOCK_X, tile_y * BLOCK_Y]
        ).astype(p_pix.dtype)
        coords = tile_dyx + origin[None, :]  # (P, 2)
        d = p_pix[None, :, :] - coords[:, None, :]  # (P, N, 2)
        power = -0.5 * (
            conic[None, :, 0] * d[..., 0] * d[..., 0]
            + 2.0 * conic[None, :, 1] * d[..., 0] * d[..., 1]
            + conic[None, :, 2] * d[..., 1] * d[..., 1]
        )
        alpha = jnp.minimum(jnp.exp(power) * opacity[None, :], ALPHA_CLAMP)
        alpha = jnp.where(m[None, :] & (alpha > ALPHA_THRESHOLD), alpha, 0.0)
        # Exclusive cumulative transmittance along the depth-sorted axis.
        t_excl = jnp.cumprod(1.0 - alpha, axis=1) / (1.0 - alpha)
        # Numerically the reference computes cumprod with a leading 1 row; the
        # division form is AD-friendly but 0/0-prone when alpha == ALPHA_CLAMP
        # is impossible (alpha <= 0.99) so 1 - alpha >= 0.01 > 0.
        w = jnp.where(t_excl > TRANSMITTANCE_EPS, alpha * t_excl, 0.0)
        t_final = t_excl[:, -1] * (1.0 - alpha[:, -1])
        color = w @ rgb + t_final[:, None] * background[None, :]  # (P, 3)
        invd = w @ (1.0 / depth)  # (P,)
        return color, invd

    tx = jnp.tile(jnp.arange(grid_x), grid_y)
    ty = jnp.repeat(jnp.arange(grid_y), grid_x)
    colors, invds = jax.lax.map(render_one_tile, (tx, ty, member))

    canvas = colors.reshape(grid_y, grid_x, BLOCK_Y, BLOCK_X, 3)
    canvas = canvas.transpose(0, 2, 1, 3, 4).reshape(
        grid_y * BLOCK_Y, grid_x * BLOCK_X, 3
    )[:height, :width]
    dcanvas = invds.reshape(grid_y, grid_x, BLOCK_Y, BLOCK_X)
    dcanvas = dcanvas.transpose(0, 2, 1, 3).reshape(
        grid_y * BLOCK_Y, grid_x * BLOCK_X
    )[:height, :width]
    return canvas, dcanvas


def rasterize_reference(
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
    max_sh_degree: Optional[int] = None,
    scale_modifier: float = 1.0,
    antialias: bool = False,
    alive: Optional[jnp.ndarray] = None,
    means2d_ndc_offset: Optional[jnp.ndarray] = None,
    reference_quirks: bool = False,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
) -> RenderOutput:
    """Full forward rasterization. Signature mirrors the reference's
    ``rasterize_gaussian`` (rasterize.py:28-46) in jnp terms."""
    prep = preprocess(
        means3d, opacities, scales, quats, sh, camera, width, height,
        sh_degree, max_sh_degree, scale_modifier, antialias, alive,
        means2d_ndc_offset, colors_precomp, cov3d_precomp,
    )
    grid_x = (width + BLOCK_X - 1) // BLOCK_X
    grid_y = (height + BLOCK_Y - 1) // BLOCK_Y

    x_min, y_min, x_max, y_max = tf.tile_rect(
        prep.p_pix, prep.radius, grid_x, grid_y
    )
    tx = jnp.tile(jnp.arange(grid_x, dtype=jnp.int32), grid_y)  # (T,)
    ty = jnp.repeat(jnp.arange(grid_y, dtype=jnp.int32), grid_x)
    member = (
        (tx[:, None] >= x_min[None, :])
        & (tx[:, None] < x_max[None, :])
        & (ty[:, None] >= y_min[None, :])
        & (ty[:, None] < y_max[None, :])
    )  # (T, N)
    if not reference_quirks:
        member = member & prep.visible[None, :]

    order = jnp.argsort(prep.depth)
    color, invd = composite_tiles_dense(
        prep, member, order, width, height, background, grid_x, grid_y
    )
    return RenderOutput(
        image=jnp.moveaxis(color, -1, 0),
        radii=prep.radius,
        depth=invd[None],
    )
