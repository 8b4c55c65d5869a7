"""Shared rasterizer definitions: constants, preprocess stage, output pytree.

The per-Gaussian preprocess (frustum cull -> cov3D -> EWA cov2D -> conic +
radius -> SH color -> pixel-space mean) is identical across all rasterizer
implementations (jnp oracle, tiled XLA, Pallas) and is plain differentiable
jnp — XLA fuses it into a handful of VPU loops. Spec: reference
``gs_lightning/rasterize/rasterize.py:49-94``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.core import sh as sh_lib
from gaussian_splatting_lightning_tpu.core import transforms as tf
from gaussian_splatting_lightning_tpu.core.camera import Camera

BLOCK_X = 16  # tile size, reference rasterize.py:19-20
BLOCK_Y = 16
ALPHA_CLAMP = 0.99  # reference rasterize.py:197/245
ALPHA_THRESHOLD = 1.0 / 255.0  # reference rasterize.py:193/223
TRANSMITTANCE_EPS = 1e-4  # reference rasterize.py:204/254


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Preprocessed:
    """Per-Gaussian screen-space quantities (all (N, ...))."""

    p_pix: jnp.ndarray  # (N, 2) pixel-space means
    depth: jnp.ndarray  # (N,) view-space z
    conic: jnp.ndarray  # (N, 3) inverse of dilated 2D covariance (a, b, d)
    rgb: jnp.ndarray  # (N, 3)
    opacity: jnp.ndarray  # (N,) post antialias-scaling
    radius: jnp.ndarray  # (N,) 3-sigma pixel radius; 0 where not visible
    visible: jnp.ndarray  # (N,) bool: in frustum & invertible cov & alive
    radius_bin: jnp.ndarray  # (N,) binning radius = min(radius, exact
    # opacity-aware support radius); pairs beyond it are exact zeros
    cull_r2: jnp.ndarray  # (N,) squared pixel distance beyond which every
    # pixel's alpha is provably below the kill threshold (per-tile cull)


def preprocess(
    means3d: jnp.ndarray,  # (N, 3)
    opacities: jnp.ndarray,  # (N,) or (N, 1) post-activation
    scales: jnp.ndarray,  # (N, 3) post-activation
    quats: jnp.ndarray,  # (N, 4) normalized
    sh: jnp.ndarray,  # (N, K, 3)
    camera: Camera,
    width: int,
    height: int,
    sh_degree,
    max_sh_degree: Optional[int] = None,
    scale_modifier: float = 1.0,
    antialias: bool = False,
    alive: Optional[jnp.ndarray] = None,  # (N,) bool; padded-capacity mask
    means2d_ndc_offset: Optional[jnp.ndarray] = None,  # (N, 2) zeros whose
    # gradient is the densification screen-space signal (NDC units, matching
    # the CUDA rasterizer's means2D grad; reference gs_lightning_module.py:316)
    colors_precomp: Optional[jnp.ndarray] = None,  # (N, 3) RGB replacing the
    # SH evaluation — the N1 rasterizer's colors_precomp input
    # (gs_lightning_module.py:337-348 passes None; part of the API surface)
    cov3d_precomp: Optional[jnp.ndarray] = None,  # (N, 6) upper-triangle 3D
    # covariance replacing scales/quats — the N1 cov3D_precomp input
) -> Preprocessed:
    opacities = opacities.reshape(-1)
    p_view = tf.apply_extrinsic(means3d, camera.viewmatrix)
    p_ndc = tf.apply_projection(means3d, camera.projmatrix)
    if means2d_ndc_offset is not None:
        p_ndc = p_ndc + means2d_ndc_offset
    visible = tf.in_frustum(p_view)
    if alive is not None:
        visible = visible & alive

    focal_x = (width * 0.5) / camera.tanfovx
    focal_y = (height * 0.5) / camera.tanfovy
    if cov3d_precomp is not None:
        cov6 = cov3d_precomp
    else:
        cov6 = tf.build_cov3d(scales, quats, scale_modifier)
    cov2d = tf.project_cov3d_ewa(
        means3d, cov6, camera.viewmatrix, focal_x, focal_y,
        camera.tanfovx, camera.tanfovy,
    )
    conic, radius, valid, opacity_scale, lam_max = tf.conic_and_radius(
        cov2d, antialias
    )
    visible = visible & valid
    radius = jnp.where(visible, radius, 0.0)
    opacity = opacities * opacity_scale
    radius_bin = jnp.minimum(
        radius, tf.tight_radius(opacity, lam_max, ALPHA_THRESHOLD)
    )
    # per-tile cull bound (ops/binning.py expansion kernel): pixels at
    # squared distance > cull_r2 have alpha = op*exp(-q/2) < 1/255 since
    # q >= d^2/lam_max (Rayleigh bound on the conic) — small multiplicative
    # + absolute margin swallows f32 noise in the compositor's kill test
    log_ratio = jnp.log(jnp.maximum(opacity / ALPHA_THRESHOLD, 1.0))
    # lam_max can overflow to inf for (culled) near-camera-plane splats;
    # 0 * inf = NaN would poison the whole gradient (see tight_radius)
    cull_r2 = 2.0 * log_ratio * jnp.minimum(lam_max, 1e12) * 1.001 + 0.25

    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        rgb = sh_lib.sh_to_rgb(
            sh, means3d, camera.campos, sh_degree, max_sh_degree
        )
    p_pix = tf.ndc_to_pix(p_ndc, width, height)
    return Preprocessed(
        p_pix=p_pix,
        depth=p_view[..., 2],
        conic=conic,
        rgb=rgb,
        opacity=opacity,
        radius=radius,
        visible=visible,
        radius_bin=radius_bin,
        cull_r2=cull_r2,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RenderOutput:
    """Mirrors the reference rasterizer's return tuple
    (rendered_image, radii, depth_image) — gs_lightning_module.py:339-348."""

    image: jnp.ndarray  # (3, H, W)
    radii: jnp.ndarray  # (N,) float, 0 for culled splats
    depth: jnp.ndarray  # (1, H, W) inverse-depth-weighted (sum w/z)
