"""Differentiable SSIM.

TPU-native replacement for the CUDA ``fused-ssim`` submodule (reference N2,
``gs_lightning_module.py:10,100``): 11x11 Gaussian window (sigma 1.5),
C1=0.01^2, C2=0.03^2, same-padding, mean over pixels/channels — the standard
Wang et al. SSIM the fused kernel implements. Built from two separable
depthwise convolutions; XLA fuses the elementwise tail, so no hand-written
kernel is needed for this op (HBM-bound, ~13 flops/byte after fusion).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

C1 = 0.01 ** 2
C2 = 0.03 ** 2


@functools.lru_cache(maxsize=8)
def _gaussian_window(size: int, sigma: float):
    import numpy as np

    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur_valid(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable depthwise Gaussian blur, NCHW, VALID padding.

    precision=HIGHEST: TPU convs default to bf16 multiplies, and the
    variance terms downstream (blur(x^2) - mu^2) are cancellation-sensitive
    — bf16 window sums made SSIM land outside [-1, 1] on smooth 1080p
    renders, corrupting the training loss."""
    c = x.shape[1]
    w = jnp.asarray(_gaussian_window(window_size, sigma), dtype=x.dtype)
    kh = jnp.tile(w.reshape(1, 1, window_size, 1), (c, 1, 1, 1))
    kw = jnp.tile(w.reshape(1, 1, 1, window_size), (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    return x


def ssim_map(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Per-pixel SSIM map, (B, C, H, W) -> (B, C, H, W), same (zero) padding.

    Exposed separately so the tile-sharded loss can compute masked band
    partial sums of the exact full-image map (parallel/shard.py).

    Variances/covariance are computed on globally-centered inputs:
    var = blur((x-c)^2) - blur(x-c)^2 is exact for any constant shift c,
    and c ~ the image mean shrinks the cancelling terms from O(mean^2) to
    O(local variance) — in f32 the uncentered form loses ~7 digits on
    smooth renders (local sigma^2 ~ 1e-8 vs blur(x^2) ~ 0.25). To keep the
    original zero-padding semantics exactly (out-of-image pixels read as 0,
    which the band-sharded loss's zero-filled halos rely on), the images are
    padded with zeros FIRST, then shifted, then blurred VALID: the padded
    border pixels correctly contribute (0 - c) to the centered sums."""
    c1 = jax.lax.stop_gradient(jnp.mean(img1))
    c2 = jax.lax.stop_gradient(jnp.mean(img2))
    r = window_size // 2
    pad = ((0, 0), (0, 0), (r, r), (r, r))
    y1 = jnp.pad(img1, pad) - c1
    y2 = jnp.pad(img2, pad) - c2
    # one 5C-channel depthwise blur instead of five C-channel blurs: TPU
    # packs channels into the 8-sublane dim, so 3-channel depthwise convs
    # run at 3/8 utilization and pay five passes of launch + HBM traffic
    stacked = jnp.concatenate([y1, y2, y1 * y1, y2 * y2, y1 * y2], axis=1)
    blurred = _blur_valid(stacked, window_size, sigma)
    nc = img1.shape[1]
    by1, by2, b11, b22, b12 = (
        blurred[:, i * nc : (i + 1) * nc] for i in range(5)
    )
    mu1 = by1 + c1
    mu2 = by2 + c2
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = b11 - by1 * by1
    sigma2_sq = b22 - by2 * by2
    sigma12 = b12 - by1 * by2
    return ((2.0 * mu12 + C1) * (2.0 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM between two (B, C, H, W) or (C, H, W) images in [0, 1]."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    return jnp.mean(ssim_map(img1, img2, window_size, sigma))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio (the field-standard metric the reference
    never computes — SURVEY §5)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))
