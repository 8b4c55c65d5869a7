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


def _blur(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable depthwise Gaussian blur, NCHW, same padding."""
    c = x.shape[1]
    w = jnp.asarray(_gaussian_window(window_size, sigma), dtype=x.dtype)
    kh = jnp.tile(w.reshape(1, 1, window_size, 1), (c, 1, 1, 1))
    kw = jnp.tile(w.reshape(1, 1, 1, window_size), (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    pad_h = [(window_size // 2, window_size // 2), (0, 0)]
    pad_w = [(0, 0), (window_size // 2, window_size // 2)]
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), pad_h, dimension_numbers=dn, feature_group_count=c
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), pad_w, dimension_numbers=dn, feature_group_count=c
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
    partial sums of the exact full-image map (parallel/shard.py)."""
    mu1 = _blur(img1, window_size, sigma)
    mu2 = _blur(img2, window_size, sigma)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window_size, sigma) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window_size, sigma) - mu2_sq
    sigma12 = _blur(img1 * img2, window_size, sigma) - mu12
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
