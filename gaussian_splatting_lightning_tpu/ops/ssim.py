"""Differentiable SSIM.

TPU-native replacement for the CUDA ``fused-ssim`` submodule (reference N2,
``gs_lightning_module.py:10,100``): 11x11 Gaussian window (sigma 1.5),
C1=0.01^2, C2=0.03^2, same-padding, mean over pixels/channels — the standard
Wang et al. SSIM the fused kernel implements.

Two blur backends:
- XLA separable depthwise conv (CPU/debug): correct everywhere, but on TPU
  the 15-channel depthwise convs run at a few percent of HBM speed-of-light
  (channel counts far below sublane packing + layout-shuffle copies between
  passes) — 35 ms of a 183 ms 1080p train step.
- Pallas separable-blur kernel (TPU default): one pass per row-slab does
  the vertical taps as static sublane slices and the horizontal taps as
  lane rolls, f32 throughout; the blur is linear with a symmetric window,
  so its VJP is the same kernel applied to the zero-padded cotangent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


_BLUR_BH = 128  # rows per Pallas grid step


def _blur_kernel(a_ref, b_ref, out_ref, *, bh, taps, out_w, lanes):
    """One (channel, row-slab) grid step. ``a_ref`` is this row block,
    ``b_ref`` the NEXT row block of the same channel (same array, index map
    shifted by one) — the vertical taps need win-1 rows of look-ahead, and
    overlapping reads are not expressible in one blocked spec. Vertical taps
    are static sublane slices; horizontal taps are lane rolls; the lane tail
    (wrapped values / padding) is zeroed so downstream sums stay exact."""
    win = len(taps)
    slab = jnp.concatenate([a_ref[0], b_ref[0, : win - 1]], axis=0)
    acc_v = slab[0:bh, :] * taps[0]
    for k in range(1, win):
        acc_v = acc_v + slab[k : k + bh, :] * taps[k]
    acc = acc_v * taps[0]
    for k in range(1, win):
        # left-shift by k == circular roll by lanes - k (shift must be >= 0)
        acc = acc + pltpu.roll(acc_v, lanes - k, 1) * taps[k]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bh, lanes), 1)
    out_ref[0] = jnp.where(lane < out_w, acc, 0.0)


def _blur_call(xp, out_h, out_w, taps, interpret=False):
    """(C, out_h + win - 1 [row-padded], L) -> (C, out_h, L): VALID separable
    blur; output lanes >= out_w zeroed. Rows of xp beyond out_h + win - 1 and
    lanes beyond out_w + win - 1 must be zero."""
    c, _, lanes = xp.shape
    win = len(taps)
    bh = min(_BLUR_BH, -(-max(win - 1, out_h) // 8) * 8)
    nh = -(-out_h // bh)
    need_rows = (nh + 1) * bh  # one full look-ahead block past the grid
    if xp.shape[1] < need_rows:
        xp = jnp.pad(xp, ((0, 0), (0, need_rows - xp.shape[1]), (0, 0)))
    else:
        xp = xp[:, :need_rows]
    out = pl.pallas_call(
        functools.partial(
            _blur_kernel, bh=bh, taps=tuple(float(t) for t in taps),
            out_w=out_w, lanes=lanes,
        ),
        grid=(c, nh),
        in_specs=[
            pl.BlockSpec((1, bh, lanes), lambda ci, ri: (ci, ri, 0)),
            pl.BlockSpec((1, bh, lanes), lambda ci, ri: (ci, ri + 1, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, lanes), lambda ci, ri: (ci, ri, 0)),
        out_shape=jax.ShapeDtypeStruct((c, nh * bh, lanes), xp.dtype),
        interpret=interpret,
    )(xp, xp)
    return out[:, :out_h]


def _make_blur_pallas(out_h, out_w, taps, interpret=False):
    """VALID separable blur of a row/lane zero-padded stack as a custom-vjp
    primitive. Linearity + symmetric window: the adjoint of
    crop∘valid-blur∘(zero-embedded input) is the same valid blur applied to
    the cotangent zero-embedded with win-1 margin rows/lanes."""
    win = len(taps)
    r = win - 1

    @jax.custom_vjp
    def blur(xp):
        return _blur_call(xp, out_h, out_w, taps, interpret)

    def fwd(xp):
        return blur(xp), (xp.shape,)

    def bwd(res, ct):
        (xshape,) = res
        c, xrows, lanes = xshape
        lanes2 = -(-(out_w + 2 * r) // 128) * 128
        ctp = jnp.zeros((c, out_h + 2 * r, lanes2), ct.dtype)
        ctp = jax.lax.dynamic_update_slice(ctp, ct[..., :out_w], (0, r, r))
        dx = _blur_call(ctp, out_h + r, out_w + r, taps, interpret)
        dx = dx[:, :xrows, :lanes]
        if dx.shape[1] < xrows or dx.shape[2] < lanes:
            dx = jnp.pad(
                dx,
                ((0, 0), (0, xrows - dx.shape[1]), (0, lanes - dx.shape[2])),
            )
        return (dx,)

    blur.defvjp(fwd, bwd)
    return blur


def _blur_valid_pallas(x: jnp.ndarray, window_size: int, sigma: float,
                       interpret: bool = False) -> jnp.ndarray:
    """Drop-in for _blur_valid (NCHW, VALID) via the Pallas kernel: folds
    (N, C) into the kernel's channel grid and pads W to the lane width."""
    n, c, hp, wp = x.shape
    win = window_size
    out_h, out_w = hp - (win - 1), wp - (win - 1)
    taps = tuple(float(t) for t in _gaussian_window(win, sigma))
    lanes = -(-wp // 128) * 128
    xp = jnp.pad(x.reshape(n * c, hp, wp), ((0, 0), (0, 0), (0, lanes - wp)))
    out = _make_blur_pallas(out_h, out_w, taps, interpret)(xp)
    return out[:, :, :out_w].reshape(n, c, out_h, out_w)


def _use_pallas_blur() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


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
    if _use_pallas_blur():
        blurred = _blur_valid_pallas(stacked, window_size, sigma)
    else:
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
