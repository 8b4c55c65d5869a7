"""LPIPS (Learned Perceptual Image Patch Similarity), VGG16 backbone, in JAX.

The field-standard perceptual eval metric the reference never ships (SURVEY
§5 names the gap: "no PSNR/LPIPS eval metrics"). Implements the LPIPS-VGG
forward exactly as the original lpips package computes it:

    d(x, y) = sum_l mean_hw( w_l * || phi_l(x)/||phi_l(x)|| -
                                     phi_l(y)/||phi_l(y)|| ||^2 )

where phi_l are VGG16 activations at relu1_2 / relu2_2 / relu3_3 / relu4_3 /
relu5_3, channel-unit-normalized per spatial location, and w_l are the
trained non-negative 1x1 "linear" weights.

Pretrained weights cannot be baked in here (this image has no torchvision /
lpips package and no network egress — see BASELINE.md "LPIPS" note), so the
metric loads them from an ``.npz`` produced once on any machine that has
them, via ``scripts/export_lpips_weights.py``. The npz layout:

    conv{i}_w : (out, in, kh, kw) float32, i = 0..12  (VGG16 conv stack)
    conv{i}_b : (out,) float32
    lin{j}_w  : (C_j,) float32, j = 0..4              (LPIPS linear heads)

All convs are 3x3, SAME padding; max-pool 2x2/2 after blocks per the VGG16
'D' configuration [64, 64, M, 128, 128, M, 256, 256, 256, M, 512, 512, 512,
M, 512, 512, 512, M].
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 cfg 'D': channel width per conv, with pool positions between blocks
_WIDTHS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
# conv index AFTER which each block ends (feature tap points, 0-based)
_TAPS = (1, 3, 6, 9, 12)
_POOL_AFTER = frozenset(_TAPS[:-1])

# lpips scaling layer constants (input in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_weights(path) -> Dict[str, np.ndarray]:
    """Load and validate an LPIPS-VGG weight archive (see module docstring)."""
    data = dict(np.load(path))
    for i, width in enumerate(_WIDTHS):
        w = data.get(f"conv{i}_w")
        b = data.get(f"conv{i}_b")
        if w is None or b is None:
            raise ValueError(f"{path}: missing conv{i}_w / conv{i}_b")
        if w.shape[0] != width or b.shape != (width,):
            raise ValueError(
                f"{path}: conv{i} shape {w.shape}/{b.shape} does not match "
                f"VGG16 width {width}"
            )
    for j, tap in enumerate(_TAPS):
        lin = data.get(f"lin{j}_w")
        if lin is None or lin.shape != (_WIDTHS[tap],):
            raise ValueError(
                f"{path}: lin{j}_w missing or wrong shape "
                f"(want ({_WIDTHS[tap]},))"
            )
    return data


def _conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + jnp.asarray(b)[None, :, None, None]


def _vgg_taps(x, weights):
    """x (N, 3, H, W) in [-1, 1] -> list of 5 tap activations."""
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    h = (x - shift) / scale
    taps = []
    for i in range(len(_WIDTHS)):
        h = jax.nn.relu(_conv(h, weights[f"conv{i}_w"], weights[f"conv{i}_b"]))
        if i in _TAPS:
            taps.append(h)
        if i in _POOL_AFTER:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
    return taps


def _unit_normalize(t, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(t * t, axis=1, keepdims=True))
    return t / (norm + eps)


@functools.partial(jax.jit, static_argnames=())
def _lpips_jit(x, y, weights):
    tx = _vgg_taps(x, weights)
    ty = _vgg_taps(y, weights)
    total = jnp.zeros((x.shape[0],), x.dtype)
    for j, (a, b) in enumerate(zip(tx, ty)):
        diff = _unit_normalize(a) - _unit_normalize(b)
        lin = jnp.asarray(weights[f"lin{j}_w"])[None, :, None, None]
        # non-negative 1x1 conv == channel-weighted sum of squared diffs
        total = total + jnp.mean(
            jnp.sum(lin * diff * diff, axis=1), axis=(1, 2)
        )
    return total


def lpips(image, target, weights) -> jnp.ndarray:
    """LPIPS distance between images in [0, 1].

    image/target: (3, H, W) or (N, 3, H, W), channel-first, range [0, 1]
    weights: dict from :func:`load_weights`
    Returns a scalar (single image) or (N,) batch of distances.
    """
    single = image.ndim == 3
    if single:
        image, target = image[None], target[None]
    x = jnp.asarray(image) * 2.0 - 1.0  # lpips operates in [-1, 1]
    y = jnp.asarray(target) * 2.0 - 1.0
    w = {k: jnp.asarray(v) for k, v in weights.items()}
    out = _lpips_jit(x, y, w)
    return out[0] if single else out
