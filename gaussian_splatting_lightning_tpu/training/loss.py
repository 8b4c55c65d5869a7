"""Training loss: L1/SSIM mix + quality metrics.

Spec: reference ``calculate_loss`` (gs_lightning_module.py:269-299):
loss = (1 - w_ssim) * L1 + w_ssim * (1 - SSIM), w_ssim = 0.2. PSNR added on
top (the reference computes none of the field-standard eval metrics —
SURVEY §5)."""

from __future__ import annotations

import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.ops.ssim import psnr, ssim


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def photometric_loss(pred: jnp.ndarray, target: jnp.ndarray, w_ssim: float = 0.2):
    """Returns (loss, logs dict)."""
    recon = l1_loss(pred, target)
    ssim_val = ssim(pred, target)
    loss_ssim = 1.0 - ssim_val
    loss = recon * (1.0 - w_ssim) + loss_ssim * w_ssim
    return loss, {
        "loss": loss,
        "recon": recon,
        "ssim": loss_ssim,
        "psnr": psnr(pred, target),
    }
