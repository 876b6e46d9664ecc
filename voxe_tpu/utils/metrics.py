"""Image quality metrics (reference: thre3d_atom/utils/metric_utils.py:1-21).

PSNR/MSE are implemented in JAX; SSIM is provided as an extra (the reference
relies on the external `lpips` package for perceptual distance — here LPIPS is
available via voxe_tpu.models.lpips when VGG weights are present, and SSIM is
the always-available perceptual-ish fallback).
"""
import jax.numpy as jnp


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def mse2psnr(mse_value):
    return -10.0 * jnp.log(mse_value + 1e-12) / jnp.log(10.0)


def psnr(pred, target):
    return mse2psnr(mse(pred, target))


def ssim(img0, img1, max_val: float = 1.0):
    """Global (non-windowed) SSIM over [H, W, C] images — cheap proxy used for
    held-out eval summaries; full windowed SSIM lives in evaluation/."""
    mu0, mu1 = jnp.mean(img0), jnp.mean(img1)
    var0, var1 = jnp.var(img0), jnp.var(img1)
    cov = jnp.mean((img0 - mu0) * (img1 - mu1))
    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    return ((2 * mu0 * mu1 + c1) * (2 * cov + c2)) / (
        (mu0**2 + mu1**2 + c1) * (var0 + var1 + c2)
    )
