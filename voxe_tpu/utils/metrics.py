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


def ssim(
    img0,
    img1,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
):
    """Windowed SSIM over [H, W, C] images (standard gaussian-window formula,
    matching the usual skimage/tf defaults)."""
    import jax

    img0 = jnp.asarray(img0, jnp.float32)
    img1 = jnp.asarray(img1, jnp.float32)
    if img0.ndim == 2:
        img0, img1 = img0[..., None], img1[..., None]

    hw = filter_size // 2
    offsets = jnp.arange(-hw, hw + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (offsets / filter_sigma) ** 2)
    g = g / g.sum()

    def blur(x):  # separable gaussian, per channel, valid padding
        x = jnp.moveaxis(x, -1, 0)[:, None]  # [C, 1, H, W]
        kh = g.reshape(1, 1, -1, 1)
        kw = g.reshape(1, 1, 1, -1)
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
        x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID")
        return jnp.moveaxis(x[:, 0], 0, -1)  # [H', W', C]

    mu0, mu1 = blur(img0), blur(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    sigma00 = blur(img0 * img0) - mu00
    sigma11 = blur(img1 * img1) - mu11
    sigma01 = blur(img0 * img1) - mu01

    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    numerator = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denominator = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    return jnp.mean(numerator / denominator)
