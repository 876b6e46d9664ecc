"""AutoencoderKL (the SD VAE) in Flax, NHWC layout.

Rebuild of the diffusers AutoencoderKL the reference loads
(reference: thre3d_atom/thre3d_reprs/sd.py:77,272-280 — encode path runs WITH
gradients inside the SDS loss; decode is used by prompt_to_img). Module tree
mirrors diffusers naming for weight conversion. All convs run channels-last
(TPU-native); weight conversion transposes from torch NCHW.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from voxe_tpu.models.sd.config import VAEConfig
from voxe_tpu.models.sd.norms import make_group_norm


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = make_group_norm(self.groups, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = make_group_norm(self.groups, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over flattened H*W tokens."""

    groups: int = 32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = make_group_norm(self.groups, epsilon=1e-6, name="group_norm")(x)
        flat = h.reshape(B, H * W, C)
        q = nn.Dense(C, name="to_q")(flat)
        k = nn.Dense(C, name="to_k")(flat)
        v = nn.Dense(C, name="to_v")(flat)
        scores = jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(jnp.asarray(C, x.dtype))
        probs = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", probs, v)
        out = nn.Dense(C, name="to_out")(out)
        return x + out.reshape(B, H, W, C)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in")(x)

        for level, channels in enumerate(cfg.block_out_channels):
            for block in range(cfg.layers_per_block):
                h = ResnetBlock(
                    channels, cfg.norm_num_groups,
                    name=f"down_{level}_resnet_{block}",
                )(h)
            if level != len(cfg.block_out_channels) - 1:
                # torch asymmetric pad (0,1,0,1) + stride-2 valid conv,
                # expressed as the conv's own asymmetric padding so XLA never
                # materializes the padded [B, H+1, W+1, C] activation (67 MB
                # at 512^2x128 — was a measured slice of the 8 ms/iter of pad
                # ops in the r2 SD-half trace)
                h = nn.Conv(
                    channels, (3, 3), strides=2, padding=((0, 1), (0, 1)),
                    name=f"down_{level}_downsample",
                )(h)

        h = ResnetBlock(h.shape[-1], cfg.norm_num_groups, name="mid_resnet_0")(h)
        h = AttnBlock(cfg.norm_num_groups, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], cfg.norm_num_groups, name="mid_resnet_1")(h)

        h = make_group_norm(cfg.norm_num_groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, name="conv_out")(h)
        return h  # [B, H/8, W/8, 2*latent]: (mean, logvar)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        channels_rev = tuple(reversed(cfg.block_out_channels))
        h = nn.Conv(channels_rev[0], (3, 3), padding=1, name="conv_in")(z)

        h = ResnetBlock(h.shape[-1], cfg.norm_num_groups, name="mid_resnet_0")(h)
        h = AttnBlock(cfg.norm_num_groups, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], cfg.norm_num_groups, name="mid_resnet_1")(h)

        for level, channels in enumerate(channels_rev):
            for block in range(cfg.layers_per_block + 1):
                h = ResnetBlock(
                    channels, cfg.norm_num_groups, name=f"up_{level}_resnet_{block}"
                )(h)
            if level != len(channels_rev) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = nn.Conv(channels, (3, 3), padding=1, name=f"up_{level}_upsample")(h)

        h = make_group_norm(cfg.norm_num_groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out")(h)
        return h


class AutoencoderKL(nn.Module):
    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), name="post_quant_conv"
        )

    def encode_moments(self, images) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images [B, H, W, 3] in [-1, 1] -> (mean, logvar) latent moments."""
        moments = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, images, key=None):
        """Sampled (or mean, when key=None) latents, scaled by scaling_factor
        (reference sd.py:272-280)."""
        mean, logvar = self.encode_moments(images)
        if key is not None:
            std = jnp.exp(0.5 * logvar)
            mean = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        return mean * self.config.scaling_factor

    def decode(self, latents):
        """latents (scaled) -> images [B, H, W, 3] in [-1, 1]."""
        return self.decoder(self.post_quant_conv(latents / self.config.scaling_factor))

    def __call__(self, images, key=None):
        return self.decode(self.encode(images, key))
