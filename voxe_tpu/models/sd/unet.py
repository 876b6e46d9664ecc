"""UNet2DConditionModel (the SD denoiser) in Flax, NHWC layout.

Rebuild of the diffusers UNet the reference drives for SDS and attention
extraction (reference: thre3d_atom/thre3d_reprs/sd.py:83-85,210,157 and
cross_attn.py:57-124). Key TPU-native differences:

* Channels-last convs + bf16-friendly matmul blocks (MXU path).
* Cross-attention capture is functional: instead of monkey-patching module
  forwards (cross_attn.py:57-124), every cross-attn layer `sow`s its
  (head-averaged) attention probabilities into the "attn_maps" collection
  when `capture_attn=True`; callers collect them via
  `apply(..., mutable=["attn_maps"])`. Layer position (down/mid/up) is
  encoded in the module path.
* `attention_head_dim` follows the HF config field name but is the per-level
  NUMBER OF HEADS (HF's historical naming: SD2's [5,10,20,20] over channels
  [320,640,1280,1280] gives 64-dim heads).
"""
from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from voxe_tpu.models.sd.config import UNetConfig
from voxe_tpu.models.sd.norms import make_group_norm


def _flash_block_sizes(q_len: int, k_len: int):
    """Tuned Pallas flash BlockSizes for the UNet's long self-attentions.

    The r3 negative result ("flash +13 ms/iter") was a DEFAULT-BLOCK-SIZE
    artifact: at [2, 5, 4096, 64] the stock defaults measure 5.1 ms/layer
    vs XLA's 2.65, but block_q=512 / block_k_major=2048 / block_k=1024
    measures 1.43 ms/layer (tools/bench_attn.py sweep, v5e, 2026-08-19) —
    the XLA lowering materializes an f32[2,5,4096,4096] score tensor
    (~671 MB of HBM traffic per layer; the single largest SD-half cost in
    the r4 trace), which flash never forms.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    def _largest_dividing(cands, n):
        return next(c for c in cands if n % c == 0)

    bq = _largest_dividing((512, 256), q_len)
    bkm = _largest_dividing((2048, 1024, 512), k_len)
    bk = min(_largest_dividing((1024, 512), k_len), bkm)
    return BlockSizes(
        block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkm, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bkm, block_k_dq=bk, block_q_dq=bq,
    )


def _flash_self_attention_enabled(q_len: int, head_dim: int) -> bool:
    """Pallas TPU flash-attention for LONG self-attention — default ON
    (VOXE_FLASH_ATTN=0 restores the XLA lowering).

    Applies only to the no-capture fast path at q_len >= 2048 with
    MXU-friendly head dims and block-divisible sequence lengths; the SDS
    UNet runs under stop_gradient (sds.py:250) so only the forward kernel
    is on the hot path (the kernel's custom VJP covers any gradient use).

    The >= 2048 threshold is measured, not guessed: at the 32^2 level
    ([2, 10, 1024, 64], tools/bench_attn.py --heads 10 --seq 1024, v5e,
    2026-08-19) XLA's fused SDPA wins — 0.877 ms/layer vs 0.925 for the
    best tuned flash configuration (block_q=256) — because at k_len=1024
    the score tensor is small enough that XLA's epilogue-fused softmax
    beats the Pallas kernel's grid overhead. Only the 64^2 level
    (q_len=4096) clears the crossover.
    """
    if os.environ.get("VOXE_FLASH_ATTN", "1") == "0":
        return False
    if jax.default_backend() == "cpu":
        return False
    # self-attention: k_len == q_len, so the 512-divisibility check covers
    # every _flash_block_sizes candidate
    return q_len >= 2048 and head_dim in (64, 128) and q_len % 512 == 0


def timestep_embedding(t, dim: int, flip_sin_to_cos: bool = True, freq_shift: float = 0.0):
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding parity)."""
    half = dim // 2
    exponent = -np.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent) * jnp.asarray(t, jnp.float32)[..., None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class ResnetBlock2D(nn.Module):
    # norm epsilons follow diffusers UNet2DConditionModel: GroupNorms use
    # norm_eps=1e-5 (unlike the VAE's 1e-6 blocks), transformer LayerNorms
    # use torch's default 1e-5; flax defaults to 1e-6, so every norm that
    # differs sets epsilon explicitly for real-weight numeric parity
    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, temb):
        in_channels = x.shape[-1]
        h = make_group_norm(self.groups, epsilon=1e-5, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)

        temb_out = nn.Dense(self.out_channels, name="time_emb_proj")(nn.silu(temb))
        h = h + temb_out[:, None, None, :]

        h = make_group_norm(self.groups, epsilon=1e-5, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)

        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    num_heads: int
    capture: str = ""  # "", or the capture tag ("down"/"mid"/"up")

    @nn.compact
    def __call__(
        self, hidden, context=None, capture_attn: bool = False, attn_edit_fn=None
    ):
        """hidden [B, Q, C]; context [B, K, Dc] (None -> self-attention).

        `attn_edit_fn(probs [B, h, Q, K], place, is_cross) -> probs` enables
        prompt-to-prompt attention REINJECTION (the functional replacement of
        the reference's controller monkey-patch, cross_attn.py:57-124):
        controllers from voxe_tpu.models.sd.controllers slot in directly.
        """
        C = hidden.shape[-1]
        head_dim = C // self.num_heads
        is_cross = context is not None
        context = hidden if context is None else context

        q = nn.Dense(C, use_bias=False, name="to_q")(hidden)
        k = nn.Dense(C, use_bias=False, name="to_k")(context)
        v = nn.Dense(C, use_bias=False, name="to_v")(context)

        def split_bqhd(x):  # [B, T, C] -> [B, T, h, d] (SDPA-native layout)
            return x.reshape(*x.shape[:-1], self.num_heads, head_dim)

        q, k, v = split_bqhd(q), split_bqhd(k), split_bqhd(v)

        needs_probs = attn_edit_fn is not None or (capture_attn and self.capture)
        if not needs_probs:
            # fast path. q/k/v can arrive in mixed precision (f32 norms x
            # bf16 kernels); both lowerings require a uniform dtype
            dt = jnp.result_type(q.dtype, k.dtype, v.dtype)
            if not is_cross and _flash_self_attention_enabled(
                q.shape[-3], head_dim
            ):
                from jax.experimental.pallas.ops.tpu.flash_attention import (
                    flash_attention,
                )

                out = flash_attention(
                    q.swapaxes(-3, -2).astype(dt),
                    k.swapaxes(-3, -2).astype(dt),
                    v.swapaxes(-3, -2).astype(dt),
                    sm_scale=1.0 / float(np.sqrt(head_dim)),
                    block_sizes=_flash_block_sizes(q.shape[-3], k.shape[-3]),
                )  # [B, h, Q, D]
                out = out.swapaxes(-3, -2).reshape(*hidden.shape[:-1], C)
                return nn.Dense(C, name="to_out_0")(out)
            # XLA scaled-dot-product attention. Measured r3 negative results
            # at the UNet's 64^2 level, both vs this lowering: Pallas flash
            # +13 ms/iter; a manual einsum/softmax/bf16-probs formulation
            # +17 ms/iter (XLA's SDPA fuses the softmax into the QK matmul
            # epilogue — splitting it materializes scores AND probs). Leave
            # the lowering to the compiler.
            out = jax.nn.dot_product_attention(
                q.astype(dt), k.astype(dt), v.astype(dt)
            ).reshape(*hidden.shape[:-1], C)
            return nn.Dense(C, name="to_out_0")(out)
        # probs path: [B, h, Q, K] layout
        q, k, v = (x.swapaxes(-3, -2) for x in (q, k, v))

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(head_dim)
        probs = nn.softmax(scores, axis=-1)

        if attn_edit_fn is not None:
            probs = attn_edit_fn(probs, self.capture or "self", is_cross)

        if capture_attn and self.capture:
            # head-averaged [B, Q, K] map; reference AttentionStore keeps maps
            # with Q <= 32^2 (cross_attn.py:167-202) — storage filter happens
            # at aggregation since Q is static here
            self.sow(
                "attn_maps",
                f"{self.capture}_cross",
                jnp.mean(probs.astype(jnp.float32), axis=1),
            )

        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.swapaxes(-3, -2).reshape(*hidden.shape[:-1], C)
        return nn.Dense(C, name="to_out_0")(out)


class FeedForward(nn.Module):
    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        hidden = nn.Dense(C * 8, name="geglu_proj")(x)
        a, gate = jnp.split(hidden, 2, axis=-1)
        # diffusers GEGLU uses torch F.gelu = EXACT erf gelu; flax's nn.gelu
        # defaults to the tanh approximation (~1e-3 relative deviation) —
        # caught by the torch block-parity suite (test_sd_torch_blocks.py)
        return nn.Dense(C, name="out_proj")(a * nn.gelu(gate, approximate=False))


class BasicTransformerBlock(nn.Module):
    num_heads: int
    capture: str = ""

    @nn.compact
    def __call__(self, hidden, context, capture_attn: bool = False, attn_edit_fn=None):
        # attn1 is SELF-attention: editable via attn_edit_fn but never
        # captured (capture is cross-maps only; see cross_attn aggregation)
        hidden = hidden + CrossAttention(self.num_heads, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(hidden), attn_edit_fn=attn_edit_fn
        )
        hidden = hidden + CrossAttention(
            self.num_heads, capture=self.capture, name="attn2"
        )(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(hidden), context,
            capture_attn=capture_attn, attn_edit_fn=attn_edit_fn,
        )
        hidden = hidden + FeedForward(name="ff")(nn.LayerNorm(epsilon=1e-5, name="norm3")(hidden))
        return hidden


class Transformer2D(nn.Module):
    num_heads: int
    groups: int = 32
    capture: str = ""

    @nn.compact
    def __call__(self, x, context, capture_attn: bool = False, attn_edit_fn=None):
        B, H, W, C = x.shape
        residual = x
        h = make_group_norm(self.groups, epsilon=1e-6, name="norm")(x)
        h = nn.Conv(C, (1, 1), name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        h = BasicTransformerBlock(
            self.num_heads, capture=self.capture, name="transformer_blocks_0"
        )(h, context, capture_attn=capture_attn, attn_edit_fn=attn_edit_fn)
        h = h.reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), name="proj_out")(h)
        return h + residual


class UNet2DConditionModel(nn.Module):
    config: UNetConfig

    @nn.compact
    def __call__(
        self, sample, timesteps, encoder_hidden_states,
        capture_attn: bool = False, attn_edit_fn=None,
    ):
        """sample [B, H, W, in_ch]; timesteps [] or [B]; context [B, T, Dc]."""
        cfg = self.config
        num_levels = len(cfg.block_out_channels)

        # time embedding
        temb = timestep_embedding(
            jnp.atleast_1d(timesteps), cfg.block_out_channels[0],
            cfg.flip_sin_to_cos, cfg.freq_shift,
        )
        temb = jnp.broadcast_to(temb, (sample.shape[0], temb.shape[-1]))
        time_embed_dim = cfg.block_out_channels[0] * 4
        temb = nn.Dense(time_embed_dim, name="time_embedding_linear_1")(temb)
        temb = nn.Dense(time_embed_dim, name="time_embedding_linear_2")(nn.silu(temb))
        # the sinusoid/first projections run f32 for precision (tiny); cast to
        # the activation dtype HERE or the f32 temb poisons every resnet's
        # `h + temb_out` to f32 and with it every conv after it (2x HBM and
        # the non-bf16 MXU path — measured as the "f32 activation upcasts" in
        # BENCHMARKS.md "sds half")
        temb = temb.astype(sample.dtype)

        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in")(sample)
        skips = [h]

        # ---- down path
        for level in range(num_levels):
            channels = cfg.block_out_channels[level]
            is_cross = cfg.down_block_types[level] == "CrossAttnDownBlock2D"
            for block in range(cfg.layers_per_block):
                h = ResnetBlock2D(
                    channels, cfg.norm_num_groups,
                    name=f"down_{level}_resnet_{block}",
                )(h, temb)
                if is_cross:
                    h = Transformer2D(
                        cfg.attention_head_dim[level], cfg.norm_num_groups,
                        capture="down", name=f"down_{level}_attn_{block}",
                    )(h, encoder_hidden_states, capture_attn=capture_attn,
                      attn_edit_fn=attn_edit_fn)
                skips.append(h)
            if level != num_levels - 1:
                h = nn.Conv(
                    channels, (3, 3), strides=2, padding=1,
                    name=f"down_{level}_downsample",
                )(h)
                skips.append(h)

        # ---- mid
        h = ResnetBlock2D(h.shape[-1], cfg.norm_num_groups, name="mid_resnet_0")(h, temb)
        h = Transformer2D(
            cfg.attention_head_dim[-1], cfg.norm_num_groups, capture="mid",
            name="mid_attn",
        )(h, encoder_hidden_states, capture_attn=capture_attn,
          attn_edit_fn=attn_edit_fn)
        h = ResnetBlock2D(h.shape[-1], cfg.norm_num_groups, name="mid_resnet_1")(h, temb)

        # ---- up path (reversed levels)
        for up_idx in range(num_levels):
            level = num_levels - 1 - up_idx  # channel level being produced
            channels = cfg.block_out_channels[level]
            is_cross = cfg.up_block_types[up_idx] == "CrossAttnUpBlock2D"
            for block in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(
                    channels, cfg.norm_num_groups, name=f"up_{up_idx}_resnet_{block}"
                )(h, temb)
                if is_cross:
                    h = Transformer2D(
                        cfg.attention_head_dim[level], cfg.norm_num_groups,
                        capture="up", name=f"up_{up_idx}_attn_{block}",
                    )(h, encoder_hidden_states, capture_attn=capture_attn,
                      attn_edit_fn=attn_edit_fn)
            if up_idx != num_levels - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = nn.Conv(C, (3, 3), padding=1, name=f"up_{up_idx}_upsample")(h)

        h = make_group_norm(cfg.norm_num_groups, epsilon=1e-5, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out")(h)
