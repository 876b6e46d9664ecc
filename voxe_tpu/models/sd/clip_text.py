"""CLIP text encoder in Flax (the SD conditioning tower).

Rebuild of the transformers CLIPTextModel the reference loads
(reference: thre3d_atom/thre3d_reprs/sd.py:81-82,119-136). Standard
pre-LayerNorm transformer with causal masking; parameter names follow the HF
module tree so `weights.py` can map checkpoints directly.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from voxe_tpu.models.sd.config import CLIPTextConfig


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    # transformers' "gelu" is the exact erf form (GELUActivation), not the
    # tanh approximation flax defaults to — keep numeric parity with the
    # checkpoints the reference loads
    return lambda x: nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, hidden, causal_mask):
        cfg = self.config
        dim, heads = cfg.hidden_size, cfg.num_attention_heads
        head_dim = dim // heads

        q = nn.Dense(dim, name="q_proj")(hidden)
        k = nn.Dense(dim, name="k_proj")(hidden)
        v = nn.Dense(dim, name="v_proj")(hidden)

        def split(x):
            return x.reshape(*x.shape[:-1], heads, head_dim).swapaxes(-3, -2)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("...hqd,...hkd->...hqk", q, k) / np.sqrt(head_dim)
        scores = scores + causal_mask
        probs = nn.softmax(scores, axis=-1)
        out = jnp.einsum("...hqk,...hkd->...hqd", probs, v)
        out = out.swapaxes(-3, -2).reshape(*hidden.shape)
        return nn.Dense(dim, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, hidden, causal_mask):
        cfg = self.config
        residual = hidden
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm1")(hidden)
        hidden = CLIPAttention(cfg, name="self_attn")(hidden, causal_mask)
        hidden = residual + hidden

        residual = hidden
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm2")(hidden)
        hidden = nn.Dense(cfg.intermediate_size, name="mlp_fc1")(hidden)
        hidden = _act(cfg.hidden_act)(hidden)
        hidden = nn.Dense(cfg.hidden_size, name="mlp_fc2")(hidden)
        return residual + hidden


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids):
        """input_ids [B, T] -> final-layer hidden states [B, T, D]."""
        cfg = self.config
        seq_len = input_ids.shape[-1]

        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="token_embedding")(
            input_ids
        )
        positions = jnp.arange(seq_len)[None, :]
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, name="position_embedding"
        )(positions)
        hidden = tok + pos

        causal_mask = jnp.triu(
            jnp.full((seq_len, seq_len), -jnp.inf, dtype=hidden.dtype), k=1
        )

        for i in range(cfg.num_hidden_layers):
            hidden = CLIPEncoderLayer(cfg, name=f"layers_{i}")(hidden, causal_mask)

        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_layer_norm")(
            hidden
        )
        return hidden
