"""NUMERIC validation of the HF->flax weight converter.

The structural round-trip in test_sd_weights.py uses the converter's own name
map in both directions; these tests break that circularity:

* The CLIP tower is converted from a REAL `transformers` torch CLIPTextModel
  state_dict (real HF tensor names, torch CPU reference activations) and must
  match its last_hidden_state numerically.
* The layout transforms (torch OIHW conv -> flax HWIO, torch [out,in] linear
  -> flax [in,out]) are golden-tested against torch.nn.functional directly.
* A full synthesized safetensors checkpoint directory round-trips through
  `load_sd_params` + `StableDiffusion(weights_dir=...)`, covering the
  production loading path end-to-end (reference sd.py:77-92 downloads these
  checkpoints; this framework converts a local snapshot).
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from voxe_tpu.models.sd.clip_text import CLIPTextModel
from voxe_tpu.models.sd.config import tiny_test_config
from voxe_tpu.models.sd.weights import (
    _conv_kernel,
    _linear_kernel,
    clip_name_fn,
    convert_params,
)


@pytest.mark.parametrize("hidden_act", ["gelu", "quick_gelu"])
def test_clip_matches_transformers_numerically(hidden_act):
    """Convert a real transformers CLIPTextModel (true HF tensor names) and
    require numeric parity of the final hidden states. Covers both the SD 2.x
    ("gelu") and SD 1.x ("quick_gelu") text towers."""
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel as HFCLIPTextModel

    import dataclasses

    cfg = dataclasses.replace(tiny_test_config().clip, hidden_act=hidden_act)
    hf_cfg = HFCLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act=cfg.hidden_act,
        layer_norm_eps=cfg.layer_norm_eps,
    )
    torch.manual_seed(0)
    hf_model = HFCLIPTextModel(hf_cfg).eval()
    tensors = {k: v.numpy() for k, v in hf_model.state_dict().items()}

    ours = CLIPTextModel(cfg)
    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 77), dtype=np.int32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    params = convert_params(params, tensors, clip_name_fn)

    flax_out = np.asarray(ours.apply({"params": params}, jnp.asarray(ids)))
    with torch.no_grad():
        torch_out = hf_model(torch.tensor(ids, dtype=torch.long)).last_hidden_state
    np.testing.assert_allclose(
        flax_out, torch_out.numpy(), rtol=1e-3, atol=2e-4
    )


def test_conv_kernel_transform_matches_torch():
    """Converted OIHW->HWIO kernel in a flax Conv == torch conv2d."""
    import flax.linen as nn

    rng = np.random.default_rng(2)
    w = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)  # OIHW
    b = rng.standard_normal((8,)).astype(np.float32)
    x = rng.standard_normal((2, 5, 5, 4)).astype(np.float32)  # NHWC

    torch_y = (
        torch.nn.functional.conv2d(
            torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(w), torch.tensor(b),
            padding=1,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    conv = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)))
    flax_y = conv.apply(
        {"params": {"kernel": jnp.asarray(_conv_kernel(w)), "bias": jnp.asarray(b)}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(flax_y), torch_y, rtol=1e-4, atol=1e-5)


def test_linear_kernel_transform_matches_torch():
    import flax.linen as nn

    rng = np.random.default_rng(3)
    w = rng.standard_normal((8, 4)).astype(np.float32)  # [out, in]
    b = rng.standard_normal((8,)).astype(np.float32)
    x = rng.standard_normal((5, 4)).astype(np.float32)

    torch_y = torch.nn.functional.linear(
        torch.tensor(x), torch.tensor(w), torch.tensor(b)
    ).numpy()
    dense = nn.Dense(8)
    flax_y = dense.apply(
        {"params": {"kernel": jnp.asarray(_linear_kernel(w)), "bias": jnp.asarray(b)}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(flax_y), torch_y, rtol=1e-4, atol=1e-5)


def test_groupnorm_matches_torch():
    """Our GroupNorm convention (scale/bias copied straight through) == torch."""
    import flax.linen as nn

    rng = np.random.default_rng(4)
    ch, groups = 8, 4
    w = rng.standard_normal((ch,)).astype(np.float32)
    b = rng.standard_normal((ch,)).astype(np.float32)
    x = rng.standard_normal((2, 6, 6, ch)).astype(np.float32)

    torch_y = (
        torch.nn.functional.group_norm(
            torch.tensor(x).permute(0, 3, 1, 2), groups,
            torch.tensor(w), torch.tensor(b), eps=1e-6,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-6)
    flax_y = gn.apply(
        {"params": {"scale": jnp.asarray(w), "bias": jnp.asarray(b)}}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(flax_y), torch_y, rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------------------------
# full checkpoint-directory loading path
# ----------------------------------------------------------------------------------


def _write_safetensors(tensor_dict, out_dir):
    from safetensors.numpy import save_file

    out_dir.mkdir(parents=True, exist_ok=True)
    save_file(
        {k: np.ascontiguousarray(np.asarray(v)) for k, v in tensor_dict.items()},
        str(out_dir / "model.safetensors"),
    )


def _write_tiny_tokenizer(out_dir, vocab_size):
    """Minimal byte-level BPE vocab: all printable byte tokens + specials."""
    from voxe_tpu.models.sd.tokenizer import _bytes_to_unicode

    out_dir.mkdir(parents=True, exist_ok=True)
    byte_tokens = list(_bytes_to_unicode().values())
    vocab = {}
    for tok in byte_tokens:
        vocab[tok] = len(vocab)
    for tok in byte_tokens:
        vocab[tok + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(out_dir / "vocab.json", "w") as f:
        json.dump(vocab, f)
    (out_dir / "merges.txt").write_text("#version: 0.2\n")


def test_checkpoint_dir_loads_into_stable_diffusion(tmp_path):
    """Synthesize a full HF-layout snapshot (safetensors in diffusers naming,
    derived by inverse transform) and load it through the production path."""
    from tests.test_sd_weights import _synthesize_hf_dict
    from voxe_tpu.models.sd import StableDiffusion
    from voxe_tpu.models.sd.unet import UNet2DConditionModel
    from voxe_tpu.models.sd.vae import AutoencoderKL
    from voxe_tpu.models.sd.weights import unet_name_fn, vae_name_fn

    cfg = tiny_test_config()
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(5)

    def randomized(params):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        leaves = [
            jnp.asarray(0.05 * rng.standard_normal(l.shape), jnp.float32)
            for l in leaves
        ]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    clip = CLIPTextModel(cfg.clip)
    clip_params = randomized(clip.init(key, jnp.zeros((1, 77), jnp.int32))["params"])
    vae = AutoencoderKL(cfg.vae)
    vae_params = randomized(
        vae.init(key, jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))["params"]
    )
    unet = UNet2DConditionModel(cfg.unet)
    latent = cfg.latent_size
    unet_params = randomized(
        unet.init(
            key,
            jnp.zeros((1, latent, latent, cfg.unet.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, 77, cfg.unet.cross_attention_dim)),
        )["params"]
    )

    _write_safetensors(
        _synthesize_hf_dict(clip_params, clip_name_fn, {}), tmp_path / "text_encoder"
    )
    _write_safetensors(
        _synthesize_hf_dict(vae_params, vae_name_fn, {}), tmp_path / "vae"
    )
    _write_safetensors(
        _synthesize_hf_dict(unet_params, unet_name_fn, {}), tmp_path / "unet"
    )
    _write_tiny_tokenizer(tmp_path / "tokenizer", cfg.clip.vocab_size)

    sd = StableDiffusion(config=cfg, weights_dir=tmp_path, unet_dtype=jnp.float32)

    # converted leaves == the source trees (loading path is lossless)
    for ours, loaded in ((clip_params, sd.params["clip"]), (vae_params, sd.params["vae"]),
                         (unet_params, sd.params["unet"])):
        a = jax.tree_util.tree_leaves(ours)
        b = jax.tree_util.tree_leaves(loaded)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)

    # the real tokenizer (not the hash fallback) is active and functional
    ids = sd.tokenizer("a yarn dog")
    assert ids.shape == (1, 77)
    emb = sd.get_text_embeds("a yarn dog", "")
    assert emb.shape == (2, 77, cfg.clip.hidden_size)
    assert np.isfinite(np.asarray(emb)).all()


# ====================================================================================
# UNet / VAE block-level torch parity (VERDICT r3 missing-1 / next-3)
#
# diffusers is not installed, so each block is hand-assembled IN TORCH with
# diffusers' exact parameter names (its state_dict keys are what real SD
# checkpoints contain) and diffusers' published forward semantics. The torch
# reference is initialized randomly, its state dict is fed through OUR
# converter (weights.py name maps + layout transforms), and the flax module
# must reproduce the torch activations. This breaks the converter circularity
# that previously only the CLIP tower escaped: a wrong name map, a wrong
# OIHW->HWIO transpose, a wrong norm epsilon, or wrong block wiring all fail
# here. Reference forward semantics: thre3d_atom/thre3d_reprs/sd.py:77-92
# loads these exact architectures.
# ====================================================================================

import math  # noqa: E402

import torch.nn.functional as TF  # noqa: E402
from torch import nn as tnn  # noqa: E402

from voxe_tpu.models.sd.config import tiny_test_config as _tiny_cfg  # noqa: E402
from voxe_tpu.models.sd.unet import (  # noqa: E402
    BasicTransformerBlock,
    ResnetBlock2D,
    Transformer2D,
    UNet2DConditionModel,
    timestep_embedding,
)
from voxe_tpu.models.sd.vae import (  # noqa: E402
    AttnBlock,
    AutoencoderKL,
    ResnetBlock as VAEResnetBlock,
)
from voxe_tpu.models.sd.weights import unet_name_fn, vae_name_fn  # noqa: E402

ATOL = 1e-4


def _np(t):
    return t.detach().numpy()


def _nhwc(t):  # torch NCHW tensor -> numpy NHWC
    return _np(t.permute(0, 2, 3, 1))


def _convert_from_torch(flax_params, torch_module, name_fn, prefix: str = ""):
    tensors = {
        (prefix + k if prefix else k): v.numpy()
        for k, v in torch_module.state_dict().items()
    }
    return convert_params(flax_params, tensors, name_fn)


class _Holder(tnn.Module):
    """Bare module used to reproduce diffusers' nested attribute names."""


# ---- torch reference blocks (diffusers parameter names + semantics) ----


class TorchResnetBlock2D(tnn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, groups):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch, eps=1e-5)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_dim, out_ch)
        self.norm2 = tnn.GroupNorm(groups, out_ch, eps=1e-5)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            tnn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x, temb):
        h = self.conv1(TF.silu(self.norm1(x)))
        h = h + self.time_emb_proj(TF.silu(temb))[:, :, None, None]
        h = self.conv2(TF.silu(self.norm2(h)))
        sc = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return sc + h


class TorchVAEResnetBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, groups):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch, eps=1e-6)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = tnn.GroupNorm(groups, out_ch, eps=1e-6)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            tnn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x):
        h = self.conv1(TF.silu(self.norm1(x)))
        h = self.conv2(TF.silu(self.norm2(h)))
        sc = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return sc + h


class TorchAttention(tnn.Module):
    """Multi-head attention with diffusers' to_q/to_k/to_v/to_out.0 names."""

    def __init__(self, dim, heads, context_dim=None):
        super().__init__()
        self.heads = heads
        ctx = context_dim or dim
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(ctx, dim, bias=False)
        self.to_v = tnn.Linear(ctx, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        B, T, C = x.shape
        h, d = self.heads, C // self.heads
        q = self.to_q(x).reshape(B, T, h, d).transpose(1, 2)
        k = self.to_k(ctx).reshape(B, ctx.shape[1], h, d).transpose(1, 2)
        v = self.to_v(ctx).reshape(B, ctx.shape[1], h, d).transpose(1, 2)
        probs = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
        out = (probs @ v).transpose(1, 2).reshape(B, T, C)
        return self.to_out[0](out)


class TorchGEGLU(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = tnn.Linear(dim, dim * 8)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * TF.gelu(gate)  # exact erf gelu (diffusers GEGLU)


class TorchFeedForward(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = tnn.ModuleList(
            [TorchGEGLU(dim), tnn.Identity(), tnn.Linear(dim * 4, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TorchBasicTransformerBlock(tnn.Module):
    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TorchAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TorchAttention(dim, heads, ctx_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TorchFeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class TorchTransformer2D(tnn.Module):
    def __init__(self, dim, heads, ctx_dim, groups, use_linear_projection):
        super().__init__()
        self.use_linear = use_linear_projection
        self.norm = tnn.GroupNorm(groups, dim, eps=1e-6)
        if use_linear_projection:  # SD 2.x storage
            self.proj_in = tnn.Linear(dim, dim)
            self.proj_out = tnn.Linear(dim, dim)
        else:  # SD 1.x storage: 1x1 convs
            self.proj_in = tnn.Conv2d(dim, dim, 1)
            self.proj_out = tnn.Conv2d(dim, dim, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TorchBasicTransformerBlock(dim, heads, ctx_dim)]
        )

    def forward(self, x, context):
        B, C, H, W = x.shape
        residual = x
        h = self.norm(x)
        if self.use_linear:
            h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
            h = self.proj_in(h)
        else:
            h = self.proj_in(h).permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.transformer_blocks[0](h, context)
        if self.use_linear:
            h = self.proj_out(h)
            h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        else:
            h = self.proj_out(h.reshape(B, H, W, C).permute(0, 3, 1, 2))
        return h + residual


class TorchVAEAttnBlock(tnn.Module):
    """Diffusers VAE mid-block attention: single head over H*W tokens."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        self.to_out = tnn.ModuleList([tnn.Linear(ch, ch)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        probs = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(C), dim=-1)
        out = self.to_out[0](probs @ v)
        return x + out.reshape(B, H, W, C).permute(0, 3, 1, 2)


# ---- block-level parity tests ----


@pytest.mark.parametrize("channels", [(8, 8), (8, 16)], ids=["same-ch", "shortcut"])
def test_unet_resnet_block_matches_torch(channels):
    in_ch, out_ch = channels
    groups, temb_dim = 4, 24
    torch.manual_seed(0)
    ref = TorchResnetBlock2D(in_ch, out_ch, temb_dim, groups).eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 6, in_ch)).astype(np.float32)
    temb = rng.standard_normal((2, temb_dim)).astype(np.float32)

    ours = ResnetBlock2D(out_ch, groups)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(temb))[
        "params"
    ]
    # name the torch block as a down-block resnet so unet_name_fn resolves it
    def name_fn(path):
        return unet_name_fn(f"down_0_resnet_0/{path}")

    params = _convert_from_torch(params, ref, name_fn, prefix="down_blocks.0.resnets.0.")
    y = np.asarray(ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(temb)))
    with torch.no_grad():
        y_ref = _nhwc(
            ref(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(temb))
        )
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=ATOL)


def test_basic_transformer_block_matches_torch():
    dim, heads, ctx_dim, T = 16, 4, 32, 12
    torch.manual_seed(1)
    ref = TorchBasicTransformerBlock(dim, heads, ctx_dim).eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, T, dim)).astype(np.float32)
    ctx = rng.standard_normal((2, 7, ctx_dim)).astype(np.float32)

    ours = BasicTransformerBlock(heads)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx))[
        "params"
    ]

    def name_fn(path):
        return unet_name_fn(f"down_0_attn_0/transformer_blocks_0/{path}")

    params = _convert_from_torch(
        params, ref, name_fn,
        prefix="down_blocks.0.attentions.0.transformer_blocks.0.",
    )
    y = np.asarray(ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(ctx)))
    with torch.no_grad():
        y_ref = _np(ref(torch.tensor(x), torch.tensor(ctx)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=ATOL)


@pytest.mark.parametrize("use_linear", [True, False], ids=["sd2-linear", "sd1-conv1x1"])
def test_transformer2d_matches_torch_both_proj_storages(use_linear):
    """proj_in/proj_out are stored as Linear in SD 2.x and as 1x1 Conv2d in
    SD 1.x; the converter must produce identical math from either."""
    dim, heads, ctx_dim, groups = 16, 4, 32, 4
    torch.manual_seed(2)
    ref = TorchTransformer2D(dim, heads, ctx_dim, groups, use_linear).eval()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6, 6, dim)).astype(np.float32)
    ctx = rng.standard_normal((2, 7, ctx_dim)).astype(np.float32)

    ours = Transformer2D(heads, groups)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx))[
        "params"
    ]

    def name_fn(path):
        return unet_name_fn(f"down_0_attn_0/{path}")

    params = _convert_from_torch(
        params, ref, name_fn, prefix="down_blocks.0.attentions.0."
    )
    y = np.asarray(ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(ctx)))
    with torch.no_grad():
        y_ref = _nhwc(ref(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(ctx)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=ATOL)


@pytest.mark.parametrize("channels", [(8, 8), (8, 16)], ids=["same-ch", "shortcut"])
def test_vae_resnet_block_matches_torch(channels):
    in_ch, out_ch, groups = *channels, 4
    torch.manual_seed(3)
    ref = TorchVAEResnetBlock(in_ch, out_ch, groups).eval()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 6, 6, in_ch)).astype(np.float32)

    ours = VAEResnetBlock(out_ch, groups)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    def name_fn(path):
        return vae_name_fn(f"encoder/down_0_resnet_0/{path}")

    params = _convert_from_torch(
        params, ref, name_fn, prefix="encoder.down_blocks.0.resnets.0."
    )
    y = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        y_ref = _nhwc(ref(torch.tensor(x).permute(0, 3, 1, 2)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=ATOL)


@pytest.mark.parametrize("legacy_names", [False, True], ids=["to_q", "query-alias"])
def test_vae_attn_block_matches_torch(legacy_names):
    """The VAE mid-block attention, under both diffusers namings: modern
    to_q/to_k/to_v/to_out.0 and the legacy query/key/value/proj_attn aliases
    older SD checkpoints carry (weights.py _VAE_ATTN_ALIASES)."""
    ch, groups = 16, 4
    torch.manual_seed(4)
    ref = TorchVAEAttnBlock(ch, groups).eval()
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 5, 5, ch)).astype(np.float32)

    ours = AttnBlock(groups)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    tensors = {
        f"encoder.mid_block.attentions.0.{k}": v.numpy()
        for k, v in ref.state_dict().items()
    }
    if legacy_names:
        renames = {
            "to_q": "query", "to_k": "key", "to_v": "value",
            "to_out.0": "proj_attn",
        }
        renamed = {}
        for k, v in tensors.items():
            for new, old in renames.items():
                k = k.replace(f".{new}.", f".{old}.")
            renamed[k] = v
        tensors = renamed

    def name_fn(path):
        return vae_name_fn(f"encoder/mid_attn/{path}")

    params = convert_params(params, tensors, name_fn)
    y = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        y_ref = _nhwc(ref(torch.tensor(x).permute(0, 3, 1, 2)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=ATOL)


def test_timestep_embedding_matches_torch_reference():
    """Sinusoidal embedding vs an independent torch implementation of
    diffusers' get_timestep_embedding (flip_sin_to_cos=True, shift 0)."""
    dim = 32
    t = np.asarray([0.0, 1.0, 499.0, 999.0], np.float32)
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float64) / half
    emb = torch.tensor(t, dtype=torch.float64)[:, None] * exponent.exp()[None]
    ref = torch.cat([emb.cos(), emb.sin()], dim=-1).numpy()
    ours = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


# ---- full-model parity (tiny config, full topology) ----


class TorchTinyUNet(tnn.Module):
    """diffusers-named tiny UNet matching tiny_test_config().unet topology."""

    def __init__(self, cfg):
        super().__init__()
        ch = cfg.block_out_channels
        tdim = ch[0] * 4
        num_levels = len(ch)
        self.conv_in = tnn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = _Holder()
        self.time_embedding.linear_1 = tnn.Linear(ch[0], tdim)
        self.time_embedding.linear_2 = tnn.Linear(tdim, tdim)

        self.down_blocks = tnn.ModuleList()
        in_ch = ch[0]
        for level in range(num_levels):
            block = _Holder()
            block.resnets = tnn.ModuleList()
            is_cross = cfg.down_block_types[level] == "CrossAttnDownBlock2D"
            if is_cross:
                block.attentions = tnn.ModuleList()
            for _ in range(cfg.layers_per_block):
                block.resnets.append(
                    TorchResnetBlock2D(in_ch, ch[level], tdim, cfg.norm_num_groups)
                )
                in_ch = ch[level]
                if is_cross:
                    block.attentions.append(
                        TorchTransformer2D(
                            ch[level], cfg.attention_head_dim[level],
                            cfg.cross_attention_dim, cfg.norm_num_groups,
                            use_linear_projection=True,
                        )
                    )
            if level != num_levels - 1:
                ds = _Holder()
                ds.conv = tnn.Conv2d(ch[level], ch[level], 3, stride=2, padding=1)
                block.downsamplers = tnn.ModuleList([ds])
            self.down_blocks.append(block)

        self.mid_block = _Holder()
        self.mid_block.resnets = tnn.ModuleList(
            [
                TorchResnetBlock2D(ch[-1], ch[-1], tdim, cfg.norm_num_groups),
                TorchResnetBlock2D(ch[-1], ch[-1], tdim, cfg.norm_num_groups),
            ]
        )
        self.mid_block.attentions = tnn.ModuleList(
            [
                TorchTransformer2D(
                    ch[-1], cfg.attention_head_dim[-1], cfg.cross_attention_dim,
                    cfg.norm_num_groups, use_linear_projection=True,
                )
            ]
        )

        self.up_blocks = tnn.ModuleList()
        skip_chs = [ch[0]]
        for level in range(num_levels):
            for _ in range(cfg.layers_per_block):
                skip_chs.append(ch[level])
            if level != num_levels - 1:
                skip_chs.append(ch[level])
        h_ch = ch[-1]
        for up_idx in range(num_levels):
            level = num_levels - 1 - up_idx
            block = _Holder()
            block.resnets = tnn.ModuleList()
            is_cross = cfg.up_block_types[up_idx] == "CrossAttnUpBlock2D"
            if is_cross:
                block.attentions = tnn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                skip = skip_chs.pop()
                block.resnets.append(
                    TorchResnetBlock2D(
                        h_ch + skip, ch[level], tdim, cfg.norm_num_groups
                    )
                )
                h_ch = ch[level]
                if is_cross:
                    block.attentions.append(
                        TorchTransformer2D(
                            ch[level], cfg.attention_head_dim[level],
                            cfg.cross_attention_dim, cfg.norm_num_groups,
                            use_linear_projection=True,
                        )
                    )
            if up_idx != num_levels - 1:
                us = _Holder()
                us.conv = tnn.Conv2d(ch[level], ch[level], 3, padding=1)
                block.upsamplers = tnn.ModuleList([us])
            self.up_blocks.append(block)

        self.conv_norm_out = tnn.GroupNorm(cfg.norm_num_groups, ch[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)
        self.cfg = cfg

    def forward(self, sample, t, context):
        cfg = self.cfg
        ch0 = cfg.block_out_channels[0]
        half = ch0 // 2
        exponent = -math.log(10000.0) * torch.arange(
            half, dtype=torch.float32
        ) / half
        emb = t[:, None].float() * exponent.exp()[None]
        temb = torch.cat([emb.cos(), emb.sin()], dim=-1)  # flip_sin_to_cos
        temb = self.time_embedding.linear_2(
            TF.silu(self.time_embedding.linear_1(temb))
        )

        h = self.conv_in(sample)
        skips = [h]
        for block in self.down_blocks:
            for j, resnet in enumerate(block.resnets):
                h = resnet(h, temb)
                if hasattr(block, "attentions"):
                    h = block.attentions[j](h, context)
                skips.append(h)
            if hasattr(block, "downsamplers"):
                h = block.downsamplers[0].conv(h)
                skips.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, temb)

        for block in self.up_blocks:
            for j, resnet in enumerate(block.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = resnet(h, temb)
                if hasattr(block, "attentions"):
                    h = block.attentions[j](h, context)
            if hasattr(block, "upsamplers"):
                h = TF.interpolate(h, scale_factor=2.0, mode="nearest")
                h = block.upsamplers[0].conv(h)

        return self.conv_out(TF.silu(self.conv_norm_out(h)))


def test_full_tiny_unet_matches_torch():
    """The complete tiny-config UNet forward (full topology: cross/plain down
    blocks, mid, skip concats, up path, nearest upsample) vs the torch
    composition on the SAME converted checkpoint."""
    cfg = _tiny_cfg().unet
    torch.manual_seed(5)
    ref = TorchTinyUNet(cfg).eval()
    rng = np.random.default_rng(5)
    B, S = 2, cfg.sample_size
    x = rng.standard_normal((B, S, S, cfg.in_channels)).astype(np.float32)
    ctx = rng.standard_normal((B, 7, cfg.cross_attention_dim)).astype(np.float32)
    t = np.asarray([137.0, 890.0], np.float32)

    ours = UNet2DConditionModel(cfg)
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
    )["params"]
    params = _convert_from_torch(params, ref, unet_name_fn)
    y = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))
    )
    with torch.no_grad():
        y_ref = _nhwc(
            ref(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(t), torch.tensor(ctx))
        )
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=ATOL)


class TorchTinyVAEEncoder(tnn.Module):
    """diffusers-named tiny VAE encoder + quant_conv (the SDS-critical half:
    the encode path runs WITH gradients inside the SDS loss, sd.py:191-199)."""

    def __init__(self, cfg):
        super().__init__()
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.encoder = _Holder()
        self.encoder.conv_in = tnn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.encoder.down_blocks = tnn.ModuleList()
        in_ch = ch[0]
        for level, out_ch in enumerate(ch):
            block = _Holder()
            block.resnets = tnn.ModuleList()
            for _ in range(cfg.layers_per_block):
                block.resnets.append(TorchVAEResnetBlock(in_ch, out_ch, g))
                in_ch = out_ch
            if level != len(ch) - 1:
                ds = _Holder()
                # diffusers VAE Downsample2D: asymmetric (0,1,0,1) pad + valid
                ds.conv = tnn.Conv2d(out_ch, out_ch, 3, stride=2, padding=0)
                block.downsamplers = tnn.ModuleList([ds])
            self.encoder.down_blocks.append(block)
        self.encoder.mid_block = _Holder()
        self.encoder.mid_block.resnets = tnn.ModuleList(
            [TorchVAEResnetBlock(ch[-1], ch[-1], g), TorchVAEResnetBlock(ch[-1], ch[-1], g)]
        )
        self.encoder.mid_block.attentions = tnn.ModuleList(
            [TorchVAEAttnBlock(ch[-1], g)]
        )
        self.encoder.conv_norm_out = tnn.GroupNorm(g, ch[-1], eps=1e-6)
        self.encoder.conv_out = tnn.Conv2d(
            ch[-1], 2 * cfg.latent_channels, 3, padding=1
        )
        self.quant_conv = tnn.Conv2d(
            2 * cfg.latent_channels, 2 * cfg.latent_channels, 1
        )

    def forward(self, x):
        h = self.encoder.conv_in(x)
        for block in self.encoder.down_blocks:
            for resnet in block.resnets:
                h = resnet(h)
            if hasattr(block, "downsamplers"):
                h = TF.pad(h, (0, 1, 0, 1))
                h = block.downsamplers[0].conv(h)
        h = self.encoder.mid_block.resnets[0](h)
        h = self.encoder.mid_block.attentions[0](h)
        h = self.encoder.mid_block.resnets[1](h)
        h = self.encoder.conv_out(TF.silu(self.encoder.conv_norm_out(h)))
        return self.quant_conv(h)


def test_full_tiny_vae_encode_matches_torch():
    cfg = _tiny_cfg().vae
    torch.manual_seed(6)
    ref = TorchTinyVAEEncoder(cfg).eval()
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)

    ours = AutoencoderKL(cfg)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    # fill encoder + quant_conv from torch; the decoder keeps random init
    # (mask the decoder/post_quant paths out of the conversion walk)
    tensors = {k: v.numpy() for k, v in ref.state_dict().items()}

    def partial_convert(tree, path=""):
        if isinstance(tree, dict):
            return {
                k: partial_convert(v, f"{path}/{k}" if path else k)
                for k, v in tree.items()
            }
        top = path.split("/")[0]
        if top in ("decoder", "post_quant_conv"):
            return tree  # untouched random init
        return convert_params({path.split("/")[-1]: tree}, tensors,
                              lambda _p, _path=path: vae_name_fn(_path))[
            path.split("/")[-1]
        ]

    params = partial_convert(params)
    mean, logvar = ours.apply(
        {"params": params}, jnp.asarray(x), method=AutoencoderKL.encode_moments
    )
    moments = np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=-1)
    with torch.no_grad():
        ref_moments = _nhwc(ref(torch.tensor(x).permute(0, 3, 1, 2)))
    # ours clips logvar to [-30, 20]; random-weight moments stay inside
    np.testing.assert_allclose(moments, ref_moments, rtol=1e-4, atol=ATOL)


class TorchTinyVAEDecoder(tnn.Module):
    """diffusers-named tiny VAE decoder + post_quant_conv (the prompt_to_img
    decode path: reference sd.py:282-289 decode_latents)."""

    def __init__(self, cfg):
        super().__init__()
        ch_rev = tuple(reversed(cfg.block_out_channels))
        g = cfg.norm_num_groups
        self.post_quant_conv = tnn.Conv2d(
            cfg.latent_channels, cfg.latent_channels, 1
        )
        self.decoder = _Holder()
        self.decoder.conv_in = tnn.Conv2d(
            cfg.latent_channels, ch_rev[0], 3, padding=1
        )
        self.decoder.mid_block = _Holder()
        self.decoder.mid_block.resnets = tnn.ModuleList(
            [
                TorchVAEResnetBlock(ch_rev[0], ch_rev[0], g),
                TorchVAEResnetBlock(ch_rev[0], ch_rev[0], g),
            ]
        )
        self.decoder.mid_block.attentions = tnn.ModuleList(
            [TorchVAEAttnBlock(ch_rev[0], g)]
        )
        self.decoder.up_blocks = tnn.ModuleList()
        in_ch = ch_rev[0]
        for level, out_ch in enumerate(ch_rev):
            block = _Holder()
            block.resnets = tnn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                block.resnets.append(TorchVAEResnetBlock(in_ch, out_ch, g))
                in_ch = out_ch
            if level != len(ch_rev) - 1:
                up = _Holder()
                up.conv = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
                block.upsamplers = tnn.ModuleList([up])
            self.decoder.up_blocks.append(block)
        self.decoder.conv_norm_out = tnn.GroupNorm(g, ch_rev[-1], eps=1e-6)
        self.decoder.conv_out = tnn.Conv2d(ch_rev[-1], cfg.out_channels, 3, padding=1)

    def forward(self, latents_scaled, scaling_factor):
        h = self.decoder.conv_in(self.post_quant_conv(latents_scaled / scaling_factor))
        h = self.decoder.mid_block.resnets[0](h)
        h = self.decoder.mid_block.attentions[0](h)
        h = self.decoder.mid_block.resnets[1](h)
        for block in self.decoder.up_blocks:
            for resnet in block.resnets:
                h = resnet(h)
            if hasattr(block, "upsamplers"):
                h = TF.interpolate(h, scale_factor=2.0, mode="nearest")
                h = block.upsamplers[0].conv(h)
        return self.decoder.conv_out(TF.silu(self.decoder.conv_norm_out(h)))


def _convert_vae_subtree(ours, params, torch_module, keep_random):
    """Convert a torch VAE sub-module into the flax tree, leaving the
    `keep_random` top-level branches at their random init."""
    tensors = {k: v.numpy() for k, v in torch_module.state_dict().items()}

    def walk(tree, path=""):
        if isinstance(tree, dict):
            return {
                k: walk(v, f"{path}/{k}" if path else k) for k, v in tree.items()
            }
        if path.split("/")[0] in keep_random:
            return tree
        leaf = path.split("/")[-1]
        return convert_params(
            {leaf: tree}, tensors, lambda _p, _path=path: vae_name_fn(_path)
        )[leaf]

    return walk(params)


def test_decode_latents_matches_torch():
    """`decode_latents` (post_quant_conv + decoder + [0,1] remap) vs the torch
    composition on the same converted weights — the other half of the
    prompt_to_img surface (reference sd.py:282-289)."""
    from voxe_tpu.models.sd.sds import StableDiffusion

    cfg = _tiny_cfg(image_size=16)
    torch.manual_seed(8)
    ref = TorchTinyVAEDecoder(cfg.vae).eval()
    sd = StableDiffusion(config=cfg, unet_dtype=jnp.float32)
    sd.params["vae"] = _convert_vae_subtree(
        sd.vae, sd.params["vae"], ref, keep_random=("encoder", "quant_conv")
    )

    rng = np.random.default_rng(8)
    latents = rng.standard_normal((2, 8, 8, cfg.vae.latent_channels)).astype(
        np.float32
    )
    imgs = np.asarray(sd.decode_latents(sd.params["vae"], jnp.asarray(latents)))
    with torch.no_grad():
        raw = _nhwc(
            ref(
                torch.tensor(latents).permute(0, 3, 1, 2),
                float(cfg.vae.scaling_factor),
            )
        )
    ref_imgs = np.clip(raw / 2.0 + 0.5, 0.0, 1.0)
    np.testing.assert_allclose(imgs, ref_imgs, rtol=1e-4, atol=ATOL)


def test_ddim_sampling_loop_matches_torch():
    """The FULL text-to-image sampling loop (`produce_latents`: timestep
    schedule, CFG combine, DDIM eta=0 update, loop composition) vs a
    step-by-step torch DDIM driving the torch tiny UNet on the same converted
    weights (reference sd.py:236-271). The scheduler is unit-tested on its
    own (test_sd.py); this pins the COMPOSITION — timestep order, a_prev
    indexing at the final step, CFG sign, latent threading."""
    from voxe_tpu.models.sd.sds import StableDiffusion

    cfg = _tiny_cfg(image_size=16)
    torch.manual_seed(7)
    ref_unet = TorchTinyUNet(cfg.unet).eval()
    sd = StableDiffusion(config=cfg, unet_dtype=jnp.float32)
    sd.params["unet"] = _convert_from_torch(
        sd.params["unet"], ref_unet, unet_name_fn
    )

    rng = np.random.default_rng(7)
    D = cfg.unet.cross_attention_dim
    text_embeddings = rng.standard_normal((2, 7, D)).astype(np.float32)
    latents0 = rng.standard_normal((1, 8, 8, cfg.unet.in_channels)).astype(
        np.float32
    )
    gs = 7.5
    n_steps = 5

    ours = np.asarray(
        sd.produce_latents(
            jnp.asarray(text_embeddings),
            jax.random.PRNGKey(0),  # unused: explicit initial latents
            height=16,
            width=16,
            num_inference_steps=n_steps,
            guidance_scale=gs,
            latents=jnp.asarray(latents0),
        )
    )

    ts = np.asarray(sd.scheduler.timesteps(n_steps))
    ac = np.asarray(sd.scheduler.alphas_cumprod, np.float64)
    lat = torch.tensor(latents0).permute(0, 3, 1, 2)
    ctx = torch.tensor(text_embeddings)
    with torch.no_grad():
        for i, t in enumerate(ts):
            inp = torch.cat([lat] * 2, dim=0)
            eps = ref_unet(inp, torch.full((2,), float(t)), ctx)
            uncond, text = eps.chunk(2, dim=0)
            eps = text + gs * (text - uncond)
            a_t = ac[t]
            a_prev = ac[ts[i + 1]] if i + 1 < len(ts) else 1.0
            x0 = (lat - math.sqrt(1.0 - a_t) * eps) / math.sqrt(a_t)
            lat = math.sqrt(a_prev) * x0 + math.sqrt(1.0 - a_prev) * eps
    ref_lat = _nhwc(lat)

    np.testing.assert_allclose(ours, ref_lat, rtol=1e-3, atol=1e-4)


def test_prompt_to_img_smoke():
    """`prompt_to_img` end-to-end (tokenize -> CLIP -> sampling loop ->
    decode -> uint8) at tiny config: the first thing a user runs to
    sanity-check staged real weights must execute and produce a well-formed
    image (reference sd.py:291-303)."""
    from voxe_tpu.models.sd.sds import StableDiffusion

    cfg = _tiny_cfg(image_size=16)
    sd = StableDiffusion(config=cfg, unet_dtype=jnp.float32)
    img = sd.prompt_to_img(
        "a photo of a dog", key=jax.random.PRNGKey(3), num_inference_steps=2
    )
    assert img.shape == (1, 16, 16, 3)
    assert img.dtype == np.uint8
