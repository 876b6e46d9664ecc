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
