"""Structural round-trip test for the HF->flax weight converter.

Synthesizes an HF-style tensor dict by walking our flax tree with the same
name map and inverse layout transforms, then converts it back and checks
values land on the right leaves with the right shapes. (Name correctness vs
a real HF snapshot can only be validated with actual weights present.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxe_tpu.models.sd.clip_text import CLIPTextModel
from voxe_tpu.models.sd.config import tiny_test_config
from voxe_tpu.models.sd.unet import UNet2DConditionModel
from voxe_tpu.models.sd.vae import AutoencoderKL
from voxe_tpu.models.sd.weights import (
    clip_name_fn,
    convert_params,
    unet_name_fn,
    vae_name_fn,
)


def _inverse_transform(leaf, kind, tensor):
    t = np.asarray(tensor)
    if leaf in ("scale", "bias") or kind == "norm" or leaf == "embedding":
        return t
    if kind == "conv":
        return np.transpose(t, (3, 2, 0, 1))  # HWIO -> OIHW
    if kind == "linear":
        return np.transpose(t, (1, 0))
    return t


def _synthesize_hf_dict(tree, name_fn, out, path=""):
    if isinstance(tree, dict):
        for key in tree:
            _synthesize_hf_dict(
                tree[key], name_fn, out, f"{path}/{key}" if path else key
            )
        return out
    candidates, kind = name_fn(path)
    leaf = path.split("/")[-1]
    out[candidates[0]] = _inverse_transform(leaf, kind, tree)
    return out


def _roundtrip(module, init_args, name_fn):
    key = jax.random.PRNGKey(0)
    params = module.init(key, *init_args)["params"]
    # fill with distinct random values so value equality is meaningful
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(0)
    leaves = [jnp.asarray(rng.standard_normal(l.shape), jnp.float32) for l in leaves]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    hf_dict = _synthesize_hf_dict(params, name_fn, {})
    converted = convert_params(params, hf_dict, name_fn)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(converted))
    for path, value in flat_a:
        np.testing.assert_allclose(
            np.asarray(value), np.asarray(flat_b[path]), err_msg=str(path)
        )


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


def test_clip_weight_roundtrip(cfg):
    _roundtrip(
        CLIPTextModel(cfg.clip), (jnp.zeros((1, 77), jnp.int32),), clip_name_fn
    )


def test_vae_weight_roundtrip(cfg):
    _roundtrip(
        AutoencoderKL(cfg.vae),
        (jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),),
        vae_name_fn,
    )


def test_unet_weight_roundtrip(cfg):
    latent = cfg.latent_size
    _roundtrip(
        UNet2DConditionModel(cfg.unet),
        (
            jnp.zeros((1, latent, latent, cfg.unet.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, 77, cfg.unet.cross_attention_dim)),
        ),
        unet_name_fn,
    )


# ----------------------------------------------------------------------------------
# non-circular name validation: the round-trips above synthesize HF names with
# the same name_fn they test, so a systematically wrong name passes silently
# (this hid a bug where every 2-segment VAE path produced
# 'encoder.conv_in.kernel.weight'-style names and real snapshots could never
# load). These tests pin the names independently.
# ----------------------------------------------------------------------------------
import re as _re


def _walk_paths(tree, path=""):
    if isinstance(tree, dict):
        for key in tree:
            yield from _walk_paths(tree[key], f"{path}/{key}" if path else key)
    else:
        yield path


@pytest.mark.parametrize(
    "model,name_fn",
    [("clip", clip_name_fn), ("vae", vae_name_fn), ("unet", unet_name_fn)],
)
def test_hf_names_never_contain_flax_leaves(cfg, model, name_fn):
    """HF torch state-dict names never embed flax leaf names (kernel/scale/
    embedding) or doubled suffixes — any occurrence means a name_fn branch
    fell through and appended the flax leaf to a complete module path."""
    modules = {
        "clip": (CLIPTextModel(cfg.clip), (jnp.zeros((1, 77), jnp.int32),)),
        "vae": (
            AutoencoderKL(cfg.vae),
            (jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),),
        ),
        "unet": (
            UNet2DConditionModel(cfg.unet),
            (
                jnp.zeros((1, cfg.latent_size, cfg.latent_size, cfg.unet.in_channels)),
                jnp.zeros((1,)),
                jnp.zeros((1, 77, cfg.unet.cross_attention_dim)),
            ),
        ),
    }
    module, init_args = modules[model]
    params = module.init(jax.random.PRNGKey(0), *init_args)["params"]
    bad = []
    for path in _walk_paths(params):
        for name in name_fn(path)[0]:
            if _re.search(
                r"\.(kernel|scale|embedding)\.|\.bias\.bias$|\.weight\.weight$", name
            ):
                bad.append((path, name))
    assert not bad, bad


def test_vae_plain_conv_golden_names():
    """Known diffusers AutoencoderKL names for the module kinds that live
    directly under encoder/decoder (the branch the round-trip can't pin)."""
    golden = {
        "encoder/conv_in/kernel": "encoder.conv_in.weight",
        "encoder/conv_in/bias": "encoder.conv_in.bias",
        "encoder/conv_out/kernel": "encoder.conv_out.weight",
        "encoder/conv_norm_out/scale": "encoder.conv_norm_out.weight",
        "encoder/conv_norm_out/bias": "encoder.conv_norm_out.bias",
        "encoder/down_0_downsample/kernel": "encoder.down_blocks.0.downsamplers.0.conv.weight",
        "decoder/up_0_upsample/kernel": "decoder.up_blocks.0.upsamplers.0.conv.weight",
        "decoder/conv_out/bias": "decoder.conv_out.bias",
        "quant_conv/kernel": "quant_conv.weight",
        "post_quant_conv/bias": "post_quant_conv.bias",
        "decoder/mid_resnet_0/norm1/scale": "decoder.mid_block.resnets.0.norm1.weight",
        "encoder/down_0_resnet_0/conv1/kernel": "encoder.down_blocks.0.resnets.0.conv1.weight",
    }
    for path, want in golden.items():
        names, _ = vae_name_fn(path)
        assert names[0] == want, f"{path}: {names[0]} != {want}"
    # norm kind so norm tensors skip the conv transform
    assert vae_name_fn("encoder/conv_norm_out/scale")[1] == "norm"


def test_unet_plain_conv_golden_names():
    golden = {
        "conv_in/kernel": "conv_in.weight",
        "conv_out/bias": "conv_out.bias",
        "conv_norm_out/scale": "conv_norm_out.weight",
        "time_embedding_linear_1/kernel": "time_embedding.linear_1.weight",
        "down_0_downsample/kernel": "down_blocks.0.downsamplers.0.conv.weight",
        "up_1_upsample/kernel": "up_blocks.1.upsamplers.0.conv.weight",
        "down_0_resnet_0/time_emb_proj/kernel": "down_blocks.0.resnets.0.time_emb_proj.weight",
        "mid_resnet_1/norm2/bias": "mid_block.resnets.1.norm2.bias",
    }
    for path, want in golden.items():
        names, _ = unet_name_fn(path)
        assert names[0] == want, f"{path}: {names[0]} != {want}"
