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
