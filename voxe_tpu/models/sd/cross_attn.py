"""Cross-attention map aggregation + per-token extraction.

Rebuild of reference: thre3d_atom/thre3d_reprs/cross_attn.py:167-490 and
gaussian_smoothing.py:8-71. The capture itself happens functionally inside the
UNet (see unet.py `sow`); this module aggregates the collected maps:
average all 16x16 cross-attention maps over down/mid/up layers, slice the
conditional (text) half of the CFG batch, then per requested token: gaussian
smoothing + bilinear upsample to the render resolution.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

AGGREGATION_RES = 16  # reference aggregates 16x16 maps (cross_attn.py:425-436)


def _flatten_capture(attn_maps: Dict) -> List[jnp.ndarray]:
    """The "attn_maps" sow collection is a nested dict of tuples of
    [B, Q, K] head-averaged maps; flatten to a list."""
    leaves = jax.tree_util.tree_leaves(attn_maps)
    return [leaf for leaf in leaves if hasattr(leaf, "ndim") and leaf.ndim == 3]


def aggregate_attention(
    attn_maps: Dict, res: int = AGGREGATION_RES, select: int = 1
) -> jnp.ndarray:
    """Average all captured cross maps with spatial resolution `res` ->
    [res, res, num_tokens] for batch item `select` (the conditional half;
    reference cross_attn.py:425-436)."""
    target_q = res * res
    selected = [m for m in _flatten_capture(attn_maps) if m.shape[1] == target_q]
    assert selected, f"no attention maps at resolution {res}x{res} captured"
    stacked = jnp.stack([m[select] for m in selected])  # [L, Q, K]
    mean_map = jnp.mean(stacked, axis=0)  # [Q, K]
    return mean_map.reshape(res, res, -1)


def gaussian_smooth_2d(image: jnp.ndarray, kernel_size: int = 3, sigma: float = 0.5):
    """Depthwise gaussian blur of a [H, W] map with replicate padding
    (reference gaussian_smoothing.py:8-71 + usage cross_attn.py:469-490)."""
    ax = np.arange(kernel_size) - (kernel_size - 1) / 2.0
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    kernel2d = np.outer(g, g)
    kernel2d = jnp.asarray(kernel2d / kernel2d.sum(), dtype=image.dtype)

    pad = kernel_size // 2
    padded = jnp.pad(image, ((pad, pad), (pad, pad)), mode="edge")
    return jax.lax.conv_general_dilated(
        padded[None, :, :, None],
        kernel2d[:, :, None, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]


def gaussian_smooth_maps(maps: jnp.ndarray, kernel_size: int = 3, sigma: float = 0.5):
    """Batched gaussian blur: [B, H, W] -> [B, H, W] in ONE conv dispatch
    (the per-map loop version recompiled/dispatched per token)."""
    ax = np.arange(kernel_size) - (kernel_size - 1) / 2.0
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    kernel2d = np.outer(g, g)
    kernel2d = jnp.asarray(kernel2d / kernel2d.sum(), dtype=maps.dtype)

    pad = kernel_size // 2
    padded = jnp.pad(maps, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    return jax.lax.conv_general_dilated(
        padded[..., None],
        kernel2d[:, :, None, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[..., 0]


def aggregate_token_maps(
    attn_maps: Dict,
    token_indices: jnp.ndarray,  # [B] int array — may be TRACED (jit-stable)
    orig_im_h: int,
    orig_im_w: int,
    res: int = AGGREGATION_RES,
    smooth: bool = True,
) -> jnp.ndarray:
    """Stacked per-token [B, H, W] attention maps at the render resolution
    (reference cross_attn.py:439-490).

    Takes the token indices as a (possibly traced) array so a jitted caller
    compiles once per (resolution, bucket-size) instead of once per prompt."""
    agg = aggregate_attention(attn_maps, res=res)  # [res, res, K]
    token_maps = jnp.moveaxis(
        jnp.take(agg, jnp.asarray(token_indices), axis=-1), -1, 0
    )  # [B, res, res]
    if smooth:
        token_maps = gaussian_smooth_maps(token_maps)
    return jax.image.resize(
        token_maps,
        (token_maps.shape[0], orig_im_h, orig_im_w),
        method="bilinear",
    )


def aggregate_and_get_max_attention_per_token(
    attn_maps: Dict,
    indices_to_alter: List[int],
    orig_im_h: int,
    orig_im_w: int,
    res: int = AGGREGATION_RES,
    smooth: bool = True,
) -> List[jnp.ndarray]:
    """Per-token [H, W] attention maps at the render resolution
    (reference cross_attn.py:439-490). List-returning wrapper over
    `aggregate_token_maps` for static index lists."""
    stacked = aggregate_token_maps(
        attn_maps,
        jnp.asarray(list(indices_to_alter)),
        orig_im_h,
        orig_im_w,
        res=res,
        smooth=smooth,
    )
    return [stacked[i] for i in range(stacked.shape[0])]


def normalize_attn_map(attn_map: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize a map to [0, 1]."""
    lo, hi = jnp.min(attn_map), jnp.max(attn_map)
    return (attn_map - lo) / (hi - lo + 1e-8)
