"""Alpha compositing (Beer-Lambert emission-absorption) along rays.

Rebuild of reference: thre3d_atom/rendering/volumetric/accumulate.py:24-199.
Pure jnp baseline; voxe_tpu.ops.composite provides the fused Pallas kernel
with identical numerics for the hot path.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from voxe_tpu.render.rays import Rays
from voxe_tpu.utils.constants import (
    EXTRA_ACCUMULATED_WEIGHTS,
    EXTRA_DISPARITY,
    EXTRA_POINT_DENSITIES,
    EXTRA_POINT_DEPTHS,
    EXTRA_POINT_OCCUPANCIES,
    EXTRA_POINT_WEIGHTS,
    EXTRA_SAMPLE_INTERVALS,
    INFINITY,
    ZERO_PLUS,
)


class RenderOut(NamedTuple):
    colour: jnp.ndarray  # [N, C] (C=3 rgb, or 1 for the attn path)
    depth: jnp.ndarray  # [N, 1]
    extra: Dict[str, jnp.ndarray]


def density2occupancy_pb(densities: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Physically-based occupancy 1 - exp(-sigma * delta)
    (reference accumulate.py:24-28)."""
    return 1.0 - jnp.exp(-(densities * deltas))


def accumulate_radiance_density_on_rays(
    processed_points: jnp.ndarray,  # [N, S, C+1]
    depths: jnp.ndarray,  # [N, S]
    rays: Rays,
    stochastic_density_noise_std: float = 0.0,
    white_bkgd: bool = True,
    background_value: float = 1.0,
    extra_debug_info: bool = False,
    key: Optional[jax.Array] = None,
    final_delta: str = "inf",
) -> RenderOut:
    """Composite per-sample (radiance, density) into per-ray colour/depth.

    `background_value` is 1.0 for the RGB path and 0.0 for the attention path
    (reference accumulate.py:77-81 vs :161-166 — the reference duplicates the
    whole function for that one constant).
    """
    raw_radiance = processed_points[..., :-1]
    raw_density = processed_points[..., -1]

    deltas = depths[..., 1:] - depths[..., :-1]
    if final_delta == "slab":
        # bounded last interval (shear-warp: the volume ends at its far face)
        last = deltas[..., -1:]
    else:  # "inf": reference semantics — the last sample absorbs the rest
        last = jnp.full((*deltas.shape[:-1], 1), INFINITY, dtype=deltas.dtype)
    deltas = jnp.concatenate([deltas, last], axis=-1)  # [N, S]
    dir_norms = jnp.linalg.norm(rays.directions.reshape(-1, 3), axis=-1)
    deltas = deltas * dir_norms[..., None]

    if stochastic_density_noise_std > 0.0:
        assert key is not None, "density noise requires a PRNG key"
        raw_density = raw_density + (
            jax.random.normal(key, raw_density.shape, raw_density.dtype)
            * stochastic_density_noise_std
        )

    alpha = density2occupancy_pb(raw_density, deltas)  # [N, S]

    # exclusive cumulative transmittance: T_i = prod_{j<i} (1 - alpha_j)
    ones = jnp.ones((*alpha.shape[:-1], 1), dtype=alpha.dtype)
    transmittance = jnp.cumprod(
        jnp.concatenate([ones, 1.0 - alpha], axis=-1), axis=-1
    )[..., :-1]
    weights = alpha * transmittance  # [N, S]

    colour = jax.nn.sigmoid(raw_radiance)  # HDR tone map
    colour_render = jnp.sum(colour * weights[..., None], axis=-2)  # [N, C]
    acc_render = jnp.sum(weights, axis=-1, keepdims=True)  # [N, 1]

    if white_bkgd:
        colour_render = colour_render + (1.0 - acc_render) * background_value

    depth_render = jnp.sum(depths * weights, axis=-1, keepdims=True)
    disparity_render = 1.0 / jnp.maximum(ZERO_PLUS, depth_render / acc_render)

    extra = {
        EXTRA_DISPARITY: disparity_render,
        EXTRA_ACCUMULATED_WEIGHTS: acc_render,
    }
    if extra_debug_info:
        extra.update(
            {
                EXTRA_POINT_DENSITIES: raw_density,
                EXTRA_POINT_OCCUPANCIES: alpha,
                EXTRA_POINT_WEIGHTS: weights,
                EXTRA_POINT_DEPTHS: depths,
                EXTRA_SAMPLE_INTERVALS: deltas,
            }
        )

    return RenderOut(colour=colour_render, depth=depth_render, extra=extra)
