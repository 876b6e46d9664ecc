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


def safe_disparity(depth_render: jnp.ndarray, acc_render: jnp.ndarray) -> jnp.ndarray:
    """Inverse expected depth, 1 / (depth/acc), clamping the DENOMINATOR:
    acc==0 (rays missing all density) would make depth/acc = 0/0 = NaN, and
    maximum() propagates NaN (the reference has the same hole, its
    accumulate.py:85-88); values for acc > ZERO_PLUS match the reference.
    Shared by the exact, shear-warp, and Pallas-kernel compositors."""
    return 1.0 / jnp.maximum(
        ZERO_PLUS, depth_render / jnp.maximum(acc_render, ZERO_PLUS)
    )


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
    use_fused_kernel: bool = False,
) -> RenderOut:
    """Composite per-sample (radiance, density) into per-ray colour/depth.

    `background_value` is 1.0 for the RGB path and 0.0 for the attention path
    (reference accumulate.py:77-81 vs :161-166 — the reference duplicates the
    whole function for that one constant).

    `use_fused_kernel` computes the weights through the single-VMEM-pass
    Pallas kernel (ops/composite.py) — the sequential cumprod chain is this
    function's dominant device cost (profiled ~7 ms/iter of a 29 ms
    shear-warp render step, BENCHMARKS.md). The sample axis is padded with
    zero-density samples to lane alignment; pad depths continue at the slab
    spacing (realizing final_delta="slab" through the kernel's next-depth
    difference) or at INFINITY steps (reference "inf" semantics).

    `processed_points` may be a `(raw_radiance [N,S,C], raw_density [N,S])`
    TUPLE instead of one concatenated array: the shear-warp fast path keeps
    radiance in bf16 while the weights math stays f32 — a concatenated array
    would silently promote the whole radiance tensor back to f32.
    """
    if isinstance(processed_points, tuple):
        raw_radiance, raw_density = processed_points
    else:
        raw_radiance = processed_points[..., :-1]
        raw_density = processed_points[..., -1]
    dir_norms = jnp.linalg.norm(rays.directions.reshape(-1, 3), axis=-1)

    if stochastic_density_noise_std > 0.0:
        assert key is not None, "density noise requires a PRNG key"
        raw_density = raw_density + (
            jax.random.normal(key, raw_density.shape, raw_density.dtype)
            * stochastic_density_noise_std
        )

    if use_fused_kernel and not extra_debug_info:
        from voxe_tpu.ops.composite import _LANE, composite_weights

        S = depths.shape[-1]
        pad = (-S) % _LANE
        if final_delta == "slab" and pad == 0:
            pad = _LANE
        if pad:
            last = depths[..., -1:]
            if final_delta == "slab":
                spacing = depths[..., -1:] - depths[..., -2:-1]
            else:
                spacing = jnp.full_like(last, INFINITY)
            ks = jnp.arange(1, pad + 1, dtype=depths.dtype)
            depths_p = jnp.concatenate([depths, last + spacing * ks], axis=-1)
            dens_p = jnp.concatenate(
                [
                    raw_density,
                    jnp.zeros((*raw_density.shape[:-1], pad), raw_density.dtype),
                ],
                axis=-1,
            )
        else:
            depths_p, dens_p = depths, raw_density
        weights_full, acc = composite_weights(dens_p, depths_p, dir_norms)
        weights = weights_full[..., :S]
        acc_render = acc[..., None]
        deltas = alpha = None  # not materialized on the fused path
    else:
        deltas = depths[..., 1:] - depths[..., :-1]
        if final_delta == "slab":
            # bounded last interval (shear-warp: volume ends at its far face)
            last = deltas[..., -1:]
        else:  # "inf": reference semantics — the last sample absorbs the rest
            last = jnp.full((*deltas.shape[:-1], 1), INFINITY, dtype=deltas.dtype)
        deltas = jnp.concatenate([deltas, last], axis=-1)  # [N, S]
        deltas = deltas * dir_norms[..., None]

        if extra_debug_info:
            alpha = density2occupancy_pb(raw_density, deltas)  # [N, S]

            # exclusive cumulative transmittance: T_i = prod_{j<i} (1-alpha_j)
            ones = jnp.ones((*alpha.shape[:-1], 1), dtype=alpha.dtype)
            transmittance = jnp.cumprod(
                jnp.concatenate([ones, 1.0 - alpha], axis=-1), axis=-1
            )[..., :-1]
            weights = alpha * transmittance  # [N, S]
            acc_render = jnp.sum(weights, axis=-1, keepdims=True)  # [N, 1]
        else:
            # identical math, fewer passes: since alpha := 1 - exp(-sigma d),
            # prod_{j<i}(1-alpha_j) = exp(-sum_{j<i} sigma_j d_j), so
            # w_i = alpha_i T_i = T_i - T_{i+1} — one cumsum + one exp + one
            # difference, and acc = 1 - T_last with no reduction at all
            optical = jnp.cumsum(raw_density * deltas, axis=-1)  # inclusive
            t_incl = jnp.exp(-optical)
            ones = jnp.ones((*t_incl.shape[:-1], 1), dtype=t_incl.dtype)
            t_excl = jnp.concatenate([ones, t_incl[..., :-1]], axis=-1)
            weights = t_excl - t_incl  # [N, S]
            acc_render = 1.0 - t_incl[..., -1:]  # [N, 1]
            alpha = None

    colour = jax.nn.sigmoid(raw_radiance)  # HDR tone map
    # weighted colour reduction as a contraction over samples (f32
    # accumulation); on the bf16 fast path this stays off the f32 roundtrip
    colour_render = jnp.einsum(
        "...s,...sc->...c",
        weights.astype(colour.dtype),
        colour,
        preferred_element_type=jnp.float32,
    )  # [N, C]

    if white_bkgd:
        colour_render = colour_render + (1.0 - acc_render) * background_value

    depth_render = jnp.sum(depths * weights, axis=-1, keepdims=True)
    disparity_render = safe_disparity(depth_render, acc_render)

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
