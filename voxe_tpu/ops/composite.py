"""Fused alpha-compositing Pallas kernel for the volumetric renderer.

The compositing stage (deltas -> Beer-Lambert alpha -> exclusive cumulative
transmittance -> weights) is the only sequentially-dependent computation in
the render (reference accumulate.py:49-88). Under plain XLA the cumulative
product lowers to a multi-pass associative scan over the [rays, samples]
array; this kernel does the whole stage in ONE VMEM-resident pass per ray
tile, computing deltas in-register (never materializing them in HBM) and the
prefix product with log2(S) lane-shift doubling steps (Hillis-Steele scan on
the VPU).

Forward runs the kernel; the custom VJP recomputes through the jnp reference
implementation (cheap elementwise math) so gradients stay exact.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from voxe_tpu.utils.constants import INFINITY

_LANE = 128
_TILE_ROWS = 256
_FORCE_INTERPRET = False  # tests flip this to run the kernel off-TPU


def composite_weights_reference(
    raw_density: jnp.ndarray,  # [N, S]
    depths: jnp.ndarray,  # [N, S]
    dir_norms: jnp.ndarray,  # [N]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """jnp reference: (weights [N, S], acc [N]). Matches accumulate.py:49-75."""
    deltas = jnp.concatenate(
        [
            depths[..., 1:] - depths[..., :-1],
            jnp.full((*depths.shape[:-1], 1), INFINITY, dtype=depths.dtype),
        ],
        axis=-1,
    )
    deltas = deltas * dir_norms[..., None]
    alpha = 1.0 - jnp.exp(-(raw_density * deltas))
    ones = jnp.ones((*alpha.shape[:-1], 1), dtype=alpha.dtype)
    transmittance = jnp.cumprod(
        jnp.concatenate([ones, 1.0 - alpha], axis=-1), axis=-1
    )[..., :-1]
    weights = alpha * transmittance
    return weights, jnp.sum(weights, axis=-1)


def _composite_kernel(density_ref, depths_ref, dirnorm_ref, weights_ref, acc_ref):
    import jax.lax as lax

    density = density_ref[:, :]  # [T, S]
    depths = depths_ref[:, :]
    dirnorm = dirnorm_ref[:, :]  # [T, 1]
    T, S = density.shape

    col = lax.broadcasted_iota(jnp.int32, (T, S), dimension=1)

    # deltas: next-depth difference with INFINITY tail, computed in-register
    from jax.experimental.pallas import tpu as pltpu

    next_depths = pltpu.roll(depths, shift=S - 1, axis=1)  # circular left-by-1
    deltas = jnp.where(col == S - 1, INFINITY, next_depths - depths)
    deltas = deltas * dirnorm

    alpha = 1.0 - jnp.exp(-(density * deltas))
    p = 1.0 - alpha

    # inclusive prefix product via log-step doubling (Hillis-Steele):
    # after k-th step, acc[i] = prod_{j > i - 2^k} p[j]
    acc = p
    shift = 1
    while shift < S:
        rolled = pltpu.roll(acc, shift=shift, axis=1)
        rolled = jnp.where(col >= shift, rolled, 1.0)
        acc = acc * rolled
        shift *= 2
    # exclusive: shift right by one, fill with 1
    exclusive = pltpu.roll(acc, shift=1, axis=1)
    transmittance = jnp.where(col >= 1, exclusive, 1.0)

    weights = alpha * transmittance
    weights_ref[:, :] = weights
    acc_ref[:, :] = jnp.sum(weights, axis=1, keepdims=True)


def _composite_pallas(raw_density, depths, dir_norms):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, S = raw_density.shape
    tile = min(_TILE_ROWS, N)
    num_tiles = -(-N // tile)
    padded = num_tiles * tile

    def pad(x):
        return jnp.pad(x, ((0, padded - N),) + ((0, 0),) * (x.ndim - 1))

    density_p = pad(raw_density)
    depths_p = pad(depths)
    dirnorm_p = pad(dir_norms[:, None])

    weights, acc = pl.pallas_call(
        _composite_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded, S), raw_density.dtype),
            jax.ShapeDtypeStruct((padded, 1), raw_density.dtype),
        ],
        interpret=_FORCE_INTERPRET,
    )(density_p, depths_p, dirnorm_p)
    return weights[:N], acc[:N, 0]


@jax.custom_vjp
def composite_weights(raw_density, depths, dir_norms):
    """(weights [N, S], acc [N]) with the Pallas forward when eligible."""
    return _composite_dispatch(raw_density, depths, dir_norms)


def _composite_dispatch(raw_density, depths, dir_norms):
    S = raw_density.shape[-1]
    on_tpu = jax.default_backend() == "tpu"
    if (on_tpu or _FORCE_INTERPRET) and S % _LANE == 0:
        return _composite_pallas(raw_density, depths, dir_norms)
    return composite_weights_reference(raw_density, depths, dir_norms)


def _composite_fwd(raw_density, depths, dir_norms):
    out = _composite_dispatch(raw_density, depths, dir_norms)
    return out, (raw_density, depths, dir_norms)


def _composite_bwd(residuals, cotangents):
    # exact gradients by re-differentiating the cheap jnp reference
    _, vjp_fn = jax.vjp(composite_weights_reference, *residuals)
    return vjp_fn(cotangents)


composite_weights.defvjp(_composite_fwd, _composite_bwd)


def fused_shade_composite(grid, sampled, rays, config, noise_key, extra_debug):
    """Drop-in render tail used by interface.py when
    `config.use_fused_kernel`: XLA gather/SH shading + Pallas compositing.
    Produces a RenderOut identical to the jnp path."""
    from voxe_tpu.render.accumulate import (
        RenderOut,
        accumulate_radiance_density_on_rays,
        safe_disparity,
    )
    from voxe_tpu.render.process import process_points_with_sh_voxel_grid
    from voxe_tpu.utils.constants import (
        EXTRA_ACCUMULATED_WEIGHTS,
        EXTRA_DISPARITY,
    )

    if extra_debug or config.stochastic_density_noise_std > 0.0:
        # debug extras / density noise use the reference path
        processed = process_points_with_sh_voxel_grid(
            sampled, rays, grid, render_diffuse=config.render_diffuse
        )
        return accumulate_radiance_density_on_rays(
            processed,
            sampled.depths,
            rays,
            stochastic_density_noise_std=config.stochastic_density_noise_std,
            white_bkgd=config.white_bkgd,
            background_value=1.0,
            extra_debug_info=extra_debug,
            key=noise_key,
        )

    processed = process_points_with_sh_voxel_grid(
        sampled, rays, grid, render_diffuse=config.render_diffuse
    )
    raw_radiance = processed[..., :-1]
    raw_density = processed[..., -1]
    dir_norms = jnp.linalg.norm(rays.directions.reshape(-1, 3), axis=-1)

    weights, acc = composite_weights(raw_density, sampled.depths, dir_norms)

    colour = jax.nn.sigmoid(raw_radiance)
    colour_render = jnp.sum(colour * weights[..., None], axis=-2)
    acc_render = acc[:, None]
    if config.white_bkgd:
        colour_render = colour_render + (1.0 - acc_render)
    depth_render = jnp.sum(sampled.depths * weights, axis=-1, keepdims=True)
    disparity = safe_disparity(depth_render, acc_render)

    return RenderOut(
        colour=colour_render,
        depth=depth_render,
        extra={EXTRA_DISPARITY: disparity, EXTRA_ACCUMULATED_WEIGHTS: acc_render},
    )
