"""Composable, functional render pipeline: sampler -> point processor ->
accumulator, plus the concrete SH-voxel-grid render procedures.

Rebuild of reference render_interface.py:140-204 + renderers.py:29-163. The
pipeline is a pure function of (grid pytree, rays pytree, static config,
PRNG key) — directly jit/grad/shard_map-able. The config is a frozen,
hashable dataclass so it can be a static argument.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax

from voxe_tpu.grid.feature_voxels import FeatureVoxelGrid
from voxe_tpu.grid.voxels import VoxelGrid
from voxe_tpu.render.accumulate import RenderOut, accumulate_radiance_density_on_rays
from voxe_tpu.render.process import (
    process_points_with_feature_voxel_grid,
    process_points_with_sh_voxel_grid,
    process_points_with_sh_voxel_grid_attn,
)
from voxe_tpu.render.rays import Rays, flatten_rays
from voxe_tpu.render.sample import (
    sample_aabb_bound_uniform_points_on_rays,
    sample_uniform_points_on_rays,
)
from voxe_tpu.utils.camera import CameraBounds


@dataclasses.dataclass(frozen=True)
class SHVoxGridRenderConfig:
    """Static render configuration (reference renderers.py:29-47)."""

    # probing config
    num_samples_per_ray: int
    camera_bounds: CameraBounds
    perturb_sampled_points: bool = True
    optimized_sampling: bool = False
    linear_disparity_sampling: bool = False

    # accumulation config
    stochastic_density_noise_std: float = 0.0
    white_bkgd: bool = False

    # misc render mode config
    render_diffuse: bool = False
    render_num_samples_per_ray: int = 1024
    parallel_rays_chunk_size: int = 32768

    # TPU-native extras
    use_fused_kernel: bool = False  # Pallas compositing kernel (RGB path only)

    def replace(self, **kwargs) -> "SHVoxGridRenderConfig":
        return dataclasses.replace(self, **kwargs)


def _sample(
    voxel_grid: VoxelGrid,
    rays: Rays,
    config: SHVoxGridRenderConfig,
    key: Optional[jax.Array],
):
    perturb = config.perturb_sampled_points and key is not None
    if config.optimized_sampling:
        return sample_aabb_bound_uniform_points_on_rays(
            rays,
            bounds=config.camera_bounds,
            num_samples=config.num_samples_per_ray,
            aabb=voxel_grid.aabb,
            perturb=perturb,
            key=key,
        )
    return sample_uniform_points_on_rays(
        rays,
        bounds=config.camera_bounds,
        num_samples=config.num_samples_per_ray,
        perturb=perturb,
        linear_disparity_sampling=config.linear_disparity_sampling,
        key=key,
    )


def render_sh_voxel_grid(
    voxel_grid: VoxelGrid,
    rays: Rays,
    config: SHVoxGridRenderConfig,
    key: Optional[jax.Array] = None,
    extra_debug_info: bool = False,
) -> RenderOut:
    """Render flat rays against an SH voxel grid (reference renderers.py:50-105).

    Passing `key=None` disables stratified jitter and density noise — the
    deterministic eval mode.
    """
    rays = flatten_rays(rays)
    if key is not None:
        sample_key, noise_key = jax.random.split(key)
    else:
        sample_key = noise_key = None

    sampled = _sample(voxel_grid, rays, config, sample_key)

    if config.use_fused_kernel:
        from voxe_tpu.ops.composite import fused_shade_composite

        return fused_shade_composite(
            voxel_grid, sampled, rays, config, noise_key, extra_debug_info
        )

    processed = process_points_with_sh_voxel_grid(
        sampled, rays, voxel_grid, render_diffuse=config.render_diffuse
    )
    return accumulate_radiance_density_on_rays(
        processed,
        sampled.depths,
        rays,
        stochastic_density_noise_std=config.stochastic_density_noise_std,
        white_bkgd=config.white_bkgd,
        background_value=1.0,
        extra_debug_info=extra_debug_info,
        key=noise_key,
    )


def render_feature_voxel_grid(
    voxel_grid: FeatureVoxelGrid,
    rays: Rays,
    config: SHVoxGridRenderConfig,
    key: Optional[jax.Array] = None,
    extra_debug_info: bool = False,
) -> RenderOut:
    """Render flat rays against the hybrid grid+MLP representation
    (reference feature_voxels.py:305-363; no renderer is wired for it in the
    reference — dead code — so this follows render_sh_voxel_grid's plumbing
    with the feature-grid point processor)."""
    rays = flatten_rays(rays)
    if key is not None:
        sample_key, noise_key = jax.random.split(key)
    else:
        sample_key = noise_key = None

    sampled = _sample(voxel_grid, rays, config, sample_key)
    processed = process_points_with_feature_voxel_grid(
        sampled, rays, voxel_grid, render_diffuse=config.render_diffuse
    )
    return accumulate_radiance_density_on_rays(
        processed,
        sampled.depths,
        rays,
        stochastic_density_noise_std=config.stochastic_density_noise_std,
        white_bkgd=config.white_bkgd,
        background_value=1.0,
        extra_debug_info=extra_debug_info,
        key=noise_key,
    )


def render_sh_voxel_grid_attn(
    voxel_grid: VoxelGrid,
    rays: Rays,
    config: SHVoxGridRenderConfig,
    key: Optional[jax.Array] = None,
    use_orig_densities: bool = False,
    extra_debug_info: bool = False,
) -> RenderOut:
    """Render the grid's attention channel; composites on black
    (reference renderers.py:108-163, accumulate.py:161-166).

    `config.use_fused_kernel` applies to the RGB procedure only — the Pallas
    compositing kernel has no attn variant; this path always takes the plain
    jnp compositor (numerics identical, the kernel is a perf-only rewrite)."""
    rays = flatten_rays(rays)
    if key is not None:
        sample_key, noise_key = jax.random.split(key)
    else:
        sample_key = noise_key = None

    sampled = _sample(voxel_grid, rays, config, sample_key)
    processed = process_points_with_sh_voxel_grid_attn(
        sampled,
        rays,
        voxel_grid,
        render_diffuse=config.render_diffuse,
        use_orig_densities=use_orig_densities,
    )
    return accumulate_radiance_density_on_rays(
        processed,
        sampled.depths,
        rays,
        stochastic_density_noise_std=config.stochastic_density_noise_std,
        white_bkgd=config.white_bkgd,
        background_value=0.0,
        extra_debug_info=extra_debug_info,
        key=noise_key,
    )
