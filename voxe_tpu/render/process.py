"""Point processing: voxel-grid query + SH shading at sampled ray points.

Rebuild of reference: thre3d_atom/rendering/volumetric/process.py:20-174.
No chunk-batchify machinery: under XLA the whole [N*S] query compiles into one
fused gather+arithmetic program; memory-valve chunking happens at the ray level
(lax.map in the model facade) when needed.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from voxe_tpu.grid.feature_voxels import FeatureVoxelGrid, feature_grid_query
from voxe_tpu.grid.voxels import VoxelGrid, grid_query, grid_query_attn, test_inside_volume
from voxe_tpu.render.rays import Rays
from voxe_tpu.render.sample import SampledPointsOnRays
from voxe_tpu.render.sh import evaluate_spherical_harmonics
from voxe_tpu.utils.constants import INFINITY, NUM_COLOUR_CHANNELS


def _shade_and_mask(
    voxel_grid: VoxelGrid,
    flat_points: jnp.ndarray,  # [N*S, 3]
    interpolated: jnp.ndarray,  # [N*S, C*K + 1]
    rays: Rays,
    num_samples: int,
    num_channels: int,
    render_diffuse: bool,
) -> jnp.ndarray:
    sh_coeffs, raw_densities = interpolated[..., :-1], interpolated[..., -1:]

    dirs = rays.directions.reshape(-1, 3)
    viewdirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    # shade in [N, S, C, K] with viewdirs [N, 1, 3] broadcasting through the
    # SH polynomials — never materialize the [N*S, 3] per-sample repeat
    # (same trick as shearwarp.py's shade path)
    sh_coeffs = sh_coeffs.reshape(-1, num_samples, num_channels, sh_coeffs.shape[-1] // num_channels)
    if render_diffuse:
        sh_coeffs = sh_coeffs[..., :1]
        sh_degree = 0
    else:
        sh_degree = int(math.isqrt(sh_coeffs.shape[-1])) - 1

    raw_radiance = evaluate_spherical_harmonics(
        degree=sh_degree, sh_coeffs=sh_coeffs, viewdirs=viewdirs[:, None, :]
    )  # [N, S, C]

    # outside-AABB masking: radiance -> -inf (sigmoids to 0), density -> 0
    # (reference process.py:78-85)
    inside = test_inside_volume(voxel_grid.aabb, flat_points).reshape(
        -1, num_samples, 1
    )
    raw_radiance = jnp.where(inside, raw_radiance, -INFINITY)
    raw_densities = jnp.where(inside, raw_densities.reshape(-1, num_samples, 1), 0.0)

    return jnp.concatenate([raw_radiance, raw_densities], axis=-1)


def process_points_with_sh_voxel_grid(
    sampled_points: SampledPointsOnRays,
    rays: Rays,
    voxel_grid: VoxelGrid,
    render_diffuse: bool = False,
) -> jnp.ndarray:
    """[N, S, 3+1]: per-sample (rgb radiance, raw density)."""
    num_rays, num_samples, _ = sampled_points.points.shape
    flat_points = sampled_points.points.reshape(-1, 3)
    interpolated = grid_query(voxel_grid, flat_points)
    return _shade_and_mask(
        voxel_grid,
        flat_points,
        interpolated,
        rays,
        num_samples,
        NUM_COLOUR_CHANNELS,
        render_diffuse,
    )


def process_points_with_feature_voxel_grid(
    sampled_points: SampledPointsOnRays,
    rays: Rays,
    voxel_grid: FeatureVoxelGrid,
    render_diffuse: bool = False,
) -> jnp.ndarray:
    """[N, S, 3+1]: per-sample (raw rgb from the MLP head, raw density) for
    the hybrid grid+MLP representation (reference feature_voxels.py:305-363;
    the reference never wires a renderer for it — dead code — but the decoded
    radiance slots into the same accumulator: raw values are sigmoid
    tone-mapped there, and the -inf outside-AABB mask sigmoids to 0 exactly
    like the SH path). `render_diffuse` is accepted for interface parity; the
    MLP radiance is view-independent already, so it is a no-op."""
    del render_diffuse
    num_rays, num_samples, _ = sampled_points.points.shape
    flat_points = sampled_points.points.reshape(-1, 3)
    decoded = feature_grid_query(voxel_grid, flat_points)  # [N*S, 4]
    raw_radiance, raw_densities = decoded[..., :-1], decoded[..., -1:]
    inside = test_inside_volume(voxel_grid.aabb, flat_points).reshape(
        -1, num_samples, 1
    )
    raw_radiance = jnp.where(
        inside, raw_radiance.reshape(-1, num_samples, NUM_COLOUR_CHANNELS), -INFINITY
    )
    raw_densities = jnp.where(inside, raw_densities.reshape(-1, num_samples, 1), 0.0)
    return jnp.concatenate([raw_radiance, raw_densities], axis=-1)


def process_points_with_sh_voxel_grid_attn(
    sampled_points: SampledPointsOnRays,
    rays: Rays,
    voxel_grid: VoxelGrid,
    render_diffuse: bool = False,
    use_orig_densities: bool = False,
) -> jnp.ndarray:
    """[N, S, 1+1]: per-sample (attn logit, raw density)
    (reference process.py:98-174)."""
    num_rays, num_samples, _ = sampled_points.points.shape
    flat_points = sampled_points.points.reshape(-1, 3)
    interpolated = grid_query_attn(
        voxel_grid, flat_points, use_orig_densities=use_orig_densities
    )
    return _shade_and_mask(
        voxel_grid,
        flat_points,
        interpolated,
        rays,
        num_samples,
        1,
        render_diffuse,
    )
