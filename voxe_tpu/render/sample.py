"""Point sampling along rays: stratified/uniform, linear-disparity, and
ray-AABB-bounded variants.

Rebuild of reference: thre3d_atom/rendering/volumetric/sample.py:15-202, with
JAX PRNG keys for the stratified jitter and a branchless slab-test ray-AABB
intersection (the reference's three sequential per-axis passes collapse into
one vectorized min/max reduction — same results, XLA-friendly).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from voxe_tpu.grid.voxels import AxisAlignedBoundingBox
from voxe_tpu.render.rays import Rays
from voxe_tpu.utils.camera import CameraBounds
from voxe_tpu.utils.constants import ZERO_PLUS


class SampledPointsOnRays(NamedTuple):
    points: jnp.ndarray  # [N, S, 3]
    depths: jnp.ndarray  # [N, S]


def sample_uniform_points_on_rays(
    rays: Rays,
    bounds: Union[CameraBounds, jnp.ndarray],
    num_samples: int,
    perturb: bool = True,
    linear_disparity_sampling: bool = False,
    key: Optional[jax.Array] = None,
) -> SampledPointsOnRays:
    """Uniform (optionally jittered / inverse-depth-spaced) depths on rays.

    `bounds` is either scalar CameraBounds or a per-ray [N, 2] tensor.
    (reference: sample.py:15-68)
    """
    rays_o = rays.origins.reshape(-1, 3)
    rays_d = rays.directions.reshape(-1, 3)
    num_rays = rays_o.shape[0]

    if isinstance(bounds, CameraBounds):
        near = jnp.full((num_rays, 1), bounds.near, dtype=rays_o.dtype)
        far = jnp.full((num_rays, 1), bounds.far, dtype=rays_o.dtype)
    else:
        near, far = bounds[:, :1], bounds[:, 1:]

    t_vals = jnp.linspace(0.0, 1.0, num_samples, dtype=rays_o.dtype)[None, :]
    if linear_disparity_sampling:
        z_vals = 1.0 / (1.0 / (near + ZERO_PLUS) * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals

    if perturb:
        assert key is not None, "perturbed sampling needs a PRNG key"
        mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mid, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mid], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand

    points = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    return SampledPointsOnRays(points, z_vals)


def ray_aabb_intersection(
    rays: Rays, bounds: CameraBounds, aabb: AxisAlignedBoundingBox
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Branchless slab test -> per-ray [N, 2] (near, far) plus [N, 1] hit mask.

    Non-intersecting rays fall back to the scene bounds; intersections behind
    the camera are clipped to 0 (reference: sample.py:71-184).
    """
    origins = rays.origins.reshape(-1, 3)
    directions = rays.directions.reshape(-1, 3)

    mins = jnp.array([aabb.x_range[0], aabb.y_range[0], aabb.z_range[0]])
    maxs = jnp.array([aabb.x_range[1], aabb.y_range[1], aabb.z_range[1]])

    inv_dir = 1.0 / (directions + ZERO_PLUS)
    t0 = (mins[None, :] - origins) * inv_dir  # [N, 3]
    t1 = (maxs[None, :] - origins) * inv_dir
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1, keepdims=True)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1, keepdims=True)

    intersecting = t_near <= t_far  # [N, 1]

    # Nudge the interval slightly OUTWARD so that samples placed exactly at
    # t_near/t_far land strictly outside the AABB and are masked to exact-zero
    # density by the inside-volume test. Without this, the final sample sits
    # numerically on the face where an epsilon of interpolated density meets
    # the INFINITY tail delta (accumulate) and becomes fully opaque — a
    # speckle/ring artifact latent in the reference as well (it sidesteps it
    # by not using optimized sampling for eval renders).
    span = t_far - t_near
    t_near = t_near - 1e-3 * span
    t_far = t_far + 1e-3 * span

    orig = jnp.array([bounds.near, bounds.far], dtype=origins.dtype)
    ray_bounds = jnp.concatenate([t_near, t_far], axis=-1)
    ray_bounds = jnp.where(intersecting, ray_bounds, orig[None, :])
    ray_bounds = jnp.clip(ray_bounds, min=0.0)
    return ray_bounds, intersecting


def sample_aabb_bound_uniform_points_on_rays(
    rays: Rays,
    bounds: CameraBounds,
    num_samples: int,
    aabb: AxisAlignedBoundingBox,
    perturb: bool = True,
    key: Optional[jax.Array] = None,
) -> SampledPointsOnRays:
    """Confine samples to each ray's AABB intersection (reference: sample.py:187-202)."""
    ray_bounds, _ = ray_aabb_intersection(rays, bounds, aabb)
    return sample_uniform_points_on_rays(
        rays, bounds=ray_bounds, num_samples=num_samples, perturb=perturb, key=key
    )
