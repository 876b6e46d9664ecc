"""Ray primitives and pinhole ray casting.

Rebuild of the reference Rays dataclass + casting utilities
(reference: thre3d_atom/rendering/volumetric/render_interface.py:13-70,
 thre3d_atom/rendering/volumetric/utils/misc.py:12-74) as a JAX pytree and
pure functions. Ray casting is fully vectorized/jittable, so training loops
can cast a whole pose batch on-device (the reference loops poses in Python,
trainers.py:291-301).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp

from voxe_tpu.utils.camera import CameraIntrinsics


class Rays(NamedTuple):
    """origins [..., 3], directions [..., 3] — a pytree by NamedTuple."""

    origins: jnp.ndarray
    directions: jnp.ndarray


def flatten_rays(rays: Rays) -> Rays:
    return Rays(
        origins=rays.origins.reshape(-1, 3),
        directions=rays.directions.reshape(-1, 3),
    )


def collate_rays(rays_list: Sequence[Rays]) -> Rays:
    return Rays(
        origins=jnp.concatenate([r.origins for r in rays_list], axis=0),
        directions=jnp.concatenate([r.directions for r in rays_list], axis=0),
    )


def cast_rays(
    camera_intrinsics: CameraIntrinsics,
    rotation: jnp.ndarray,
    translation: jnp.ndarray,
) -> Rays:
    """Cast pinhole rays for one camera pose.

    Pixel centers sit at +0.5 offsets; camera looks down -z with +y up
    (reference: rendering/volumetric/utils/misc.py:30-50).

    Args:
        camera_intrinsics: (height, width, focal).
        rotation: [3, 3] camera-to-world rotation.
        translation: [3, 1] camera origin in world space.
    Returns:
        Rays with origins/directions of shape [H, W, 3].
    """
    height, width, focal = (
        camera_intrinsics.height,
        camera_intrinsics.width,
        camera_intrinsics.focal,
    )
    x = jnp.linspace(0.5, width - 0.5, width, dtype=jnp.float32)
    y = jnp.linspace(0.5, height - 0.5, height, dtype=jnp.float32)
    x_coords, y_coords = jnp.meshgrid(x, y, indexing="xy")  # [H, W]

    dirs = jnp.stack(
        [
            (x_coords - width * 0.5) / focal,
            -(y_coords - height * 0.5) / focal,
            -jnp.ones_like(x_coords),
        ],
        axis=-1,
    )  # [H, W, 3]

    rays_d = dirs @ rotation.astype(jnp.float32).T
    rays_o = jnp.broadcast_to(
        translation.astype(jnp.float32).reshape(1, 1, 3), rays_d.shape
    )
    return Rays(rays_o, rays_d)


def cast_rays_batch(
    camera_intrinsics: CameraIntrinsics,
    rotations: jnp.ndarray,  # [B, 3, 3]
    translations: jnp.ndarray,  # [B, 3, 1]
) -> Rays:
    """Vectorized casting for a batch of poses -> Rays of shape [B, H, W, 3]."""
    height, width, focal = (
        camera_intrinsics.height,
        camera_intrinsics.width,
        camera_intrinsics.focal,
    )
    x = jnp.linspace(0.5, width - 0.5, width, dtype=jnp.float32)
    y = jnp.linspace(0.5, height - 0.5, height, dtype=jnp.float32)
    x_coords, y_coords = jnp.meshgrid(x, y, indexing="xy")
    dirs = jnp.stack(
        [
            (x_coords - width * 0.5) / focal,
            -(y_coords - height * 0.5) / focal,
            -jnp.ones_like(x_coords),
        ],
        axis=-1,
    )  # [H, W, 3]
    rays_d = jnp.einsum("hwc,bnc->bhwn", dirs, rotations.astype(jnp.float32))
    rays_o = jnp.broadcast_to(
        translations.astype(jnp.float32).reshape(-1, 1, 1, 3), rays_d.shape
    )
    return Rays(rays_o, rays_d)


def ndcize_rays(rays: Rays, camera_intrinsics: CameraIntrinsics) -> Rays:
    """Map rays into NDC space (reference: rendering/volumetric/utils/misc.py:90-123)."""
    height, width, focal = (
        camera_intrinsics.height,
        camera_intrinsics.width,
        camera_intrinsics.focal,
    )
    near = 1.0
    rays_o, rays_d = rays

    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (width / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (height / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = (
        -1.0
        / (width / (2.0 * focal))
        * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    )
    d1 = (
        -1.0
        / (height / (2.0 * focal))
        * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return Rays(jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1))


def select_rays_and_pixels(
    rays: Rays, pixels: jnp.ndarray, indices: jnp.ndarray
) -> Tuple[Rays, jnp.ndarray]:
    """Synchronously pick a ray/pixel subset by flat indices (the index draw
    itself is a host- or key-side decision; reference misc.py:126-158)."""
    return (
        Rays(rays.origins[indices], rays.directions[indices]),
        pixels[indices],
    )
