"""Synthetic posed-image scene generator.

The reference repo trains on external datasets (nerf-synthetic etc.) that are
not shipped; this module procedurally builds a small colourful scene with the
framework's own renderer and writes it in the exact thre3d dataset layout
(images/ + {train,test}_camera_params.json), so every CLI and test can run
self-contained. Camera radius defaults to the reference's golden
hemispherical-radius value 4.031128406524658
(reference: thre3d_atom/data/tests/test_datasets.py:48-52).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Tuple

import numpy as np

from voxe_tpu.data import constants as keys
from voxe_tpu.utils.camera import CameraIntrinsics, pose_spherical, to8b

GOLDEN_HEMISPHERICAL_RADIUS = 4.031128406524658


def make_demo_grid(res: int = 48, world_size: float = 3.0):
    """A colourful 3-blob scene as a VoxelGrid (softplus density field)."""
    import jax.numpy as jnp

    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize

    half = world_size / 2
    x = np.linspace(-half, half, res)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")

    blobs = [
        ((0.0, 0.0, -0.35), 0.75, (2.5, -1.5, -1.5)),  # red body
        ((0.0, 0.55, 0.45), 0.42, (-1.5, 2.5, -1.5)),  # green head
        ((0.45, -0.45, 0.1), 0.3, (-1.5, -1.5, 2.5)),  # blue limb
    ]
    density = np.full_like(X, -15.0)
    rgb = np.zeros((*X.shape, 3), dtype=np.float32)
    for (cx, cy, cz), radius, colour in blobs:
        r = np.sqrt((X - cx) ** 2 + (Y - cy) ** 2 + (Z - cz) ** 2)
        inside = r < radius
        density = np.where(inside, 40.0, density)
        for c in range(3):
            rgb[..., c] = np.where(inside, colour[c], rgb[..., c])

    config = VoxelGridConfig(
        voxel_size=VoxelSize(*([world_size / res] * 3)),
        density_preactivation="identity",
        density_postactivation="softplus",
        expected_density_scale=1.0,
    )
    return VoxelGrid(
        jnp.asarray(density[..., None].astype(np.float32)), jnp.asarray(rgb), config
    )


def generate_synthetic_scene(
    output_dir: Path,
    num_train: int = 12,
    num_test: int = 4,
    image_size: int = 64,
    focal: float = 64.0,
    radius: float = GOLDEN_HEMISPHERICAL_RADIUS,
    bounds: Tuple[float, float] = (2.0, 6.0),
    grid_res: int = 48,
    seed: int = 3,
) -> Path:
    """Render the demo grid from random hemisphere poses and write the dataset.

    Returns the scene directory (containing images/ and the two json files).
    """
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.utils.camera import CameraBounds, classify_view_direction

    output_dir = Path(output_dir)
    images_dir = output_dir / "images"
    images_dir.mkdir(parents=True, exist_ok=True)

    grid = make_demo_grid(res=grid_res)
    render_config = SHVoxGridRenderConfig(
        num_samples_per_ray=192,
        camera_bounds=CameraBounds(*bounds),
        white_bkgd=True,
        render_num_samples_per_ray=192,
        parallel_rays_chunk_size=16384,
    )
    model = VolumetricModel(grid, render_config)
    intrinsics = CameraIntrinsics(image_size, image_size, focal)

    rng = np.random.default_rng(seed)
    split_params = {"train": {}, "test": {}}
    for split, count in (("train", num_train), ("test", num_test)):
        for i in range(count):
            pitch = 15.0 + float(rng.random()) * 70.0
            yaw = float(rng.random()) * 360.0
            pose = pose_spherical(yaw, pitch, radius)
            out = model.render(intrinsics, pose)
            img = to8b(np.asarray(out.colour))
            name = f"{split}_{i:03d}.png"
            imageio.imwrite(images_dir / name, img)
            split_params[split][name] = {
                keys.INTRINSIC: {
                    keys.BOUNDS: list(bounds),
                    keys.HEIGHT: image_size,
                    keys.WIDTH: image_size,
                    keys.FOCAL: focal,
                },
                keys.EXTRINSIC: {
                    keys.ROTATION: pose.rotation.tolist(),
                    keys.TRANSLATION: pose.translation.tolist(),
                },
                keys.DIRECTION: classify_view_direction(pitch, yaw),
            }

    for split in ("train", "test"):
        with open(output_dir / f"{split}_camera_params.json", "w") as f:
            json.dump(split_params[split], f, indent=4)
    return output_dir
