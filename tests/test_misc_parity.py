"""Additional parity/behavior tests: grid rescaling, scene-scale
normalization, blender conversion."""
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest


def test_scale_voxel_grid_matches_torch_interpolate():
    """Trilinear grid rescale vs torch.nn.functional.interpolate
    (align_corners=False) — the reference's coarse-to-fine op
    (reference voxels.py:409-447)."""
    torch = pytest.importorskip("torch")
    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize, scale_voxel_grid

    rng = np.random.default_rng(0)
    src = rng.standard_normal((8, 10, 12, 4)).astype(np.float32)
    out_size = (16, 20, 24)

    ref = torch.nn.functional.interpolate(
        torch.from_numpy(src).permute(3, 0, 1, 2)[None],
        size=out_size, mode="trilinear", align_corners=False,
    )[0].permute(1, 2, 3, 0).numpy()

    grid = VoxelGrid(
        jnp.asarray(src[..., 3:4]), jnp.asarray(src[..., :3]),
        VoxelGridConfig(voxel_size=VoxelSize(3.0 / 8, 3.0 / 10, 3.0 / 12)),
    )
    scaled = scale_voxel_grid(grid, out_size)
    ours = np.concatenate(
        [np.asarray(scaled.features), np.asarray(scaled.densities)], axis=-1
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
    # world-space AABB preserved
    np.testing.assert_allclose(scaled.aabb.x_range, grid.aabb.x_range, rtol=1e-6)
    np.testing.assert_allclose(scaled.aabb.z_range, grid.aabb.z_range, rtol=1e-6)


def test_normalize_scene_scale(tmp_path):
    from voxe_tpu.data.dataset import PosedImagesDataset
    from voxe_tpu.data.synthetic import generate_synthetic_scene

    scene = generate_synthetic_scene(
        tmp_path / "scene", num_train=4, num_test=1, image_size=16, focal=16.0,
        grid_res=8,
    )
    plain = PosedImagesDataset(
        scene / "images", scene / "train_camera_params.json"
    )
    normed = PosedImagesDataset(
        scene / "images", scene / "train_camera_params.json",
        normalize_scene_scale=True,
    )
    # farthest camera lands on the unit sphere; bounds scale by the same factor
    norms = np.linalg.norm(
        normed.poses[:, :, 3], axis=-1
    )
    assert norms.max() == pytest.approx(1.0, rel=1e-4)
    factor = np.linalg.norm(plain.poses[:, :, 3], axis=-1).max()
    assert normed.camera_bounds.near == pytest.approx(
        plain.camera_bounds.near / factor, rel=1e-4
    )


def test_blender_converter(tmp_path):
    from PIL import Image

    from voxe_tpu.data.blender import convert_nerf_blender_dataset

    src = tmp_path / "nerf"
    for split in ("train", "val", "test"):
        (src / split).mkdir(parents=True)
        frames = []
        for i in range(2):
            name = f"r_{i}"
            Image.new("RGB", (32, 32)).save(src / split / f"{name}.png")
            transform = np.eye(4)
            transform[2, 3] = 4.0
            frames.append(
                {"file_path": f"./{split}/{name}", "transform_matrix": transform.tolist()}
            )
        with open(src / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)

    out = tmp_path / "converted"
    convert_nerf_blender_dataset(src, out)
    for split in ("train", "val", "test"):
        with open(out / f"{split}_camera_params.json") as f:
            params = json.load(f)
        assert len(params) == 2
        entry = params["r_0.png"]
        assert entry["intrinsic"]["bounds"] == [2.0, 6.0]
        assert entry["intrinsic"]["height"] == 32
        # focal from camera_angle_x: 0.5 * W / tan(0.5 * angle)
        assert entry["intrinsic"]["focal"] == pytest.approx(
            0.5 * 32 / np.tan(0.5 * 0.6911), rel=1e-5
        )
        assert np.array(entry["extrinsic"]["translation"]).shape == (3, 1)
