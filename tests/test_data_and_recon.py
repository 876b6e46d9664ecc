"""Dataset + end-to-end reconstruction tests on a generated synthetic scene."""
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from voxe_tpu.data.dataset import PosedImagesDataset
from voxe_tpu.data.synthetic import (
    GOLDEN_HEMISPHERICAL_RADIUS,
    generate_synthetic_scene,
)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory) -> Path:
    return generate_synthetic_scene(
        tmp_path_factory.mktemp("scene"),
        num_train=8,
        num_test=2,
        image_size=48,
        focal=48.0,
        grid_res=32,
    )


@pytest.fixture(scope="module")
def train_dataset(scene_dir) -> PosedImagesDataset:
    return PosedImagesDataset(
        scene_dir / "images",
        scene_dir / "train_camera_params.json",
        rgba_white_bkgd=True,
    )


def test_dataset_shapes_and_ranges(train_dataset):
    ds = train_dataset
    assert len(ds) == 8
    intr = ds.camera_intrinsics
    assert ds.images.shape == (8, intr.height, intr.width, 3)
    assert ds.images.min() >= 0.0 and ds.images.max() <= 1.0
    assert ds.poses.shape == (8, 3, 4)
    # rotation determinant ~ +1 (right-handed poses)
    dets = np.linalg.det(ds.poses[:, :, :3])
    np.testing.assert_allclose(dets, 1.0, atol=1e-3)


def test_dataset_golden_hemispherical_radius(train_dataset):
    # golden value carried over from the reference test suite
    # (reference: thre3d_atom/data/tests/test_datasets.py:48-52)
    assert train_dataset.get_hemispherical_radius_estimate() == pytest.approx(
        GOLDEN_HEMISPHERICAL_RADIUS, abs=1e-4
    )


def test_dataset_camera_bounds(train_dataset):
    near, far = train_dataset.camera_bounds
    assert near == pytest.approx(2.0 * 0.9, rel=1e-5)
    assert far == pytest.approx(6.0 * 1.1, rel=1e-5)


def test_directional_dataset(scene_dir):
    ds = PosedImagesDataset(
        scene_dir / "images",
        scene_dir / "train_camera_params.json",
        directional=True,
    )
    image, pose, direction, idx = ds[0]
    assert direction in {"front", "side", "back", "overhead"}


def test_end_to_end_reconstruction(scene_dir, train_dataset, tmp_path):
    """The minimum end-to-end slice: train a fresh grid on the synthetic scene
    and require a large PSNR improvement (SURVEY.md build plan step 3)."""
    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
    from voxe_tpu.models.volumetric import VolumetricModel, load_volumetric_model
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.train.recon import train_sh_vox_grid_vol_mod_with_posed_images
    from voxe_tpu.train.testers import test_sh_vox_grid_vol_mod_with_posed_images
    from voxe_tpu.utils.misc import (
        compute_expected_density_scale_for_relu_field_grid,
    )

    res, world = 32, 3.0
    cfg = VoxelGridConfig(
        voxel_size=VoxelSize(*([world / res] * 3)),
        density_preactivation="identity",
        density_postactivation="softplus",
        expected_density_scale=compute_expected_density_scale_for_relu_field_grid(
            (world,) * 3
        ),
    )
    grid = VoxelGrid(jnp.zeros((res, res, res, 1)), jnp.zeros((res, res, res, 3)), cfg)
    rcfg = SHVoxGridRenderConfig(
        num_samples_per_ray=64,
        camera_bounds=train_dataset.camera_bounds,
        white_bkgd=True,
        render_num_samples_per_ray=128,
        parallel_rays_chunk_size=16384,
    )
    model = VolumetricModel(grid, rcfg)
    model = train_sh_vox_grid_vol_mod_with_posed_images(
        model,
        train_dataset,
        tmp_path / "out",
        image_batch_cache_size=4,
        ray_batch_size=4096,
        num_stages=2,
        num_iterations_per_stage=60,
        learning_rate=0.03,
        lr_decay_steps_per_stage=40,
        save_freq=10_000,
        test_freq=10_000,
        feedback_freq=10_000,
        summary_freq=10_000,
        fast_debug_mode=True,
    )
    metrics = test_sh_vox_grid_vol_mod_with_posed_images(model, train_dataset)
    assert metrics["psnr"] > 25.0, metrics

    # final checkpoint exists, loads, and renders identically
    final = tmp_path / "out" / "saved_models" / "model_final.pth"
    assert final.exists()
    loaded, extra = load_volumetric_model(final)
    assert extra["hemispherical_radius"] == pytest.approx(
        GOLDEN_HEMISPHERICAL_RADIUS, abs=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(loaded.grid.densities), np.asarray(model.grid.densities)
    )


def test_streaming_memmap_dataset(scene_dir):
    """cache_backing='auto' with a tiny RAM budget -> disk-backed memmap with
    identical pixel content, sample_pixels gathers correctly, and
    device_arrays refuses to densify (reference lazy mode datasets.py:113-123)."""
    dense = PosedImagesDataset(
        scene_dir / "images", scene_dir / "train_camera_params.json",
        rgba_white_bkgd=True,
    )
    streaming = PosedImagesDataset(
        scene_dir / "images", scene_dir / "train_camera_params.json",
        rgba_white_bkgd=True, max_ram_gib=0.0,
    )
    assert streaming.streaming and not dense.streaming
    assert isinstance(streaming.images, np.memmap)
    np.testing.assert_array_equal(np.asarray(streaming.images), dense.images)

    h, w = dense.camera_intrinsics.height, dense.camera_intrinsics.width
    rng = np.random.default_rng(0)
    flat = rng.integers(0, h * w, 64)
    imgs = rng.integers(0, len(dense), 64)
    got = streaming.sample_pixels(flat, imgs)
    want = dense.images[imgs, flat // w, flat % w]
    np.testing.assert_array_equal(got, want)

    with pytest.raises(RuntimeError):
        streaming.device_arrays()


def test_streaming_recon_training(scene_dir, tmp_path):
    """End-to-end recon on a memmap-backed (streaming) dataset: the trainer
    takes the host-streaming path and the loss decreases."""
    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.train.recon import train_sh_vox_grid_vol_mod_with_posed_images

    ds = PosedImagesDataset(
        scene_dir / "images", scene_dir / "train_camera_params.json",
        rgba_white_bkgd=True, max_ram_gib=0.0,
    )
    assert ds.streaming
    res = 16
    cfg = VoxelGridConfig(
        voxel_size=VoxelSize(*[3.0 / res] * 3),
        density_preactivation="identity",
        density_postactivation="softplus",
    )
    grid = VoxelGrid(
        jnp.zeros((res, res, res, 1)), jnp.zeros((res, res, res, 3)), cfg
    )
    rcfg = SHVoxGridRenderConfig(
        num_samples_per_ray=16, camera_bounds=ds.camera_bounds, white_bkgd=True,
        render_num_samples_per_ray=16, parallel_rays_chunk_size=1024,
    )
    model = VolumetricModel(grid, rcfg)
    out = train_sh_vox_grid_vol_mod_with_posed_images(
        model, ds, tmp_path / "out",
        ray_batch_size=512, num_stages=1, num_iterations_per_stage=20,
        save_freq=100, test_freq=100, feedback_freq=100, summary_freq=5,
        fast_debug_mode=True,
    )
    assert np.isfinite(np.asarray(out.grid.densities)).all()


def test_real_scene_config_smoke(scene_dir, tmp_path):
    """The real-scene flag combo (linear-disparity sampling, non-white bkgd,
    streaming dataset — bash_scripts/real_scenes/edit_demo_real.sh at tiny
    scale) trains without error."""
    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.train.recon import train_sh_vox_grid_vol_mod_with_posed_images

    ds = PosedImagesDataset(
        scene_dir / "images", scene_dir / "train_camera_params.json",
        rgba_white_bkgd=False, max_ram_gib=0.0,
    )
    res = 20  # the 200^3 real-scene grid, downscaled 10x
    cfg = VoxelGridConfig(
        voxel_size=VoxelSize(*[3.0 / res] * 3),
        density_preactivation="identity",
        density_postactivation="softplus",
    )
    grid = VoxelGrid(
        jnp.zeros((res, res, res, 1)), jnp.zeros((res, res, res, 3)), cfg
    )
    rcfg = SHVoxGridRenderConfig(
        num_samples_per_ray=26,  # 416 / 16
        camera_bounds=ds.camera_bounds,
        white_bkgd=False,
        linear_disparity_sampling=True,
        render_num_samples_per_ray=26,
        parallel_rays_chunk_size=1024,
    )
    model = VolumetricModel(grid, rcfg)
    out = train_sh_vox_grid_vol_mod_with_posed_images(
        model, ds, tmp_path / "out",
        ray_batch_size=512, num_stages=2, num_iterations_per_stage=8,
        learning_rate=0.005,
        save_freq=100, test_freq=100, feedback_freq=100, summary_freq=4,
        fast_debug_mode=True,
    )
    assert np.isfinite(np.asarray(out.grid.densities)).all()
