"""Legacy grid_refine loop (reference modules/grid_refine.py, dead code
rebuilt for completeness): periodic cut+merge, legacy checkpoint names
(incl. the reference's "pbject" typo), gated attn re-learn, multi-stage
scaling."""
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from voxe_tpu.data.dataset import PosedImagesDataset
from voxe_tpu.data.synthetic import generate_synthetic_scene
from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
from voxe_tpu.models.sd import StableDiffusion, tiny_test_config
from voxe_tpu.models.volumetric import VolumetricModel
from voxe_tpu.render.interface import SHVoxGridRenderConfig
from voxe_tpu.train.grid_refine import (
    get_dir_batch_from_poses_legacy,
    refine_model,
)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return generate_synthetic_scene(
        tmp_path_factory.mktemp("scene"),
        num_train=4, num_test=1, image_size=24, focal=24.0, grid_res=16,
    )


@pytest.fixture(scope="module")
def dataset(scene):
    return PosedImagesDataset(
        scene / "images", scene / "train_camera_params.json", rgba_white_bkgd=True
    )


def _attn_model(dataset, res=12, attn_init=-20.0, density_seed=0):
    config = VoxelGridConfig(
        voxel_size=VoxelSize(*[3.0 / res] * 3),
        density_preactivation="identity",
        density_postactivation="softplus",
    )
    rng = np.random.default_rng(density_seed)
    densities = np.full((res, res, res, 1), -5.0, dtype=np.float32)
    densities[3:9, 3:9, 3:9] = 10.0
    features = rng.standard_normal((res, res, res, 3)).astype(np.float32)
    grid = VoxelGrid(
        jnp.asarray(densities),
        jnp.asarray(features),
        config,
        attn=jnp.full((res, res, res, 1), float(attn_init)),
    )
    return VolumetricModel(
        grid,
        SHVoxGridRenderConfig(
            num_samples_per_ray=24,
            camera_bounds=dataset.camera_bounds,
            white_bkgd=True,
            render_num_samples_per_ray=24,
            parallel_rays_chunk_size=2048,
        ),
    )


def test_legacy_dir_classifier_thresholds():
    """grid_refine.py:684-701 uses yaw>60 for side (the live trainer uses
    45); build poses on both sides of that boundary."""
    # yaw is read back via arccos(R[0,0]) and pitch from the translation —
    # construct the pose arrays directly for exactness
    def rt(yaw_deg, pitch_deg):
        c = np.cos(np.radians(yaw_deg))
        rot = np.eye(3, dtype=np.float32)
        rot[0, 0] = c
        t = np.array(
            [
                np.cos(np.radians(pitch_deg)),
                0.0,
                np.sin(np.radians(pitch_deg)),
            ],
            np.float32,
        ) * 4.0
        return np.concatenate([rot, t.reshape(3, 1)], axis=1)

    assert get_dir_batch_from_poses_legacy(rt(50.0, 10.0)[None]) == ["front"]
    assert get_dir_batch_from_poses_legacy(rt(70.0, 10.0)[None]) == ["side"]
    assert get_dir_batch_from_poses_legacy(rt(130.0, 10.0)[None]) == ["back"]
    assert get_dir_batch_from_poses_legacy(rt(70.0, 60.0)[None]) == ["overhead"]


def test_refine_model_cut_merge_and_legacy_filenames(dataset, tmp_path):
    """Gate-off configuration (the reference's hardcoded default): the loop
    must periodically graph-cut + merge and write legacy-named snapshots."""
    # edit attn: strongly positive in a sub-box -> graph cut labels it edit
    vol_mod_edit = _attn_model(dataset, attn_init=-20.0)
    res = vol_mod_edit.grid.grid_dims[0]
    edit_attn = np.full((res, res, res, 1), -6.0, np.float32)
    edit_attn[3:6, 3:9, 3:9] = 6.0
    vol_mod_edit.grid = vol_mod_edit.grid.replace(attn=jnp.asarray(edit_attn))
    vol_mod_object = _attn_model(dataset, attn_init=-20.0)
    vol_mod_object.grid = vol_mod_object.grid.replace(
        attn=jnp.asarray(-edit_attn),
        densities=vol_mod_edit.grid.densities,
        features=vol_mod_edit.grid.features,
    )

    # sds model: same geometry, edited features; ref model: distinct features
    vol_mod_sds = _attn_model(dataset, attn_init=0.0)
    vol_mod_sds.grid = vol_mod_sds.grid.replace(
        densities=vol_mod_edit.grid.densities,
        features=vol_mod_edit.grid.features + 1.0,
    )
    sds_features_before = np.asarray(vol_mod_sds.grid.features).copy()
    vol_mod_ref = _attn_model(dataset, attn_init=0.0)
    vol_mod_ref.grid = vol_mod_ref.grid.replace(
        densities=vol_mod_edit.grid.densities,
        features=vol_mod_edit.grid.features - 1.0,
    )

    out_dir = tmp_path / "legacy_run"
    returned = refine_model(
        vol_mod_sds,
        vol_mod_edit,
        vol_mod_object,
        vol_mod_ref,
        dataset,
        out_dir,
        prompt="a test prompt",
        edit_idx=1,
        object_idx=2,
        timestamp=10,
        num_stages=1,
        num_iterations_per_stage=2,
        refine_freq=2,
        save_freq=2,
        feedback_freq=1000,
        summary_freq=1,
        fast_debug_mode=True,
        min_num_edit_voxels=5,
        num_obj_voxels_thresh=20,
        top_k_edit_thresh=5,
        top_k_obj_thresh=5,
    )
    assert returned is vol_mod_edit

    model_dir = out_dir / "saved_models"
    # legacy snapshot filenames, reference typo preserved (grid_refine.py:587)
    assert (model_dir / "model_edit_stage_1_iter_1.pth").exists()
    assert (model_dir / "model_pbject_stage_1_iter_1.pth").exists()
    assert (model_dir / "model_final_edit.pth").exists()
    assert (model_dir / "model_final_object.pth").exists()
    assert (model_dir / "model_final_sds.pth").exists()

    # the periodic cut wrote a keep grid into the sds model's attn channel
    keep = np.asarray(vol_mod_sds.grid.attn)[..., 0]
    assert set(np.unique(keep)).issubset({-10.0, -5.0, 0.0})
    assert (keep == 0.0).any(), "no edit region was cut"

    # merge semantics: non-edit occupied voxels reverted to ref features,
    # edit voxels kept the sds features (reference grid_refine.py:426-441)
    merged = np.asarray(vol_mod_sds.grid.features)
    keep_mask = keep != 0.0
    np.testing.assert_allclose(
        merged[keep_mask], np.asarray(vol_mod_ref.grid.features)[keep_mask]
    )
    np.testing.assert_allclose(
        merged[~keep_mask], sds_features_before[~keep_mask]
    )


def test_refine_model_relearn_gate_updates_attn(dataset, tmp_path):
    """relearn_attn_grids=True (the reference's dead branch, rebuilt live):
    SD attention maps must actually move both attn grids."""
    sd = StableDiffusion(config=tiny_test_config(), unet_dtype=jnp.float32)
    vol_mod_edit = _attn_model(dataset, attn_init=-2.0)
    vol_mod_object = _attn_model(dataset, attn_init=-2.0)
    vol_mod_object.grid = vol_mod_object.grid.replace(
        densities=vol_mod_edit.grid.densities,
        features=vol_mod_edit.grid.features,
    )
    vol_mod_sds = _attn_model(dataset, attn_init=0.0)
    vol_mod_sds.grid = vol_mod_sds.grid.replace(
        densities=vol_mod_edit.grid.densities,
        features=vol_mod_edit.grid.features,
    )
    vol_mod_ref = _attn_model(dataset, attn_init=0.0)
    vol_mod_ref.grid = vol_mod_ref.grid.replace(
        densities=vol_mod_edit.grid.densities,
        features=vol_mod_edit.grid.features,
    )
    attn_before = np.asarray(vol_mod_edit.grid.attn).copy()

    refine_model(
        vol_mod_sds,
        vol_mod_edit,
        vol_mod_object,
        vol_mod_ref,
        dataset,
        tmp_path / "relearn_run",
        prompt="a test prompt",
        edit_idx=1,
        object_idx=2,
        timestamp=10,
        num_stages=1,
        num_iterations_per_stage=2,
        refine_freq=1000,  # cut only at step 1
        save_freq=1000,
        feedback_freq=1000,
        summary_freq=1,
        fast_debug_mode=True,
        relearn_attn_grids=True,
        sd_model=sd,
        min_num_edit_voxels=5,
        num_obj_voxels_thresh=20,
        top_k_edit_thresh=5,
        top_k_obj_thresh=5,
    )

    attn_after = np.asarray(vol_mod_edit.grid.attn)
    assert not np.allclose(attn_before, attn_after), "edit attn never updated"
    assert np.isfinite(attn_after).all()


def test_refine_model_multi_stage_scales_all_grids(dataset, tmp_path):
    """Multi-stage runs scale all four models together (documented divergence
    from the reference's edit-only upscale, grid_refine.py:609-616)."""
    vol_mod_edit = _attn_model(dataset, attn_init=-6.0)
    res = vol_mod_edit.grid.grid_dims[0]
    edit_attn = np.full((res, res, res, 1), -6.0, np.float32)
    edit_attn[3:6, 3:9, 3:9] = 6.0
    vol_mod_edit.grid = vol_mod_edit.grid.replace(attn=jnp.asarray(edit_attn))
    vol_mod_object = _attn_model(dataset, attn_init=-6.0)
    vol_mod_object.grid = vol_mod_object.grid.replace(
        attn=jnp.asarray(-edit_attn),
        densities=vol_mod_edit.grid.densities,
        features=vol_mod_edit.grid.features,
    )
    vol_mod_sds = _attn_model(dataset, attn_init=0.0)
    vol_mod_ref = _attn_model(dataset, attn_init=0.0)
    for vm in (vol_mod_sds, vol_mod_ref):
        vm.grid = vm.grid.replace(
            densities=vol_mod_edit.grid.densities,
            features=vol_mod_edit.grid.features,
        )

    refine_model(
        vol_mod_sds,
        vol_mod_edit,
        vol_mod_object,
        vol_mod_ref,
        dataset,
        tmp_path / "stage_run",
        prompt="a test prompt",
        edit_idx=1,
        object_idx=2,
        timestamp=10,
        num_stages=2,
        num_iterations_per_stage=1,
        scale_factor=2.0,
        refine_freq=1,
        save_freq=1000,
        feedback_freq=1000,
        fast_debug_mode=True,
        min_num_edit_voxels=5,
        num_obj_voxels_thresh=20,
        top_k_edit_thresh=5,
        top_k_obj_thresh=5,
    )

    # final stage restored the full resolution on every model
    assert vol_mod_edit.grid.grid_dims == (res, res, res)
    assert vol_mod_object.grid.grid_dims == (res, res, res)
    assert vol_mod_sds.grid.grid_dims == (res, res, res)
    assert vol_mod_ref.grid.grid_dims == (res, res, res)
