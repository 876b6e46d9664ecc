"""CLI: standalone graph-cut segmentation + voxel merge from pre-trained
edit/object attention grids.

Flag-for-flag rebuild of the reference CLI
(reference: segment_attn_relu_field.py:54-303).
"""
from pathlib import Path

import click
import jax.numpy as jnp
import numpy as np

from voxe_tpu.data.dataset import PosedImagesDataset
from voxe_tpu.models.volumetric import load_volumetric_model
from voxe_tpu.seg.graphcut import get_edit_region
from voxe_tpu.utils.camera import CameraPose
from voxe_tpu.utils.constants import (
    CAMERA_BOUNDS,
    CAMERA_INTRINSICS,
    HEMISPHERICAL_RADIUS,
)
from voxe_tpu.utils.logging import log
from voxe_tpu.utils.misc import EasyDict, log_config_to_disk
from voxe_tpu.viz.static import (
    visualize_sh_vox_grid_vol_mod_rendered_feedback,
    visualize_sh_vox_grid_vol_mod_rendered_feedback_attn,
)


# fmt: off
@click.command()
# Required arguments:
@click.option("-d", "--data_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path to the input dataset")
@click.option("-ie", "--edit_model_path", type=click.Path(file_okay=True, dir_okay=False),
              required=True, help="path to the trained edit attn model")
@click.option("-io", "--object_model_path", type=click.Path(file_okay=True, dir_okay=False),
              required=True, help="path to the trained object attn model")
@click.option("-o", "--output_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path for output")
@click.option("-r", "--ref_model_path", type=click.Path(file_okay=True, dir_okay=False),
              required=True, help="path to the pre-trained (reconstruction) model")
@click.option("-i", "--sds_model_path", type=click.Path(file_okay=True, dir_okay=False),
              required=True, help="path to the edited (sds) model")
# Input dataset related arguments:
@click.option("--separate_train_test_folders", type=click.BOOL, required=False,
              default=True, help="whether the data has separate train/test folders", show_default=True)
@click.option("--data_downsample_factor", type=click.FloatRange(min=1.0), required=False,
              default=3.0, help="downscale factor for input images", show_default=True)
# graph-cut stuff:
@click.option("--downsample_refine_grid", type=click.BOOL, required=False, default=False,
              help="downsample the attn grid when refining", show_default=True)
@click.option("--kval", type=click.FLOAT, required=False, default=5.0,
              help="k value used in graphcut", show_default=True)
@click.option("--edit_mask_thresh", type=click.FLOAT, required=False, default=0.992,
              help="edit-voxel probability threshold", show_default=True)
@click.option("--num_obj_voxels_thresh", type=click.INT, required=False, default=5000,
              help="number of object seed voxels", show_default=True)
@click.option("--min_num_edit_voxels", type=click.INT, required=False, default=300,
              help="minimum edit voxels", show_default=True)
@click.option("--top_k_edit_thresh", type=click.INT, required=False, default=300,
              help="top-k edit fallback", show_default=True)
@click.option("--top_k_obj_thresh", type=click.INT, required=False, default=200,
              help="top-k object fallback", show_default=True)
# wandb stuff (kept for flag parity):
@click.option("--log_wandb", type=click.BOOL, required=False, default=False, show_default=True,
              help="wandb logging (no-op without wandb installed)")
@click.option("--wandb_username", type=click.STRING, required=False, default="etaisella", show_default=True)
@click.option("--wandb_project_name", type=click.STRING, required=False, default="Vox-E-refine", show_default=True)
# fmt: on
def main(**kwargs) -> None:
    config = EasyDict(kwargs)
    output_path = Path(config.output_path)

    log.info("logging configuration file ...")
    log_config_to_disk(config, output_path)

    data_path = Path(config.data_path)
    if config.separate_train_test_folders:
        train_dataset = PosedImagesDataset(
            images_dir=data_path / "train",
            camera_params_json=data_path / "train_camera_params.json",
            downsample_factor=config.data_downsample_factor,
            rgba_white_bkgd=True,
        )
    else:
        train_dataset = PosedImagesDataset(
            images_dir=data_path / "images",
            camera_params_json=data_path / "camera_params.json",
            downsample_factor=config.data_downsample_factor,
            rgba_white_bkgd=True,
        )

    vol_mod_ref, _ = load_volumetric_model(Path(config.ref_model_path))
    vol_mod_edit, _ = load_volumetric_model(Path(config.edit_model_path), with_attn=True)
    vol_mod_obj, _ = load_volumetric_model(Path(config.object_model_path), with_attn=True)
    vol_mod_output, _ = load_volumetric_model(Path(config.sds_model_path), with_attn=True)

    model_dir = output_path / "saved_models"
    render_dir = output_path / "training_logs" / "rendered_output"
    for d in (model_dir, render_dir):
        d.mkdir(parents=True, exist_ok=True)

    log.info("starting grid refinement (graph-cut segmentation)!")
    get_edit_region(
        vol_mod_edit=vol_mod_edit,
        vol_mod_object=vol_mod_obj,
        vol_mod_output=vol_mod_output,
        viz_dir=render_dir,
        K=config.kval,
        edit_mask_thresh=config.edit_mask_thresh,
        num_obj_voxels_thresh=config.num_obj_voxels_thresh,
        min_num_edit_voxels=config.min_num_edit_voxels,
        top_k_edit_thresh=config.top_k_edit_thresh,
        top_k_obj_thresh=config.top_k_obj_thresh,
        downsample_grid=config.downsample_refine_grid,
    )

    # voxel merge: non-edit voxels revert to reference densities/features
    # (reference segment_attn_relu_field.py:217-228)
    keep_mask = np.asarray(vol_mod_output.grid.attn)[..., 0] != 0.0
    new_density = np.asarray(vol_mod_output.grid.densities).copy()
    new_features = np.asarray(vol_mod_output.grid.features).copy()
    new_density[keep_mask] = np.asarray(vol_mod_ref.grid.densities)[keep_mask]
    new_features[keep_mask] = np.asarray(vol_mod_ref.grid.features)[keep_mask]
    vol_mod_output.grid = vol_mod_output.grid.replace(
        densities=jnp.asarray(new_density), features=jnp.asarray(new_features)
    )

    pose0 = train_dataset.poses[0]
    feedback_pose = CameraPose(rotation=pose0[:, :3], translation=pose0[:, 3:])
    visualize_sh_vox_grid_vol_mod_rendered_feedback_attn(
        vol_mod_output, "attn_final", feedback_pose,
        train_dataset.camera_intrinsics, 0, render_dir,
    )
    visualize_sh_vox_grid_vol_mod_rendered_feedback(
        vol_mod_output, "sds_refined", feedback_pose,
        train_dataset.camera_intrinsics, 0, render_dir,
    )

    vol_mod_output.save(
        model_dir / "model_final_refined.pth",
        extra_info={
            CAMERA_BOUNDS: list(train_dataset.camera_bounds),
            CAMERA_INTRINSICS: list(train_dataset.camera_intrinsics),
            HEMISPHERICAL_RADIUS: train_dataset.get_hemispherical_radius_estimate(),
        },
    )
    log.info("segmentation + merge complete")


if __name__ == "__main__":
    main()
