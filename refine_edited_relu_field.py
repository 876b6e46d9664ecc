"""CLI: standalone refinement driver — train attn grids + graph-cut + merge
from an existing edited (SDS) model.

Flag-for-flag rebuild of the reference CLI
(reference: refine_edited_relu_field.py:41-283).
"""
from pathlib import Path

import click

from voxe_tpu.data.dataset import PosedImagesDataset
from voxe_tpu.models.volumetric import load_volumetric_model
from voxe_tpu.train.refine import refine_edited_relu_field
from voxe_tpu.utils.logging import log
from voxe_tpu.utils.misc import EasyDict, log_config_to_disk


# fmt: off
@click.command()
# Required arguments:
@click.option("-d", "--data_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path to the input dataset")
@click.option("-i", "--sds_model_path", type=click.Path(file_okay=True, dir_okay=False),
              required=True, help="path to the pre-trained sds model")
@click.option("-o", "--output_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path for training output")
@click.option("-r", "--ref_model_path", type=click.Path(file_okay=True, dir_okay=False),
              required=True, help="path to the pre-trained model")
@click.option("-a", "--hf_auth_token", type=click.STRING, required=False, default="",
              help="hugging face model token for stable diffusion 1.4", show_default=True)
@click.option("-p", "--prompt", type=click.STRING, required=True,
              help="prompt used for attention extraction")
@click.option("-eidx", "--edit_idx", required=True, type=click.STRING,
              help="space-separated edit token indices")
@click.option("-oidx", "--object_idx", type=click.INT, required=False, default=None,
              help="object token index")
@click.option("-t", "--timestamp", type=click.INT, required=False, default=200,
              help="diffusion timestamp")
# Input dataset related arguments:
@click.option("--separate_train_test_folders", type=click.BOOL, required=False,
              default=True, help="separate train/test folders", show_default=True)
@click.option("--data_downsample_factor", type=click.FloatRange(min=1.0), required=False,
              default=3.0, help="downscale factor for input images", show_default=True)
# Grid flags (parity; grid comes from checkpoint):
@click.option("--grid_dims", type=click.INT, nargs=3, required=False, default=(160, 160, 160), show_default=True)
@click.option("--grid_location", type=click.FLOAT, nargs=3, required=False, default=(0.0, 0.0, 0.0), show_default=True)
@click.option("--normalize_scene_scale", type=click.BOOL, required=False, default=False, show_default=True)
@click.option("--grid_world_size", type=click.FLOAT, nargs=3, required=False, default=(3.0, 3.0, 3.0), show_default=True)
@click.option("--sh_degree", type=click.INT, required=False, default=0, show_default=True)
@click.option("--use_relu_field", type=click.BOOL, required=False, default=True, show_default=True)
@click.option("--use_softplus_field", type=click.BOOL, required=False, default=True, show_default=True)
# Rendering related arguments:
@click.option("--render_num_samples_per_ray", type=click.INT, required=False, default=1024, show_default=True)
@click.option("--parallel_rays_chunk_size", type=click.INT, required=False, default=32768, show_default=True)
@click.option("--white_bkgd", type=click.BOOL, required=False, default=True, show_default=True)
# Training related arguments:
@click.option("--ray_batch_size", type=click.INT, required=False, default=84672, show_default=True)
@click.option("--train_num_samples_per_ray", type=click.INT, required=False, default=256, show_default=True)
@click.option("--num_stages", type=click.INT, required=False, default=1, show_default=True)
@click.option("--num_iterations_per_stage", type=click.INT, required=False, default=1500, show_default=True)
@click.option("--scale_factor", type=click.FLOAT, required=False, default=2.0, show_default=True)
@click.option("--learning_rate", type=click.FLOAT, required=False, default=0.028, show_default=True)
@click.option("--lr_decay_steps_per_stage", type=click.INT, required=False, default=5000 * 100, show_default=True)
@click.option("--lr_decay_gamma_per_stage", type=click.FLOAT, required=False, default=0.1, show_default=True)
@click.option("--stagewise_lr_decay_gamma", type=click.FLOAT, required=False, default=0.9, show_default=True)
@click.option("--apply_diffuse_render_regularization", type=click.BOOL, required=False, default=True, show_default=True)
@click.option("--num_workers", type=click.INT, required=False, default=4, show_default=True)
# Frequencies:
@click.option("--save_frequency", type=click.INT, required=False, default=250, show_default=True)
@click.option("--test_frequency", type=click.INT, required=False, default=250, show_default=True)
@click.option("--feedback_frequency", type=click.INT, required=False, default=200, show_default=True)
@click.option("--summary_frequency", type=click.INT, required=False, default=50, show_default=True)
# Misc:
@click.option("--verbose_rendering", type=click.BOOL, required=False, default=False, show_default=True)
@click.option("--data_pose_mode", type=click.BOOL, required=False, default=False,
              help="use dataset poses instead of random sampling", show_default=True)
@click.option("--directional_dataset", type=click.BOOL, required=False, default=True, show_default=True)
@click.option("--downsample_refine_grid", type=click.BOOL, required=False, default=False, show_default=True)
# graph-cut parameters:
@click.option("--kval", type=click.FLOAT, required=False, default=5.0, show_default=True)
@click.option("--edit_mask_thresh", type=click.FLOAT, required=False, default=0.992, show_default=True)
@click.option("--num_obj_voxels_thresh", type=click.INT, required=False, default=5000, show_default=True)
@click.option("--min_num_edit_voxels", type=click.INT, required=False, default=300, show_default=True)
@click.option("--top_k_edit_thresh", type=click.INT, required=False, default=300, show_default=True)
@click.option("--top_k_obj_thresh", type=click.INT, required=False, default=200, show_default=True)
@click.option("--attn_tv_weight", type=click.FLOAT, required=False, default=0.01, show_default=True)
# wandb (parity no-ops):
@click.option("--log_wandb", type=click.BOOL, required=False, default=False, show_default=True)
@click.option("--wandb_username", type=click.STRING, required=False, default="etaisella", show_default=True)
@click.option("--wandb_project_name", type=click.STRING, required=False, default="Vox-E-refine", show_default=True)
# TPU-native extras:
@click.option("--sd_weights_dir", type=click.Path(file_okay=False, dir_okay=True),
              required=False, default=None, help="converted SD weights dir", show_default=True)
@click.option("--sd_version", type=click.STRING, required=False, default="1.4",
              help="SD version for attention extraction", show_default=True)
@click.option("--multihost", type=click.BOOL, required=False, default=False,
              help="initialize jax.distributed for multi-host (SPMD) execution; "
              "run the same command on every host", show_default=True)
@click.option("--num_devices", type=click.INT, required=False, default=1,
              help="data-parallel ray batching over this many devices "
              "(1-D jax.sharding.Mesh)", show_default=True)
@click.option("--shear_warp_base_res", type=click.INT, required=False, default=None,
              help="side of the square shear-warp base frame (default: "
              "max(image_dims))", show_default=True)
@click.option("--use_shear_warp", type=click.BOOL, required=False, default=True,
              help="run the refinement renders (RGB frame for attention "
              "extraction + differentiable attn renders) on the gather/"
              "scatter-free shear-warp path", show_default=True)
@click.option("--steps_per_call", type=click.INT, required=False, default=1,
              help="refinement iterations fused into one device dispatch "
              "(shear-warp random-pose mode only)", show_default=True)
# fmt: on
def main(**kwargs) -> None:
    config = EasyDict(kwargs)
    if config.multihost:
        from voxe_tpu.parallel.distributed import maybe_init_distributed

        maybe_init_distributed(True)
    sds_model_path = Path(config.sds_model_path)
    ref_model_path = Path(config.ref_model_path)
    output_path = Path(config.output_path)

    log.info("logging configuration file ...")
    log_config_to_disk(config, output_path)

    data_path = Path(config.data_path)
    if config.separate_train_test_folders:
        train_dataset = PosedImagesDataset(
            images_dir=data_path / "train",
            camera_params_json=data_path / "train_camera_params.json",
            normalize_scene_scale=config.normalize_scene_scale,
            downsample_factor=config.data_downsample_factor,
            rgba_white_bkgd=config.white_bkgd,
        )
    else:
        train_dataset = PosedImagesDataset(
            images_dir=data_path / "images",
            camera_params_json=data_path / "camera_params.json",
            normalize_scene_scale=config.normalize_scene_scale,
            downsample_factor=config.data_downsample_factor,
            rgba_white_bkgd=config.white_bkgd,
        )

    image_dims = (
        train_dataset.camera_intrinsics.height,
        train_dataset.camera_intrinsics.width,
    )

    pretrained_vol_mod, _ = load_volumetric_model(ref_model_path)
    vol_mod_edit, _ = load_volumetric_model(sds_model_path, with_attn=True)
    vol_mod_obj, _ = load_volumetric_model(sds_model_path, with_attn=True)
    vol_mod_output, _ = load_volumetric_model(sds_model_path, with_attn=True)

    edit_idx = [int(i) for i in config.edit_idx.split()]
    sd_weights_dir = Path(config.sd_weights_dir) if config.sd_weights_dir else None

    refine_edited_relu_field(
        vol_mod_edit=vol_mod_edit,
        vol_mod_object=vol_mod_obj,
        vol_mod_ref=pretrained_vol_mod,
        vol_mod_output=vol_mod_output,
        train_dataset=train_dataset,
        hf_auth_token=config.hf_auth_token,
        output_dir=output_path,
        prompt=config.prompt,
        edit_idx=edit_idx,
        object_idx=config.object_idx,
        timestamp=config.timestamp,
        image_dims=image_dims,
        ray_batch_size=config.ray_batch_size,
        num_iterations=config.num_iterations_per_stage,
        learning_rate=config.learning_rate,
        save_freq=config.save_frequency,
        feedback_freq=config.feedback_frequency,
        summary_freq=config.summary_frequency,
        apply_diffuse_render_regularization=config.apply_diffuse_render_regularization,
        verbose_rendering=config.verbose_rendering,
        attn_tv_weight=config.attn_tv_weight,
        kval=config.kval,
        edit_mask_thresh=config.edit_mask_thresh,
        num_obj_voxels_thresh=config.num_obj_voxels_thresh,
        min_num_edit_voxels=config.min_num_edit_voxels,
        top_k_edit_thresh=config.top_k_edit_thresh,
        top_k_obj_thresh=config.top_k_obj_thresh,
        data_pose_mode=config.data_pose_mode,
        downsample_refine_grid=config.downsample_refine_grid,
        sd_version=config.sd_version,
        sd_weights_dir=sd_weights_dir,
        num_devices=config.num_devices,
        use_shear_warp=config.use_shear_warp,
        shear_warp_base_res=config.shear_warp_base_res,
        steps_per_call=config.steps_per_call,
    )


if __name__ == "__main__":
    main()
