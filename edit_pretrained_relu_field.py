"""CLI: edit a pretrained ReLU/softplus-field voxel grid toward a text prompt
via Score Distillation Sampling (+ optional localized refinement and SCC
post-processing).

Flag-for-flag rebuild of the reference CLI
(reference: edit_pretrained_relu_field.py:44-429).
"""
import copy
from pathlib import Path

import click
import numpy as np

from voxe_tpu.data.dataset import PosedImagesDataset
from voxe_tpu.models.volumetric import VolumetricModel, load_volumetric_model
from voxe_tpu.train.sds import train_sh_vox_grid_vol_mod_with_posed_images_and_sds
from voxe_tpu.utils.logging import log
from voxe_tpu.utils.misc import EasyDict, log_config_to_disk


# fmt: off
@click.command()
# Required arguments:
@click.option("-i", "--ref_model_path", type=click.Path(file_okay=True, dir_okay=False),
              required=True, help="path to the pre-trained relu field model")
@click.option("-o", "--output_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path for training output")
@click.option("-p", "--prompt", type=click.STRING, required=True,
              help="sds prompt used for SDS based loss")
@click.option("-d", "--data_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path to the input dataset")
@click.option("-a", "--hf_auth_token", type=click.STRING, required=False, default="",
              help="hugging face model token for stable diffusion 1.4", show_default=True)
@click.option("-eidx", "--edit_idx", type=click.STRING, required=False, default=None,
              help="index of edit item, i.e. hat (space-separated token indices)")
@click.option("-oidx", "--object_idx", type=click.INT, required=False, default=None,
              help="index of object, i.e. cat")
@click.option("-t", "--timestamp", type=click.INT, required=False, default=200,
              help="diffusion_timestamp")
# Input dataset related arguments:
@click.option("--separate_train_test_folders", type=click.BOOL, required=False,
              default=True, help="whether the data directory has separate train and test folders",
              show_default=True)
@click.option("--data_downsample_factor", type=click.FloatRange(min=1.0), required=False,
              default=3.0, help="downscale factor for the input images", show_default=True)
# Voxel-grid related arguments (kept for flag parity; grid comes from the checkpoint):
@click.option("--grid_dims", type=click.INT, nargs=3, required=False, default=(160, 160, 160),
              help="dimensions (#voxels) of the grid", show_default=True)
@click.option("--grid_location", type=click.FLOAT, nargs=3, required=False, default=(0.0, 0.0, 0.0),
              help="location of the grid center", show_default=True)
@click.option("--normalize_scene_scale", type=click.BOOL, required=False, default=False,
              help="whether to normalize the scene's scale to unit radius", show_default=True)
@click.option("--grid_world_size", type=click.FLOAT, nargs=3, required=False, default=(3.0, 3.0, 3.0),
              help="size of the grid in world coordinates", show_default=True)
@click.option("--sh_degree", type=click.INT, required=False, default=0,
              help="spherical harmonics degree. Supported: [0, 1, 2, 3]", show_default=True)
@click.option("--use_relu_field", type=click.BOOL, required=False, default=True,
              help="whether to use relu_fields or traditional grids", show_default=True)
@click.option("--use_softplus_field", type=click.BOOL, required=False, default=True,
              help="whether to use softplus_field or relu_field", show_default=True)
# Rendering related arguments:
@click.option("--render_num_samples_per_ray", type=click.INT, required=False, default=512,
              help="samples per ray during rendering", show_default=True)
@click.option("--parallel_rays_chunk_size", type=click.INT, required=False, default=32768,
              help="rays per chunk for full-image renders", show_default=True)
@click.option("--white_bkgd", type=click.BOOL, required=False, default=True,
              help="white background for synthetic scenes", show_default=True)
# Training related arguments:
@click.option("--ray_batch_size", type=click.INT, required=False, default=84672,
              help="rays per training iteration", show_default=True)
@click.option("--train_num_samples_per_ray", type=click.INT, required=False, default=256,
              help="samples per ray during training", show_default=True)
@click.option("--num_iterations_edit", type=click.INT, required=False, default=8000,
              help="iterations in the editing (SDS) stage", show_default=True)
@click.option("--scale_factor", type=click.FLOAT, required=False, default=2.0,
              help="grid upscale factor per stage", show_default=True)
@click.option("--learning_rate", type=click.FLOAT, required=False, default=0.03,
              help="ADAM learning rate", show_default=True)
@click.option("--learning_rate_attn_learning", type=click.FLOAT, required=False, default=0.035,
              help="ADAM learning rate for the attn-grid stage", show_default=True)
@click.option("--lr_freq", type=click.INT, required=False, default=400,
              help="lr reduction frequency", show_default=True)
@click.option("--lr_decay_start", type=click.INT, required=False, default=5000,
              help="step at which lr decay starts", show_default=True)
@click.option("--lr_gamma", type=click.FLOAT, required=False, default=0.96,
              help="exponential lr decay gamma", show_default=True)
@click.option("--apply_diffuse_render_regularization", type=click.BOOL, required=False, default=True,
              help="apply diffuse render regularization", show_default=False)
@click.option("--num_workers", type=click.INT, required=False, default=4,
              help="unused (device-cached data); kept for flag parity", show_default=True)
@click.option("--log_wandb", type=click.BOOL, required=False, default=False,
              help="log to wandb (if installed)", show_default=True)
@click.option("--wandb_username", type=click.STRING, required=False, default="etaisella",
              help="wandb user name", show_default=True)
@click.option("--wandb_project_name", type=click.STRING, required=False, default="Vox-E",
              help="wandb project name", show_default=True)
# Various frequencies:
@click.option("--save_frequency", type=click.INT, required=False, default=500,
              help="iterations between checkpoints", show_default=True)
@click.option("--test_frequency", type=click.INT, required=False, default=500,
              help="iterations between test-metric computations", show_default=True)
@click.option("--feedback_frequency", type=click.INT, required=False, default=200,
              help="iterations between rendered feedback", show_default=True)
@click.option("--summary_frequency", type=click.INT, required=False, default=50,
              help="iterations between summary logs", show_default=True)
# Miscellaneous modes:
@click.option("--verbose_rendering", type=click.BOOL, required=False, default=False,
              help="show progress while rendering feedback", show_default=True)
@click.option("--fast_debug_mode", type=click.BOOL, required=False, default=False,
              help="fast debug mode", show_default=True)
# sds specific stuff:
@click.option("--do_sds", type=click.BOOL, required=False, default=True,
              help="whether to apply the SDS loss", show_default=True)
@click.option("--downsample_refine_grid", type=click.BOOL, required=False, default=False,
              help="downsample the attn grid when refining (good for real scenes)", show_default=True)
@click.option("--new_frame_frequency", type=click.INT, required=False, default=1,
              help="iterations on the same pose", show_default=True)
@click.option("--density_correlation_weight", type=click.FLOAT, required=False, default=200.0,
              help="weight for density correlation loss", show_default=True)
@click.option("--feature_correlation_weight", type=click.FLOAT, required=False, default=0.0,
              help="weight for feature correlation loss", show_default=True)
@click.option("--tv_density_weight", type=click.FLOAT, required=False, default=0.0,
              help="weight for TV loss on densities", show_default=True)
@click.option("--tv_features_weight", type=click.FLOAT, required=False, default=0.0,
              help="weight for TV loss on features", show_default=True)
# sds timestep scheduling:
@click.option("--sds_t_freq", type=click.INT, required=False, default=600,
              help="max-timestep reduction frequency", show_default=True)
@click.option("--sds_t_start", type=click.INT, required=False, default=4000,
              help="iteration at which max-timestep reduction starts", show_default=True)
@click.option("--sds_t_gamma", type=click.FLOAT, required=False, default=0.75,
              help="max-timestep reduction gamma", show_default=True)
# refinement:
@click.option("--do_refinement", type=click.BOOL, required=False, default=False,
              help="use the refinement stage for improving local edits", show_default=True)
@click.option("--kval", type=click.FLOAT, required=False, default=5.0,
              help="k value used in graphcut", show_default=True)
@click.option("--edit_mask_thresh", type=click.FLOAT, required=False, default=0.992,
              help="probability threshold for edit voxels in graph cut", show_default=True)
@click.option("--num_obj_voxels_thresh", type=click.INT, required=False, default=5000,
              help="number of voxels to mark as object in graph cut", show_default=True)
@click.option("--min_num_edit_voxels", type=click.INT, required=False, default=300,
              help="minimum edit voxels in graph cut", show_default=True)
@click.option("--top_k_edit_thresh", type=click.INT, required=False, default=300,
              help="top-k edit fallback threshold", show_default=True)
@click.option("--top_k_obj_thresh", type=click.INT, required=False, default=200,
              help="top-k object fallback threshold", show_default=True)
@click.option("--attn_tv_weight", type=click.FLOAT, required=False, default=0.01,
              help="TV weight for attn grids", show_default=True)
@click.option("--num_iterations_refine", type=click.INT, required=False, default=1500,
              help="iterations in the refinement stage", show_default=True)
@click.option("--uncoupled_mode", type=click.BOOL, required=False, default=False,
              help="learn in image space without grid coupling", show_default=True)
@click.option("--data_pose_mode", type=click.BOOL, required=False, default=False,
              help="use dataset poses instead of random sampling", show_default=True)
@click.option("--uncoupled_l2_mode", type=click.BOOL, required=False, default=False,
              help="uncoupled mode with l2 loss", show_default=True)
@click.option("--l2_mode", type=click.BOOL, required=False, default=False,
              help="replace DCL with grid-space L2", show_default=True)
@click.option("--l1_mode", type=click.BOOL, required=False, default=False,
              help="replace DCL with grid-space L1", show_default=True)
@click.option("--post_process_scc", type=click.BOOL, required=False, default=False,
              help="run largest-connected-component post processing", show_default=True)
# TPU-native extras:
@click.option("--sd_weights_dir", type=click.Path(file_okay=False, dir_okay=True),
              required=False, default=None,
              help="directory with converted SD weights (see voxe_tpu.models.sd.weights); "
                   "random init without it", show_default=True)
@click.option("--sd_version", type=click.STRING, required=False, default="2.0",
              help="stable diffusion version for the SDS stage", show_default=True)
@click.option("--sd_refine_weights_dir", type=click.Path(file_okay=False, dir_okay=True),
              required=False, default=None,
              help="converted SD **1.4** weights for the refinement stage "
                   "(reference attn_grid_trainer.py:154 uses 1.4 there; the "
                   "--sd_weights_dir tree is version 2.0 and cannot load into "
                   "the 1.4 architecture)", show_default=True)
@click.option("--steps_per_call", type=click.INT, required=False, default=1,
              help="edit/refinement iterations fused into one device dispatch "
              "(lax.scan; covers random-pose AND dataset-pose directional "
              "modes)", show_default=True)
@click.option("--multihost", type=click.BOOL, required=False, default=False,
              help="initialize jax.distributed for multi-host (SPMD) execution; "
              "run the same command on every host", show_default=True)
@click.option("--num_devices", type=click.INT, required=False, default=1,
              help="data-parallel ray batching over this many devices for the "
              "SDS and refinement stages (1-D jax.sharding.Mesh)", show_default=True)
@click.option("--use_shear_warp", type=click.BOOL, required=False, default=True,
              help="route the SDS render through the gather/scatter-free "
              "shear-warp fast path (all pose modes; ~200x the exact path's "
              "TPU step rate). False = exact per-sample renderer",
              show_default=True)
@click.option("--shear_warp_base_res", type=click.INT, required=False, default=None,
              help="side of the square shear-warp base frame fed to SD "
              "(default: max(image_dims)); raise to supersample the object",
              show_default=True)
# fmt: on
def main(**kwargs) -> None:
    config = EasyDict(kwargs)
    if config.multihost:
        from voxe_tpu.parallel.distributed import maybe_init_distributed

        maybe_init_distributed(True)
    model_path = Path(config.ref_model_path)
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

    im_h = train_dataset.camera_intrinsics.height
    im_w = train_dataset.camera_intrinsics.width
    image_dims = (im_h, im_w)

    pretrained_vol_mod, _ = load_volumetric_model(model_path)
    sds_vol_mod = VolumetricModel(
        copy.deepcopy(pretrained_vol_mod.grid),
        pretrained_vol_mod.render_config.replace(
            num_samples_per_ray=config.train_num_samples_per_ray,
            render_num_samples_per_ray=config.render_num_samples_per_ray,
            parallel_rays_chunk_size=config.parallel_rays_chunk_size,
            white_bkgd=config.white_bkgd,
        ),
        dict(pretrained_vol_mod.extra_info),
    )

    sd_weights_dir = Path(config.sd_weights_dir) if config.sd_weights_dir else None
    sd_refine_weights_dir = (
        Path(config.sd_refine_weights_dir) if config.sd_refine_weights_dir else None
    )
    if (
        config.do_refinement
        and sd_weights_dir is not None
        and sd_refine_weights_dir is None
        and config.sd_version != "tiny"
    ):
        # fail BEFORE the SDS stage, not 8000 iterations later: the staged
        # --sd_weights_dir tree is SD 2.0 and cannot load into the 1.4
        # architecture the refinement stage uses
        raise click.UsageError(
            "--do_refinement with real SD weights needs --sd_refine_weights_dir "
            "pointing at a converted SD **1.4** snapshot (refinement uses 1.4, "
            "reference attn_grid_trainer.py:154)"
        )

    from voxe_tpu.parallel.mesh import maybe_mesh

    edit_mesh = maybe_mesh(config.num_devices)

    train_sh_vox_grid_vol_mod_with_posed_images_and_sds(
        sds_vol_mod=sds_vol_mod,
        pretrained_vol_mod=pretrained_vol_mod,
        image_dims=image_dims,
        train_dataset=train_dataset,
        output_dir=output_path,
        ray_batch_size=config.ray_batch_size,
        num_iterations=config.num_iterations_edit,
        scale_factor=config.scale_factor,
        learning_rate=config.learning_rate,
        lr_decay_start=config.lr_decay_start,
        lr_freq=config.lr_freq,
        lr_gamma=config.lr_gamma,
        save_freq=config.save_frequency,
        feedback_freq=config.feedback_frequency,
        summary_freq=config.summary_frequency,
        apply_diffuse_render_regularization=config.apply_diffuse_render_regularization,
        verbose_rendering=config.verbose_rendering,
        sds_prompt=config.prompt,
        new_frame_frequency=config.new_frame_frequency,
        density_correlation_weight=config.density_correlation_weight,
        feature_correlation_weight=config.feature_correlation_weight,
        tv_density_weight=config.tv_density_weight,
        tv_features_weight=config.tv_features_weight,
        do_sds=config.do_sds,
        sds_t_freq=config.sds_t_freq,
        sds_t_start=config.sds_t_start,
        sds_t_gamma=config.sds_t_gamma,
        uncoupled_mode=config.uncoupled_mode,
        data_pose_mode=config.data_pose_mode,
        uncoupled_l2_mode=config.uncoupled_l2_mode,
        l2_mode=config.l2_mode,
        l1_mode=config.l1_mode,
        sd_version=config.sd_version,
        sd_weights_dir=sd_weights_dir,
        fast_debug_mode=config.fast_debug_mode,
        steps_per_call=config.steps_per_call,
        mesh=edit_mesh,
        use_shear_warp=config.use_shear_warp,
        shear_warp_base_res=config.shear_warp_base_res,
    )

    if config.do_refinement:
        from voxe_tpu.train.refine import refine_edited_relu_field

        final_path = output_path / "saved_models" / "model_final.pth"
        vol_mod_edit, _ = load_volumetric_model(final_path, with_attn=True)
        vol_mod_obj, _ = load_volumetric_model(final_path, with_attn=True)
        vol_mod_output, _ = load_volumetric_model(final_path, with_attn=True)

        edit_idx = [int(i) for i in config.edit_idx.split()]

        refine_edited_relu_field(
            vol_mod_edit=vol_mod_edit,
            vol_mod_object=vol_mod_obj,
            vol_mod_ref=pretrained_vol_mod,
            vol_mod_output=vol_mod_output,
            train_dataset=train_dataset,
            output_dir=output_path,
            prompt=config.prompt,
            edit_idx=edit_idx,
            object_idx=config.object_idx,
            timestamp=config.timestamp,
            image_dims=image_dims,
            ray_batch_size=config.ray_batch_size,
            num_iterations=config.num_iterations_refine,
            learning_rate=config.learning_rate_attn_learning,
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
            sd_weights_dir=sd_refine_weights_dir,
            # refinement uses SD 1.4 (reference attn_grid_trainer.py:154)
            # unless the tiny plumbing config was requested
            sd_version="tiny" if config.sd_version == "tiny" else "1.4",
            mesh=edit_mesh,
            use_shear_warp=config.use_shear_warp,
            shear_warp_base_res=config.shear_warp_base_res,
            steps_per_call=config.steps_per_call,
        )

    if config.post_process_scc:
        from voxe_tpu.seg.components import scc_post_process

        target = (
            output_path / "saved_models" / "model_final_refined.pth"
            if config.do_refinement
            else output_path / "saved_models" / "model_final.pth"
        )
        vol_mod, _ = load_volumetric_model(target, with_attn=config.do_refinement)
        new_densities = scc_post_process(
            np.asarray(vol_mod.grid.densities),
            np.asarray(pretrained_vol_mod.grid.densities),
        )
        import jax.numpy as jnp

        vol_mod.grid = vol_mod.grid.replace(densities=jnp.asarray(new_densities))
        vol_mod.save(
            target,
            extra_info={
                CAMERA_BOUNDS: list(train_dataset.camera_bounds),
                CAMERA_INTRINSICS: list(train_dataset.camera_intrinsics),
                HEMISPHERICAL_RADIUS: train_dataset.get_hemispherical_radius_estimate(),
            },
        )


from voxe_tpu.utils.constants import (  # noqa: E402
    CAMERA_BOUNDS,
    CAMERA_INTRINSICS,
    HEMISPHERICAL_RADIUS,
)

if __name__ == "__main__":
    main()
