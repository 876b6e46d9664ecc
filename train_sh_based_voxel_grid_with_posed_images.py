"""CLI: reconstruct an SH voxel grid from posed images.

Flag-for-flag rebuild of the reference CLI
(reference: train_sh_based_voxel_grid_with_posed_images.py:38-271) on the
TPU-native voxe_tpu stack.
"""
from pathlib import Path

import click
import jax.numpy as jnp

from voxe_tpu.data.dataset import PosedImagesDataset
from voxe_tpu.grid.voxels import (
    VoxelGrid,
    VoxelGridConfig,
    VoxelGridLocation,
    VoxelSize,
)
from voxe_tpu.models.volumetric import VolumetricModel
from voxe_tpu.render.interface import SHVoxGridRenderConfig
from voxe_tpu.train.recon import train_sh_vox_grid_vol_mod_with_posed_images
from voxe_tpu.utils.constants import NUM_COLOUR_CHANNELS
from voxe_tpu.utils.logging import log
from voxe_tpu.utils.misc import (
    EasyDict,
    compute_expected_density_scale_for_relu_field_grid,
    log_config_to_disk,
)


# fmt: off
@click.command()
# Required arguments:
@click.option("-d", "--data_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path to the input dataset")
@click.option("-o", "--output_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path for training output")
# Input dataset related arguments:
@click.option("--separate_train_test_folders", type=click.BOOL, required=False,
              default=True, help="whether the data directory has separate train and test folders",
              show_default=True)
@click.option("--data_downsample_factor", type=click.FloatRange(min=1.0), required=False,
              default=1.0, help="downscale factor for the input images if needed", show_default=True)
# Voxel-grid related arguments:
@click.option("--grid_dims", type=click.INT, nargs=3, required=False, default=(160, 160, 160),
              help="dimensions (#voxels) of the grid along x, y and z axes", show_default=True)
@click.option("--grid_location", type=click.FLOAT, nargs=3, required=False, default=(0.0, 0.0, 0.0),
              help="location of the grid center in world coords", show_default=True)
@click.option("--normalize_scene_scale", type=click.BOOL, required=False, default=False,
              help="whether to normalize the scene's scale to unit radius", show_default=True)
@click.option("--grid_world_size", type=click.FLOAT, nargs=3, required=False, default=(3.0, 3.0, 3.0),
              help="size (extent) of the grid in world coordinate system", show_default=True)
@click.option("--sh_degree", type=click.INT, required=False, default=0,
              help="degree of spherical harmonics coefficients. Supported: [0, 1, 2, 3]",
              show_default=True)
@click.option("--use_relu_field", type=click.BOOL, required=False, default=True,
              help="whether to use relu_fields or revert to traditional grids", show_default=True)
@click.option("--use_softplus_field", type=click.BOOL, required=False, default=True,
              help="whether to use softplus_field or relu_field", show_default=True)
# Rendering related arguments:
@click.option("--render_num_samples_per_ray", type=click.INT, required=False, default=1024,
              help="number of samples taken per ray during rendering", show_default=True)
@click.option("--parallel_rays_chunk_size", type=click.INT, required=False, default=32768,
              help="number of parallel rays processed per chunk for full-image renders", show_default=True)
@click.option("--white_bkgd", type=click.BOOL, required=False, default=True,
              help="whether to use white background for training with synthetic scenes", show_default=True)
@click.option("--linear_disparity_sampling", type=click.BOOL, required=False, default=False,
              help="whether to use linear disparity sampling, good for real scenes", show_default=True)
@click.option("--optimized_sampling", type=click.BOOL, required=False, default=False,
              help="whether to use AABB-optimized sampling", show_default=True)
# Training related arguments:
@click.option("--ray_batch_size", type=click.INT, required=False, default=32768,
              help="number of randomly sampled rays used per training iteration", show_default=True)
@click.option("--train_num_samples_per_ray", type=click.INT, required=False, default=256,
              help="number of samples taken per ray during training", show_default=True)
@click.option("--num_stages", type=click.INT, required=False, default=4,
              help="number of progressive growing stages used in training", show_default=True)
@click.option("--num_iterations_per_stage", type=click.INT, required=False, default=500,
              help="number of training iterations performed per stage", show_default=True)
@click.option("--scale_factor", type=click.FLOAT, required=False, default=2.0,
              help="factor by which the grid is up-scaled after each stage", show_default=True)
@click.option("--learning_rate", type=click.FLOAT, required=False, default=0.03,
              help="learning rate used at the beginning (ADAM optimizer)", show_default=True)
@click.option("--lr_decay_steps_per_stage", type=click.INT, required=False, default=400,
              help="iterations after which lr is exponentially decayed per stage", show_default=True)
@click.option("--lr_decay_gamma_per_stage", type=click.FLOAT, required=False, default=0.1,
              help="gamma for exponential lr decay (per stage)", show_default=True)
@click.option("--stagewise_lr_decay_gamma", type=click.FLOAT, required=False, default=0.9,
              help="gamma for reducing lr after each stage", show_default=True)
@click.option("--apply_diffuse_render_regularization", type=click.BOOL, required=False, default=True,
              help="whether to apply the diffuse render regularization", show_default=True)
@click.option("--num_workers", type=click.INT, required=False, default=4,
              help="unused (data is device-cached); kept for flag parity", show_default=True)
# Various frequencies:
@click.option("--save_frequency", type=click.INT, required=False, default=250,
              help="iterations after which a model is saved", show_default=True)
@click.option("--test_frequency", type=click.INT, required=False, default=250,
              help="iterations after which test metrics are computed", show_default=True)
@click.option("--feedback_frequency", type=click.INT, required=False, default=100,
              help="iterations after which rendered feedback is generated", show_default=True)
@click.option("--summary_frequency", type=click.INT, required=False, default=50,
              help="iterations after which training summaries are logged", show_default=True)
# Miscellaneous modes:
@click.option("--verbose_rendering", type=click.BOOL, required=False, default=False,
              help="whether to show progress while rendering feedback", show_default=True)
@click.option("--fast_debug_mode", type=click.BOOL, required=False, default=False,
              help="fast debug mode (skips testing and slow visualizations)", show_default=True)
# Additional weights:
@click.option("--lpips_weight", type=click.FLOAT, required=False, default=0.0,
              help="weight of lpips loss (needs VGG weights available)", show_default=True)
# TPU-native extras:
@click.option("--gather_dtype", type=click.Choice(["float32", "bfloat16"]), required=False,
              default="bfloat16", help="dtype of the grid table the renderer gathers from; "
              "bfloat16 halves HBM gather traffic (quality-neutral)", show_default=True)
@click.option("--steps_per_call", type=click.INT, required=False, default=1,
              help="training steps fused into one device dispatch (lax.scan); "
              ">1 removes host round-trips per step", show_default=True)
@click.option("--resume", "resume_from", type=click.Path(file_okay=True, dir_okay=False),
              required=False, default=None,
              help="resume mid-run from a training_state_latest.pth", show_default=True)
@click.option("--coarse_stages_on_cpu", type=click.BOOL, required=False, default=False,
              help="run all but the final stage on host CPU (coarse stages are "
              "trivial compute; avoids per-stage accelerator compiles)", show_default=True)
@click.option("--multihost", type=click.BOOL, required=False, default=False,
              help="initialize jax.distributed for multi-host (SPMD) execution; "
              "run the same command on every host", show_default=True)
@click.option("--num_devices", type=click.INT, required=False, default=1,
              help="data-parallel ray batching over this many devices "
              "(1-D jax.sharding.Mesh; grads all-reduce over ICI)", show_default=True)
@click.option("--use_fused_kernel", type=click.BOOL, required=False, default=False,
              help="route ray compositing through the fused Pallas TPU kernel",
              show_default=True)
@click.option("--use_shear_warp", type=click.BOOL, required=False, default=True,
              help="train on the gather/scatter-free shear-warp fast path "
              "(banded interpolation matmuls; targets pre-warped to the base "
              "plane once per stage; measured held-out parity with the exact "
              "renderer at 17x less wall-clock, BENCHMARKS.md); False selects "
              "the exact per-sample parity renderer", show_default=True)
@click.option("--shear_warp_base_res", type=click.INT, required=False, default=None,
              help="base-plane lattice resolution for --use_shear_warp "
              "(default: 2x the stage image resolution — the window spans "
              "the whole grid, 2x restores the object's sampling density)",
              show_default=True)
# fmt: on
def main(**kwargs) -> None:
    config = EasyDict(kwargs)
    if config.multihost:
        from voxe_tpu.parallel.distributed import maybe_init_distributed

        maybe_init_distributed(True)
    data_path = Path(config.data_path)
    output_path = Path(config.output_path)

    log.info("logging configuration file ...")
    log_config_to_disk(config, output_path)

    if config.separate_train_test_folders:
        train_dataset, test_dataset = (
            PosedImagesDataset(
                images_dir=data_path / mode,
                camera_params_json=data_path / f"{mode}_camera_params.json",
                normalize_scene_scale=config.normalize_scene_scale,
                downsample_factor=config.data_downsample_factor,
                rgba_white_bkgd=config.white_bkgd,
            )
            for mode in ("train", "test")
        )
    else:
        train_dataset = PosedImagesDataset(
            images_dir=data_path / "images",
            camera_params_json=data_path / "camera_params.json",
            normalize_scene_scale=config.normalize_scene_scale,
            downsample_factor=config.data_downsample_factor,
            rgba_white_bkgd=config.white_bkgd,
        )
        # single-folder layout with a test_camera_params.json alongside:
        # build the held-out split from the SAME images dir (the dataset
        # loads only json-listed frames) so PSNR/SSIM/LPIPS evals still run
        test_params = data_path / "test_camera_params.json"
        if test_params.exists():
            test_dataset = PosedImagesDataset(
                images_dir=data_path / "images",
                camera_params_json=test_params,
                normalize_scene_scale=config.normalize_scene_scale,
                downsample_factor=config.data_downsample_factor,
                rgba_white_bkgd=config.white_bkgd,
            )
        else:
            test_dataset = None

    # density activation mode (reference train CLI :176-206): softplus-field
    # wins over relu-field when both flags are on (same precedence as the
    # reference's if/if/else chain)
    if config.use_softplus_field:
        activations = dict(
            density_preactivation="identity",
            density_postactivation="softplus",
            expected_density_scale=compute_expected_density_scale_for_relu_field_grid(
                config.grid_world_size
            ),
        )
    elif config.use_relu_field:
        activations = dict(
            density_preactivation="identity",
            density_postactivation="relu",
            expected_density_scale=compute_expected_density_scale_for_relu_field_grid(
                config.grid_world_size
            ),
        )
    else:
        activations = dict(
            density_preactivation="abs",
            density_postactivation="identity",
            expected_density_scale=1.0,
        )

    num_sh_features = NUM_COLOUR_CHANNELS * ((config.sh_degree + 1) ** 2)
    voxel_size = VoxelSize(
        *[
            dim_size / grid_dim
            for dim_size, grid_dim in zip(config.grid_world_size, config.grid_dims)
        ]
    )
    grid_config = VoxelGridConfig(
        voxel_size=voxel_size,
        grid_location=VoxelGridLocation(*config.grid_location),
        gather_dtype=config.gather_dtype,
        **activations,
    )
    # placeholder arrays; the trainer re-randomizes at the coarsest stage
    grid = VoxelGrid(
        densities=jnp.zeros((*config.grid_dims, 1), dtype=jnp.float32),
        features=jnp.zeros((*config.grid_dims, num_sh_features), dtype=jnp.float32),
        config=grid_config,
    )

    vol_mod = VolumetricModel(
        grid,
        SHVoxGridRenderConfig(
            num_samples_per_ray=config.train_num_samples_per_ray,
            camera_bounds=train_dataset.camera_bounds,
            white_bkgd=config.white_bkgd,
            render_num_samples_per_ray=config.render_num_samples_per_ray,
            parallel_rays_chunk_size=config.parallel_rays_chunk_size,
            optimized_sampling=config.optimized_sampling,
            linear_disparity_sampling=config.linear_disparity_sampling,
            use_fused_kernel=config.use_fused_kernel,
        ),
    )

    train_sh_vox_grid_vol_mod_with_posed_images(
        vol_mod=vol_mod,
        train_dataset=train_dataset,
        output_dir=output_path,
        test_dataset=test_dataset,
        ray_batch_size=config.ray_batch_size,
        num_stages=config.num_stages,
        num_iterations_per_stage=config.num_iterations_per_stage,
        scale_factor=config.scale_factor,
        learning_rate=config.learning_rate,
        lr_decay_gamma_per_stage=config.lr_decay_gamma_per_stage,
        lr_decay_steps_per_stage=config.lr_decay_steps_per_stage,
        stagewise_lr_decay_gamma=config.stagewise_lr_decay_gamma,
        save_freq=config.save_frequency,
        test_freq=config.test_frequency,
        feedback_freq=config.feedback_frequency,
        summary_freq=config.summary_frequency,
        apply_diffuse_render_regularization=config.apply_diffuse_render_regularization,
        verbose_rendering=config.verbose_rendering,
        fast_debug_mode=config.fast_debug_mode,
        steps_per_call=config.steps_per_call,
        resume_from=Path(config.resume_from) if config.resume_from else None,
        coarse_stages_on_cpu=config.coarse_stages_on_cpu,
        num_devices=config.num_devices,
        use_shear_warp=config.use_shear_warp,
        shear_warp_base_res=config.shear_warp_base_res,
    )


if __name__ == "__main__":
    main()
