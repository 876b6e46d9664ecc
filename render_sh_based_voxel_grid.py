"""CLI: render a 360 turntable/spiral/dataset-path video of a trained grid.

Flag-for-flag rebuild of the reference CLI
(reference: render_sh_based_voxel_grid.py:33-196).
"""
from pathlib import Path

import click

from voxe_tpu.data.dataset import PosedImagesDataset
from voxe_tpu.models.volumetric import load_volumetric_model
from voxe_tpu.utils.camera import (
    CameraIntrinsics,
    CameraPose,
    get_thre360_animation_poses,
    get_thre360_spiral_animation_poses,
)
from voxe_tpu.utils.constants import CAMERA_INTRINSICS, HEMISPHERICAL_RADIUS
from voxe_tpu.utils.misc import EasyDict
from voxe_tpu.viz.animations import render_camera_path_for_volumetric_model
from voxe_tpu.viz.video import write_video


# fmt: off
@click.command()
# Required arguments:
@click.option("-i", "--model_path", type=click.Path(file_okay=True, dir_okay=False),
              required=True, help="path to the trained (reconstructed) model")
@click.option("-o", "--output_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path for saving rendered output")
@click.option("-r", "--ref_path", type=click.Path(file_okay=True, dir_okay=False), default=None,
              required=False, help="reference model whose camera metadata overrides this one's")
# Non-required render configuration options:
@click.option("-d", "--data_path", type=click.Path(file_okay=False, dir_okay=True),
              required=False, help="path to the input dataset (for camera_path=dataset)")
@click.option("--overridden_num_samples_per_ray", type=click.IntRange(min=1), default=512,
              required=False, help="overridden (increased) num_samples_per_ray for renders")
@click.option("--render_scale_factor", type=click.FLOAT, default=2.0,
              required=False, help="overridden (increased) render resolution factor")
@click.option("--camera_path", type=click.Choice(["thre360", "spiral", "dataset"]), default="thre360",
              required=False, help="camera path used for rendering the animation")
# thre360 path options:
@click.option("--camera_pitch", type=click.FLOAT, default=60.0,
              required=False, help="pitch-angle value for the camera for the 360 path")
@click.option("--num_frames", type=click.IntRange(min=1), default=180,
              required=False, help="number of frames in the video")
# spiral path options:
@click.option("--vertical_camera_height", type=click.FLOAT, default=3.0,
              required=False, help="height at which the camera spiralling happens")
@click.option("--num_spiral_rounds", type=click.IntRange(min=1), default=2,
              required=False, help="number of spiral rounds")
# Video options:
@click.option("--fps", type=click.IntRange(min=1), default=60,
              required=False, help="frames per second of the video")
# Output saving additions:
@click.option("--save_freq", type=click.INT, default=None,
              required=False, help="save every save_freq-th frame as a PNG")
@click.option("-p", "--sds_prompt", type=click.STRING, required=False, default=None,
              help="sds prompt; if given, written to prompt.txt")
@click.option("--use_shear_warp", type=click.BOOL, default=False, show_default=True,
              help="TPU-native fast path: render frames via the screen-space "
                   "shear-warp renderer (preview-grade quadrature) instead of "
                   "the exact per-sample renderer")
# fmt: on
def main(**kwargs) -> None:
    config = EasyDict(kwargs)
    model_path = Path(config.model_path)
    output_path = Path(config.output_path)
    output_path.mkdir(exist_ok=True, parents=True)

    if config.sds_prompt is not None:
        (output_path / "prompt.txt").write_text(config.sds_prompt)

    vol_mod, extra_info = load_volumetric_model(model_path)
    vol_mod.render_config = vol_mod.render_config.replace(white_bkgd=True)

    if config.ref_path is not None:
        _, extra_info = load_volumetric_model(Path(config.ref_path))

    hemispherical_radius = float(extra_info[HEMISPHERICAL_RADIUS])
    camera_intrinsics = CameraIntrinsics(
        int(extra_info[CAMERA_INTRINSICS][0]),
        int(extra_info[CAMERA_INTRINSICS][1]),
        float(extra_info[CAMERA_INTRINSICS][2]),
    )

    if config.camera_path == "thre360":
        animation_poses = get_thre360_animation_poses(
            hemispherical_radius=hemispherical_radius,
            camera_pitch=config.camera_pitch,
            num_poses=config.num_frames,
        )
    elif config.camera_path == "spiral":
        animation_poses = get_thre360_spiral_animation_poses(
            horizontal_radius_range=(hemispherical_radius / 8.0, hemispherical_radius),
            vertical_camera_height=config.vertical_camera_height,
            num_rounds=config.num_spiral_rounds,
            num_poses=config.num_frames,
        )
    elif config.camera_path == "dataset":
        data_path = Path(config.data_path)
        train_dataset = PosedImagesDataset(
            images_dir=data_path / "train",
            camera_params_json=data_path / "train_camera_params.json",
            rgba_white_bkgd=True,
        )
        animation_poses = [
            CameraPose(rotation=p[:, :3], translation=p[:, 3:])
            for p in train_dataset.poses
        ]
    else:  # pragma: no cover
        raise ValueError(f"unknown camera_path {config.camera_path}")

    animation_frames = render_camera_path_for_volumetric_model(
        vol_mod=vol_mod,
        camera_path=animation_poses,
        camera_intrinsics=camera_intrinsics,
        overridden_num_samples_per_ray=config.overridden_num_samples_per_ray,
        render_scale_factor=config.render_scale_factor,
        image_save_freq=config.save_freq,
        image_save_path=output_path,
        use_shear_warp=config.use_shear_warp,
    )

    write_video(output_path / "rendered_video.mp4", animation_frames, fps=config.fps)


if __name__ == "__main__":
    main()
