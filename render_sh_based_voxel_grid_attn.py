"""CLI: render attention-blend turntable videos of a trained attn grid.

Flag-for-flag rebuild of the reference CLI
(reference: render_sh_based_voxel_grid_attn.py:36-235). With --use_sd, the
per-frame live SD attention overlay requires SD weights (sd_weights_dir);
otherwise the grid's own attn channel is blended over the RGB render.
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
from voxe_tpu.viz.animations import (
    render_camera_path_for_volumetric_model_attn_blend,
)
from voxe_tpu.viz.video import write_video


# fmt: off
@click.command()
# Required arguments:
@click.option("-i", "--model_path", type=click.Path(file_okay=True, dir_okay=False),
              required=True, help="path to the trained attn model")
@click.option("-o", "--output_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path for saving rendered output")
@click.option("-r", "--ref_path", type=click.Path(file_okay=True, dir_okay=False), default=None,
              required=False, help="reference model for camera metadata override")
# Non-required render configuration options:
@click.option("-d", "--data_path", type=click.Path(file_okay=False, dir_okay=True),
              required=False, help="path to the input dataset (camera_path=dataset)")
@click.option("--overridden_num_samples_per_ray", type=click.IntRange(min=1), default=512,
              required=False, help="overridden num_samples_per_ray")
@click.option("--render_scale_factor", type=click.FLOAT, default=2.0,
              required=False, help="render resolution factor")
@click.option("--camera_path", type=click.Choice(["thre360", "spiral", "dataset"]), default="thre360",
              required=False, help="camera path for the animation")
@click.option("--camera_pitch", type=click.FLOAT, default=60.0,
              required=False, help="camera pitch for the 360 path")
@click.option("--num_frames", type=click.IntRange(min=1), default=180,
              required=False, help="number of frames")
@click.option("--vertical_camera_height", type=click.FLOAT, default=3.0,
              required=False, help="spiral camera height")
@click.option("--num_spiral_rounds", type=click.IntRange(min=1), default=2,
              required=False, help="spiral rounds")
@click.option("--fps", type=click.IntRange(min=1), default=60,
              required=False, help="video fps")
@click.option("--timestamp", type=click.INT, default=0,
              required=False, help="diffusion timestamp for live SD attention")
@click.option("--use_sd", type=click.BOOL, default=False,
              required=False, help="overlay live SD attention instead of the attn grid")
@click.option("--load_attention", type=click.BOOL, default=True,
              required=False, help="load the checkpoint's attn channel")
@click.option("--sds_prompt", type=click.STRING, required=False, default="",
              help="prompt for live SD attention")
@click.option("--index_to_attn", type=click.INT, required=False, default=11,
              help="token index for live SD attention")
@click.option("--save_freq", type=click.INT, default=None,
              required=False, help="save every save_freq-th frame as PNG")
# TPU-native extras:
@click.option("--sd_weights_dir", type=click.Path(file_okay=False, dir_okay=True),
              required=False, default=None, help="converted SD weights dir")
@click.option("--sd_version", type=click.STRING, required=False, default="1.4",
              help="SD version for live attention", show_default=True)
@click.option("--use_shear_warp", type=click.BOOL, default=False, show_default=True,
              help="fast screen-space shear-warp frames (preview-grade)")
# fmt: on
def main(**kwargs) -> None:
    config = EasyDict(kwargs)
    output_path = Path(config.output_path)
    output_path.mkdir(exist_ok=True, parents=True)

    vol_mod, extra_info = load_volumetric_model(
        Path(config.model_path), with_attn=config.load_attention
    )
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
            hemispherical_radius, config.camera_pitch, config.num_frames
        )
    elif config.camera_path == "spiral":
        animation_poses = get_thre360_spiral_animation_poses(
            (hemispherical_radius / 8.0, hemispherical_radius),
            config.vertical_camera_height,
            config.num_spiral_rounds,
            config.num_frames,
        )
    else:
        data_path = Path(config.data_path)
        dataset = PosedImagesDataset(
            images_dir=data_path / "train",
            camera_params_json=data_path / "train_camera_params.json",
            rgba_white_bkgd=True,
        )
        animation_poses = [
            CameraPose(rotation=p[:, :3], translation=p[:, 3:]) for p in dataset.poses
        ]

    if config.use_sd:
        # live SD attention overlay per frame
        import jax
        import numpy as np
        from matplotlib import pyplot as plt

        from voxe_tpu.models.sd import StableDiffusion
        from voxe_tpu.models.sd.cross_attn import normalize_attn_map
        from voxe_tpu.utils.camera import scale_camera_intrinsics, to8b

        sd = StableDiffusion(
            config.sd_version,
            weights_dir=Path(config.sd_weights_dir) if config.sd_weights_dir else None,
        )
        intr = scale_camera_intrinsics(camera_intrinsics, config.render_scale_factor)
        key = jax.random.PRNGKey(0)
        frames = []
        for pose in animation_poses:
            out = vol_mod.render(
                intr, pose, num_samples_per_ray=config.overridden_num_samples_per_ray
            )
            rgb = np.asarray(out.colour)
            key, sub = jax.random.split(key)
            maps, _ = sd.get_attn_map(
                config.sds_prompt,
                out.colour[None],
                sub,
                timestamp=config.timestamp,
                indices_to_fetch=[config.index_to_attn],
            )
            attn = np.asarray(normalize_attn_map(maps[0]))
            attn_col = plt.get_cmap("jet")(attn)[..., :3]
            frames.append(to8b(0.55 * rgb + 0.45 * attn_col))
        import numpy as _np

        animation_frames = _np.stack(frames)
    else:
        animation_frames = render_camera_path_for_volumetric_model_attn_blend(
            vol_mod,
            animation_poses,
            camera_intrinsics,
            overridden_num_samples_per_ray=config.overridden_num_samples_per_ray,
            render_scale_factor=config.render_scale_factor,
            use_shear_warp=config.use_shear_warp,
        )

    if config.save_freq is not None:
        import imageio.v2 as imageio

        for idx in range(0, len(animation_frames), config.save_freq):
            imageio.imwrite(output_path / f"frame_{idx}.png", animation_frames[idx])

    write_video(output_path / "rendered_video.mp4", animation_frames, fps=config.fps)


if __name__ == "__main__":
    main()
