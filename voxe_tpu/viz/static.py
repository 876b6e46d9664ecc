"""Static feedback visualizations: colour/depth/acc panels per training step.

Rebuild of reference: thre3d_atom/visualizations/static.py:84-281.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import matplotlib
import numpy as np

from voxe_tpu.utils.camera import (
    CameraIntrinsics,
    CameraPose,
    adjust_dynamic_range,
    to8b,
)
from voxe_tpu.utils.constants import EXTRA_ACCUMULATED_WEIGHTS


def postprocess_depth_map(
    depth_map: np.ndarray, acc_map: Optional[np.ndarray] = None
) -> np.ndarray:
    """Magma-colormapped depth with optional white-background compositing
    (reference: utils/imaging_utils.py:93-125)."""
    from matplotlib import pyplot as plt

    depth_map = np.asarray(depth_map)
    if depth_map.ndim == 3 and depth_map.shape[-1] == 1:
        depth_map = depth_map[..., 0]

    if acc_map is not None:
        acc_map = np.asarray(acc_map)
        fg_depth = depth_map * np.squeeze(acc_map, axis=-1)
        depth_min, depth_max = depth_map.min(), fg_depth.max()
    else:
        depth_min, depth_max = depth_map.min(), depth_map.max()

    depth_map = adjust_dynamic_range(
        depth_map, (depth_min, depth_max if depth_max > depth_min else depth_min + 1e-6),
        (0, 1), slack=True,
    )
    coloured = matplotlib.colormaps["magma"].resampled(1024)(depth_map)[..., :3]

    if acc_map is not None:
        nr = coloured * acc_map + (1.0 - acc_map) ** 2
        dr = acc_map + (1.0 - acc_map) ** 2
        return to8b(nr / dr)
    return to8b(coloured)


def visualize_camera_rays(
    dataset,
    output_dir: Path,
    num_rays_per_image: int = 1,
) -> None:
    """3D matplotlib scatter of camera origins + one ray per image
    (reference static.py:31-81). Written to camera_rays.png."""

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    intr = dataset.camera_intrinsics
    # host-side NumPy pinhole math for just the picked pixels (cast_rays
    # semantics, rays.py:57-75: pixel centers at +0.5, camera looks down -z,
    # +y up). Casting the full HxW grid on device and fetching it per image
    # just to draw num_rays_per_image arrows costs ~15 MB/image over the
    # ~32 MB/s relay — minutes of startup for a 100-view real scene.
    h, w, focal = intr.height, intr.width, float(intr.focal)
    picks = np.linspace(0, h * w - 1, num_rays_per_image).astype(int)
    px = picks % w + 0.5
    py = picks // w + 0.5
    dirs_cam = np.stack(
        [(px - w * 0.5) / focal, -(py - h * 0.5) / focal, -np.ones_like(px)],
        axis=-1,
    )  # [num_rays, 3]
    for pose_arr in dataset.poses:
        rotation = np.asarray(pose_arr[:, :3], np.float64)
        origin = np.asarray(pose_arr[:, 3:], np.float64).reshape(3)
        for d in dirs_cam @ rotation.T:
            ax.quiver(
                *origin, *d, length=1.5, color="tab:blue", arrow_length_ratio=0.1
            )
        ax.scatter(*origin, color="tab:red", s=12)
    ax.set_xlabel("x"), ax.set_ylabel("y"), ax.set_zlabel("z")
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_dir / "camera_rays.png", dpi=120)
    plt.close(fig)


def visualize_sh_vox_grid_vol_mod_rendered_feedback(
    vol_mod,
    vol_mod_name: str,
    render_feedback_pose: CameraPose,
    camera_intrinsics: CameraIntrinsics,
    global_step: int,
    feedback_logs_dir: Path,
    training_time: float = 0.0,
    log_diffuse_rendered_version: bool = True,
    overridden_num_samples_per_ray: Optional[int] = None,
    verbose_rendering: bool = False,
    use_shear_warp: bool = False,
) -> None:
    """Render colour + depth + inverted-acc side-by-side feedback PNGs
    (reference static.py:156-223). `use_shear_warp` renders the feedback
    frame through the fast screen-space path — trainers running in
    shear-warp mode pass it so periodic feedback costs ~ms instead of an
    exact full-frame render."""
    import imageio.v2 as imageio

    overrides = {}
    if overridden_num_samples_per_ray is not None:
        overrides["num_samples_per_ray"] = overridden_num_samples_per_ray
    if use_shear_warp:
        overrides["use_shear_warp"] = True

    out = vol_mod.render(camera_intrinsics, render_feedback_pose, **overrides)
    colour = np.asarray(out.colour)
    depth = np.asarray(out.depth)
    acc = np.asarray(out.extra[EXTRA_ACCUMULATED_WEIGHTS])

    depth_img = postprocess_depth_map(depth, acc_map=acc)
    acc_img = to8b(np.repeat(1.0 - acc, 3, axis=-1))
    panel = np.concatenate([to8b(colour), depth_img, acc_img], axis=1)

    feedback_logs_dir = Path(feedback_logs_dir)
    feedback_logs_dir.mkdir(parents=True, exist_ok=True)
    imageio.imwrite(
        feedback_logs_dir / f"{vol_mod_name}_iter_{global_step}.png", panel
    )

    if log_diffuse_rendered_version:
        out_d = vol_mod.render(
            camera_intrinsics, render_feedback_pose, render_diffuse=True, **overrides
        )
        imageio.imwrite(
            feedback_logs_dir / f"{vol_mod_name}_diffuse_iter_{global_step}.png",
            to8b(np.asarray(out_d.colour)),
        )


def visualize_sh_vox_grid_vol_mod_rendered_feedback_attn(
    vol_mod,
    vol_mod_name: str,
    render_feedback_pose: CameraPose,
    camera_intrinsics: CameraIntrinsics,
    global_step: int,
    feedback_logs_dir: Path,
    use_shear_warp: bool = False,
) -> None:
    """Attn-channel feedback: jet-colormapped attn blended over the RGB render
    (reference static.py:225-281)."""
    import imageio.v2 as imageio
    from matplotlib import pyplot as plt

    overrides = {"use_shear_warp": True} if use_shear_warp else {}
    out_rgb = vol_mod.render(camera_intrinsics, render_feedback_pose, **overrides)
    out_attn = vol_mod.render(
        camera_intrinsics, render_feedback_pose, attn=True, **overrides
    )
    rgb = np.asarray(out_rgb.colour)
    attn = np.asarray(out_attn.colour)[..., 0]

    attn_col = matplotlib.colormaps["jet"](np.clip(attn, 0, 1))[..., :3]
    blend = 0.55 * rgb + 0.45 * attn_col
    panel = np.concatenate([to8b(rgb), to8b(attn_col), to8b(blend)], axis=1)

    feedback_logs_dir = Path(feedback_logs_dir)
    feedback_logs_dir.mkdir(parents=True, exist_ok=True)
    imageio.imwrite(
        feedback_logs_dir / f"{vol_mod_name}_attn_iter_{global_step}.png", panel
    )
