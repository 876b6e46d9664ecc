"""Camera-path (turntable/spiral) animation renderers.

Rebuild of reference: thre3d_atom/visualizations/animations.py:23-470. All
variants share one implementation parameterized by what is rendered per frame.
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import matplotlib
import numpy as np

from voxe_tpu.utils.camera import (
    CameraIntrinsics,
    CameraPose,
    scale_camera_intrinsics,
    to8b,
)
from voxe_tpu.utils.constants import EXTRA_ACCUMULATED_WEIGHTS
from voxe_tpu.utils.logging import log


def render_camera_path_for_volumetric_model(
    vol_mod,
    camera_path: Sequence[CameraPose],
    camera_intrinsics: CameraIntrinsics,
    overridden_num_samples_per_ray: Optional[int] = None,
    render_scale_factor: Optional[float] = None,
    image_save_freq: Optional[int] = None,
    image_save_path: Optional[Path] = None,
    use_shear_warp: bool = False,
) -> np.ndarray:
    """Render RGB frames along a camera path -> [T, H, W, 3] uint8
    (reference animations.py:23-82). `use_shear_warp` renders each frame
    through the fast screen-space shear-warp path (preview-grade)."""
    if render_scale_factor is not None:
        camera_intrinsics = scale_camera_intrinsics(
            camera_intrinsics, render_scale_factor
        )

    overrides = {}
    if overridden_num_samples_per_ray is not None:
        overrides["num_samples_per_ray"] = overridden_num_samples_per_ray

    def save_frame(idx: int, frame: np.ndarray) -> None:
        if (
            image_save_freq is not None
            and image_save_path is not None
            and idx % image_save_freq == 0
        ):
            import imageio.v2 as imageio

            Path(image_save_path).mkdir(parents=True, exist_ok=True)
            imageio.imwrite(Path(image_save_path) / f"frame_{idx}.png", frame)

    if use_shear_warp:
        # one device dispatch for the whole path, uint8 frames on device
        # (per-dispatch relay latency + 32 MB/s fetch otherwise dominate)
        log.info(f"rendering all {len(camera_path)} frames in one dispatch")
        stacked = vol_mod.render_camera_path_fast(camera_intrinsics, camera_path)
        for idx in range(stacked.shape[0]):
            save_frame(idx, stacked[idx])
        return stacked

    frames: List[np.ndarray] = []
    for idx, pose in enumerate(camera_path):
        log.info(f"rendering frame {idx + 1}/{len(camera_path)}")
        out = vol_mod.render(camera_intrinsics, pose, **overrides)
        frame = to8b(np.asarray(out.colour))
        frames.append(frame)
        save_frame(idx, frame)
    return np.stack(frames)


def render_camera_path_for_volumetric_model_attn(
    vol_mod,
    camera_path: Sequence[CameraPose],
    camera_intrinsics: CameraIntrinsics,
    overridden_num_samples_per_ray: Optional[int] = None,
    render_scale_factor: Optional[float] = None,
    use_orig_densities: bool = False,
    use_shear_warp: bool = False,
) -> np.ndarray:
    """RGB | jet-colormapped attn side-by-side frames
    (reference animations.py:84-143)."""
    from matplotlib import pyplot as plt

    if render_scale_factor is not None:
        camera_intrinsics = scale_camera_intrinsics(
            camera_intrinsics, render_scale_factor
        )
    overrides = {}
    if overridden_num_samples_per_ray is not None:
        overrides["num_samples_per_ray"] = overridden_num_samples_per_ray

    if use_shear_warp:
        log.info(f"rendering all {len(camera_path)} attn frames in one dispatch")
        rgb_u8, attn_u8, _ = vol_mod.render_camera_path_fast_attn(
            camera_intrinsics, camera_path, use_orig_densities=use_orig_densities
        )
        frames = []
        for i in range(rgb_u8.shape[0]):
            attn = attn_u8[i].astype(np.float32) / 255.0
            attn_col = matplotlib.colormaps["jet"](attn)[..., :3]
            frames.append(np.concatenate([rgb_u8[i], to8b(attn_col)], axis=1))
        return np.stack(frames)

    frames = []
    for idx, pose in enumerate(camera_path):
        log.info(f"rendering attn frame {idx + 1}/{len(camera_path)}")
        out_rgb = vol_mod.render(camera_intrinsics, pose, **overrides)
        out_attn = vol_mod.render(
            camera_intrinsics,
            pose,
            attn=True,
            use_orig_densities=use_orig_densities,
            **overrides,
        )
        rgb = np.asarray(out_rgb.colour)
        attn = np.clip(np.asarray(out_attn.colour)[..., 0], 0.0, 1.0)
        attn_col = matplotlib.colormaps["jet"](attn)[..., :3]
        frames.append(np.concatenate([to8b(rgb), to8b(attn_col)], axis=1))
    return np.stack(frames)


def render_camera_path_for_volumetric_model_attn_only(
    vol_mod,
    camera_path: Sequence[CameraPose],
    camera_intrinsics: CameraIntrinsics,
    overridden_num_samples_per_ray: Optional[int] = None,
    render_scale_factor: Optional[float] = None,
    use_orig_densities: bool = False,
    use_shear_warp: bool = False,
) -> np.ndarray:
    """Attn-channel-only frames (reference animations.py:145-200)."""
    from matplotlib import pyplot as plt

    if render_scale_factor is not None:
        camera_intrinsics = scale_camera_intrinsics(
            camera_intrinsics, render_scale_factor
        )
    overrides = {}
    if overridden_num_samples_per_ray is not None:
        overrides["num_samples_per_ray"] = overridden_num_samples_per_ray

    if use_shear_warp:
        _, attn_u8, _ = vol_mod.render_camera_path_fast_attn(
            camera_intrinsics, camera_path, use_orig_densities=use_orig_densities,
            include_rgb=False,  # attn-only video: skip the RGB composite
        )
        return np.stack(
            [
                to8b(
                    matplotlib.colormaps["jet"](
                        a.astype(np.float32) / 255.0
                    )[..., :3]
                )
                for a in attn_u8
            ]
        )

    frames = []
    for idx, pose in enumerate(camera_path):
        out_attn = vol_mod.render(
            camera_intrinsics,
            pose,
            attn=True,
            use_orig_densities=use_orig_densities,
            **overrides,
        )
        attn = np.clip(np.asarray(out_attn.colour)[..., 0], 0.0, 1.0)
        frames.append(to8b(matplotlib.colormaps["jet"](attn)[..., :3]))
    return np.stack(frames)


def render_camera_path_for_volumetric_model_gt_attn_maps(
    vol_mod,
    camera_path: Sequence[CameraPose],
    camera_intrinsics: CameraIntrinsics,
    sd_model,
    prompt: str,
    token_index: int,
    key,
    timestamp: int = 200,
    overridden_num_samples_per_ray: Optional[int] = None,
    render_scale_factor: Optional[float] = None,
) -> np.ndarray:
    """RGB | live-SD-attention side-by-side frames: per pose, render the grid,
    run one noised UNet pass with attention capture, and colormap the chosen
    token's map (reference animations.py:203-304)."""
    import jax
    from matplotlib import pyplot as plt

    from voxe_tpu.models.sd.cross_attn import normalize_attn_map

    if render_scale_factor is not None:
        camera_intrinsics = scale_camera_intrinsics(
            camera_intrinsics, render_scale_factor
        )
    overrides = {}
    if overridden_num_samples_per_ray is not None:
        overrides["num_samples_per_ray"] = overridden_num_samples_per_ray

    frames = []
    for idx, pose in enumerate(camera_path):
        log.info(f"rendering gt-attn frame {idx + 1}/{len(camera_path)}")
        out = vol_mod.render(camera_intrinsics, pose, **overrides)
        rgb = np.asarray(out.colour)
        key, sub = jax.random.split(key)
        maps, _ = sd_model.get_attn_map(
            prompt, out.colour[None], sub, timestamp=timestamp,
            indices_to_fetch=[token_index],
        )
        attn = np.asarray(normalize_attn_map(maps[0]))
        attn_col = matplotlib.colormaps["jet"](attn)[..., :3]
        frames.append(np.concatenate([to8b(rgb), to8b(attn_col)], axis=1))
    return np.stack(frames)


def render_camera_path_for_volumetric_model_attn_blend(
    vol_mod,
    camera_path: Sequence[CameraPose],
    camera_intrinsics: CameraIntrinsics,
    overridden_num_samples_per_ray: Optional[int] = None,
    render_scale_factor: Optional[float] = None,
    blend_alpha: float = 0.45,
    use_orig_densities: bool = False,
    use_shear_warp: bool = False,
) -> np.ndarray:
    """Attn jet map alpha-blended over the RGB render
    (reference animations.py:308-402)."""
    from matplotlib import pyplot as plt

    if render_scale_factor is not None:
        camera_intrinsics = scale_camera_intrinsics(
            camera_intrinsics, render_scale_factor
        )
    overrides = {}
    if overridden_num_samples_per_ray is not None:
        overrides["num_samples_per_ray"] = overridden_num_samples_per_ray

    if use_shear_warp:
        log.info(f"rendering all {len(camera_path)} blend frames in one dispatch")
        rgb_u8, attn_u8, acc_u8 = vol_mod.render_camera_path_fast_attn(
            camera_intrinsics, camera_path, use_orig_densities=use_orig_densities
        )
        frames = []
        for i in range(rgb_u8.shape[0]):
            rgb = rgb_u8[i].astype(np.float32) / 255.0
            attn = attn_u8[i].astype(np.float32) / 255.0
            acc = (acc_u8[i].astype(np.float32) / 255.0)[..., None]
            attn_col = matplotlib.colormaps["jet"](attn)[..., :3]
            blend = (1.0 - blend_alpha) * rgb + blend_alpha * attn_col * acc
            frames.append(to8b(blend))
        return np.stack(frames)

    frames = []
    for idx, pose in enumerate(camera_path):
        out_rgb = vol_mod.render(camera_intrinsics, pose, **overrides)
        out_attn = vol_mod.render(
            camera_intrinsics,
            pose,
            attn=True,
            use_orig_densities=use_orig_densities,
            **overrides,
        )
        rgb = np.asarray(out_rgb.colour)
        acc = np.asarray(out_attn.extra[EXTRA_ACCUMULATED_WEIGHTS])
        attn = np.clip(np.asarray(out_attn.colour)[..., 0], 0.0, 1.0)
        attn_col = matplotlib.colormaps["jet"](attn)[..., :3]
        blend = (1.0 - blend_alpha) * rgb + blend_alpha * attn_col * acc
        frames.append(to8b(blend))
    return np.stack(frames)
