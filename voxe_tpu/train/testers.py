"""Held-out evaluation: per-image PSNR (+SSIM) over a test dataset.

Rebuild of reference: thre3d_atom/modules/testers.py:17-71. The reference also
reports LPIPS-VGG; perceptual LPIPS requires pretrained VGG weights — wired in
voxe_tpu.models.lpips when weights are available, SSIM otherwise.
"""
from __future__ import annotations

import numpy as np

from voxe_tpu.data.dataset import PosedImagesDataset
from voxe_tpu.utils.camera import CameraPose
from voxe_tpu.utils.logging import log
from voxe_tpu.utils.metrics import psnr, ssim


def test_sh_vox_grid_vol_mod_with_posed_images(
    vol_mod,
    test_dataset: PosedImagesDataset,
    tensorboard_writer=None,
    global_step: int = 0,
) -> dict:
    intrinsics = test_dataset.camera_intrinsics
    psnrs, ssims = [], []
    log.info(f"computing test metrics on {len(test_dataset)} heldout images")
    for i in range(len(test_dataset)):
        image, pose_arr = test_dataset.images[i], test_dataset.poses[i]
        pose = CameraPose(rotation=pose_arr[:, :3], translation=pose_arr[:, 3:])
        out = vol_mod.render(intrinsics, pose)
        pred = np.asarray(out.colour)
        psnrs.append(float(psnr(pred, image)))
        ssims.append(float(ssim(pred, image)))

    mean_psnr, mean_ssim = float(np.mean(psnrs)), float(np.mean(ssims))
    log.info(f"test metrics: psnr={mean_psnr:.3f} ssim={mean_ssim:.4f}")
    if tensorboard_writer is not None:
        tensorboard_writer.add_scalar("test_psnr", mean_psnr, global_step=global_step)
        tensorboard_writer.add_scalar("test_ssim", mean_ssim, global_step=global_step)
    return {"psnr": mean_psnr, "ssim": mean_ssim}
