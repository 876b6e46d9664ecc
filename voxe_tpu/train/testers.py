"""Held-out evaluation: per-image PSNR (+SSIM) over a test dataset.

Rebuild of reference: thre3d_atom/modules/testers.py:17-71. The reference also
reports LPIPS-VGG; perceptual LPIPS requires pretrained VGG weights — wired in
voxe_tpu.models.lpips when weights are available, SSIM otherwise.
"""
from __future__ import annotations

import os

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
    lpips_weights_dir=None,
) -> dict:
    intrinsics = test_dataset.camera_intrinsics
    lpips_fn = None
    if lpips_weights_dir is None:
        # deterministic local-weights recipe: staging vgg16.pth +
        # lpips_vgg.pth under $VOXE_LPIPS_WEIGHTS_DIR switches every held-out
        # eval (all trainers, the demo pipeline) to the reference's
        # always-on LPIPS protocol (testers.py:17-71) without new flags
        lpips_weights_dir = os.environ.get("VOXE_LPIPS_WEIGHTS_DIR") or None
    if lpips_weights_dir is not None:
        from voxe_tpu.models.lpips import try_load_lpips

        lpips_fn = try_load_lpips(lpips_weights_dir)

    psnrs, ssims, lpipss = [], [], []
    log.info(f"computing test metrics on {len(test_dataset)} heldout images")
    for i in range(len(test_dataset)):
        image, pose_arr = test_dataset.images[i], test_dataset.poses[i]
        pose = CameraPose(rotation=pose_arr[:, :3], translation=pose_arr[:, 3:])
        out = vol_mod.render(intrinsics, pose)
        pred = np.asarray(out.colour)
        psnrs.append(float(psnr(pred, image)))
        ssims.append(float(ssim(pred, image)))
        if lpips_fn is not None:
            lpipss.append(lpips_fn(pred, image))

    mean_psnr, mean_ssim = float(np.mean(psnrs)), float(np.mean(ssims))
    metrics = {"psnr": mean_psnr, "ssim": mean_ssim}
    msg = f"test metrics: psnr={mean_psnr:.3f} ssim={mean_ssim:.4f}"
    if lpipss:
        metrics["lpips"] = float(np.mean(lpipss))
        msg += f" lpips={metrics['lpips']:.4f}"
    log.info(msg)
    if tensorboard_writer is not None:
        for name, value in metrics.items():
            tensorboard_writer.add_scalar(
                f"test_{name}", value, global_step=global_step
            )
    return metrics
