"""LPIPS-VGG perceptual distance (weight-gated).

The reference uses the `lpips` pip package for held-out evaluation
(reference: thre3d_atom/modules/testers.py:17-71, trainers.py:132). This
rebuild implements the LPIPS computation directly on torch-CPU: VGG16 feature
stacks + per-layer learned linear heads, both loaded from a local weights
directory (no downloads):

    <weights_dir>/vgg16.pth        torchvision VGG16 state dict
    <weights_dir>/lpips_vgg.pth    lpips 'vgg' linear-head state dict
                                   (keys lin0..lin4 .model.1.weight)

Without weights the tester falls back to SSIM (see train/testers.py).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

_VGG_SLICES = ((0, 4), (4, 9), (9, 16), (16, 23), (23, 30))
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    def __init__(self, weights_dir: Path):
        import torch
        import torchvision

        weights_dir = Path(weights_dir)
        self.torch = torch
        vgg = torchvision.models.vgg16(weights=None)
        vgg.load_state_dict(
            torch.load(weights_dir / "vgg16.pth", map_location="cpu", weights_only=True)
        )
        self.features = vgg.features.eval()

        lin_state = torch.load(
            weights_dir / "lpips_vgg.pth", map_location="cpu", weights_only=True
        )
        # lpips stores 1x1 conv heads as lin{i}.model.1.weight [1, C, 1, 1]
        self.lins = []
        for i in range(len(_VGG_SLICES)):
            for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
                if key in lin_state:
                    self.lins.append(lin_state[key].float())
                    break
            else:
                raise KeyError(f"lin{i} head not found in lpips_vgg.pth")

    def _feature_stack(self, x):
        feats = []
        h = x
        for start, end in _VGG_SLICES:
            for layer in list(self.features)[start:end]:
                h = layer(h)
            feats.append(h)
        return feats

    def __call__(self, img0: np.ndarray, img1: np.ndarray) -> float:
        """LPIPS distance between two [H, W, 3] images in [0, 1]."""
        torch = self.torch

        def prep(img):
            t = torch.from_numpy(np.asarray(img, np.float32)).permute(2, 0, 1)[None]
            t = t * 2.0 - 1.0  # lpips input range
            shift = torch.from_numpy(_SHIFT).view(1, 3, 1, 1)
            scale = torch.from_numpy(_SCALE).view(1, 3, 1, 1)
            return (t - shift) / scale

        with torch.no_grad():
            f0 = self._feature_stack(prep(img0))
            f1 = self._feature_stack(prep(img1))
            total = 0.0
            for a, b, lin in zip(f0, f1, self.lins):
                an = a / (a.norm(dim=1, keepdim=True) + 1e-10)
                bn = b / (b.norm(dim=1, keepdim=True) + 1e-10)
                diff = (an - bn) ** 2
                weighted = torch.nn.functional.conv2d(diff, lin)
                total += weighted.mean(dim=(2, 3)).item()
        return float(total)


def try_load_lpips(weights_dir) -> "LPIPS | None":
    if weights_dir is None:
        return None
    try:
        return LPIPS(Path(weights_dir))
    except Exception as e:  # pragma: no cover
        from voxe_tpu.utils.logging import log

        log.info(f"LPIPS unavailable ({e}); falling back to SSIM")
        return None
