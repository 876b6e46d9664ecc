"""LPIPS-VGG perceptual distance (weight-gated, torch-CPU, no torchvision).

The reference uses the `lpips` pip package for held-out evaluation
(reference: thre3d_atom/modules/testers.py:17-71, trainers.py:132). This
rebuild implements the LPIPS computation directly on torch-CPU: the VGG16
feature stack is built in-tree (torchvision is not part of this image), with
layer indices exactly matching torchvision's ``vgg16().features`` so ANY
torchvision-layout VGG16 state dict a user stages loads directly; the
per-layer learned linear heads load from the lpips package's checkpoint
format. Deterministic local-weights recipe:

    <weights_dir>/vgg16.pth        torchvision VGG16 state dict — either the
                                   full model dict (``features.*`` keys;
                                   ``classifier.*`` is ignored) or a
                                   features-only dict (``0.weight``, ...)
    <weights_dir>/lpips_vgg.pth    lpips 'vgg' linear-head state dict
                                   (keys lin0..lin4 .model.1.weight)

Without weights the tester falls back to SSIM (see train/testers.py). The
full numeric path is cross-validated against an independent torch composition
on synthesized random weights in tests/test_lpips.py, so with real weights
the only untested step is the file copy (VERDICT r3 next-7).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

# torchvision vgg16 feature indices: conv/ReLU pairs with maxpools at
# 4/9/16/23/30; LPIPS taps the stack after relu1_2/2_2/3_3/4_3/5_3
_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M")
_VGG_SLICES = ((0, 4), (4, 9), (9, 16), (16, 23), (23, 30))
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def build_vgg16_features():
    """torch Sequential identical (indices and shapes) to torchvision's
    ``vgg16().features`` — the compatibility contract for staged weights."""
    from torch import nn

    layers = []
    in_ch = 3
    for v in _VGG16_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(in_ch, v, kernel_size=3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            in_ch = v
    return nn.Sequential(*layers)


def _features_state(state: dict) -> dict:
    """Accept a full torchvision vgg16 state dict or a features-only dict."""
    if any(k.startswith("features.") for k in state):
        return {
            k[len("features."):]: v
            for k, v in state.items()
            if k.startswith("features.")
        }
    return state


class LPIPS:
    def __init__(self, weights_dir: Path):
        import torch

        weights_dir = Path(weights_dir)
        self.torch = torch
        features = build_vgg16_features()
        state = torch.load(
            weights_dir / "vgg16.pth", map_location="cpu", weights_only=True
        )
        features.load_state_dict(_features_state(state), strict=True)
        self.features = features.eval()

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
            # real copy: jax/np views arriving here can be non-writable
            # buffers (ascontiguousarray skips the copy when already
            # contiguous, keeping the non-writable flag torch rejects)
            arr = np.array(img, np.float32, copy=True)
            t = torch.from_numpy(arr).permute(2, 0, 1)[None]
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
