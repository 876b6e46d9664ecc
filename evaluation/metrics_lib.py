"""Quality-metric library: CLIP similarities, FID, PSNR over image folders.

Rebuild of reference: evaluation/calculate_metrics.py:150-247. The embedders
(CLIP ViT-B/32, InceptionV3 for FID) require pretrained weights; in this
zero-download framework they load from a local model directory when given
(`--clip_model_dir` / `--inception_model_dir`, any transformers/torchvision-
compatible snapshot). Without weights, CLIP/FID columns are reported as NaN
and PSNR (pure math) is always computed. The Frechet distance itself is
implemented here (numpy) rather than depending on pytorch_fid.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

from voxe_tpu.utils.logging import log


# ----------------------------------------------------------------------------------
# image IO
# ----------------------------------------------------------------------------------


def get_images(im_dir: Path) -> List[Image.Image]:
    ims = []
    for name in sorted(os.listdir(im_dir)):
        if name.endswith(".png"):
            ims.append(Image.open(Path(im_dir) / name).convert("RGB"))
    return ims


def remove_word_from_filenames(folder_path, word_to_remove):
    """(reference calculate_metrics.py:224-241)"""
    for root, _dirs, files in os.walk(folder_path):
        for filename in files:
            if word_to_remove in filename:
                new_name = os.path.join(root, filename).replace(word_to_remove, "")
                os.rename(os.path.join(root, filename), new_name)


# ----------------------------------------------------------------------------------
# PSNR (always available)
# ----------------------------------------------------------------------------------


def get_psnrs(out_imgs: Sequence[Image.Image], ref_imgs: Sequence[Image.Image]) -> float:
    """Mean PSNR over paired images at 400x400 (reference :150-162)."""
    total = 0.0
    for out_img, ref_img in zip(out_imgs, ref_imgs):
        a = np.asarray(out_img.resize((400, 400), Image.BILINEAR), np.float32) / 255.0
        b = np.asarray(ref_img.resize((400, 400), Image.BILINEAR), np.float32) / 255.0
        mse = np.mean((a - b) ** 2)
        total += -10.0 * np.log10(mse + 1e-12)
    return total / max(len(out_imgs), 1)


# ----------------------------------------------------------------------------------
# CLIP similarities (weight-gated)
# ----------------------------------------------------------------------------------


class ClipScorer:
    """CLIP embedder backed by a local transformers snapshot (torch CPU)."""

    def __init__(self, model_dir: Path):
        from transformers import CLIPModel, CLIPProcessor

        self.model = CLIPModel.from_pretrained(str(model_dir))
        self.processor = CLIPProcessor.from_pretrained(str(model_dir))
        self.model.eval()

    def image_features(self, imgs: Sequence[Image.Image]) -> np.ndarray:
        import torch

        with torch.no_grad():
            inputs = self.processor(images=list(imgs), return_tensors="pt")
            feats = self.model.get_image_features(**inputs)
        return feats.numpy()

    def text_features(self, prompt: str) -> np.ndarray:
        import torch

        with torch.no_grad():
            inputs = self.processor(
                text=[prompt], return_tensors="pt", padding=True, truncation=True
            )
            feats = self.model.get_text_features(**inputs)
        return feats.numpy()


def _normed(x: np.ndarray) -> np.ndarray:
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


def avg_clip_text_sim(img_features: np.ndarray, text_features: np.ndarray) -> float:
    """Mean cos-sim between each image feature and the prompt feature
    (reference :183-190)."""
    sims = _normed(img_features) @ _normed(text_features).T
    return float(sims.mean())


def avg_clip_directional_sim(
    ref_text_features: np.ndarray,
    ref_img_features: np.ndarray,
    out_text_features: np.ndarray,
    out_img_features: np.ndarray,
) -> float:
    """Directional CLIP similarity: (delta text) . (delta image)
    (reference :164-181)."""
    text_dir = _normed(ref_text_features) - _normed(out_text_features)
    total = 0.0
    for out_f, ref_f in zip(out_img_features, ref_img_features):
        im_dir = _normed(ref_f[None]) - _normed(out_f[None])
        total += float((text_dir @ im_dir.T).item())
    return total / len(out_img_features)


# ----------------------------------------------------------------------------------
# FID (Frechet distance implemented here; embedder weight-gated)
# ----------------------------------------------------------------------------------


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between two gaussians (standard FID formula)."""
    from scipy import linalg

    diff = mu1 - mu2
    try:
        covmean = linalg.sqrtm(sigma1 @ sigma2)
    except linalg.LinAlgError:  # singular product: retry with jitter below
        covmean = np.full_like(sigma1, np.nan)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


class InceptionEmbedder:
    """Pool3 features from a local torchvision-layout InceptionV3 state dict.

    torchvision itself is not a dependency: the architecture is in-tree
    (evaluation/inception.py, attribute-compatible with torchvision's
    ``Inception3``), so any ``inception_v3.pth`` a user stages — including the
    real ImageNet weights the reference's pytorch_fid path uses — loads with
    strict key matching."""

    def __init__(self, model_dir: Path):
        import torch

        from evaluation.inception import load_inception_v3

        self.torch = torch
        state = torch.load(
            Path(model_dir) / "inception_v3.pth", map_location="cpu",
            weights_only=True,
        )
        self.model = load_inception_v3(state)

    def features(self, imgs: Sequence[Image.Image]) -> np.ndarray:
        import torch

        feats = []
        with torch.no_grad():
            for img in imgs:
                arr = np.asarray(img.resize((299, 299), Image.BILINEAR), np.float32)
                arr = (arr / 255.0 - 0.5) / 0.5
                t = torch.from_numpy(arr).permute(2, 0, 1)[None]
                feats.append(self.model.pool3_features(t).numpy()[0])
        return np.stack(feats)


def fid_between_folders(
    path_a: Path, path_b: Path, embedder: Optional[InceptionEmbedder]
) -> float:
    if embedder is None:
        return float("nan")
    feats_a = embedder.features(get_images(path_a))
    feats_b = embedder.features(get_images(path_b))
    mu_a, sigma_a = feats_a.mean(0), np.cov(feats_a, rowvar=False)
    mu_b, sigma_b = feats_b.mean(0), np.cov(feats_b, rowvar=False)
    return frechet_distance(mu_a, sigma_a, mu_b, sigma_b)


def load_prompt(prompt_dir: Path) -> str:
    return (Path(prompt_dir) / "prompt.txt").read_text().splitlines()[0]
