"""LPIPS numeric cross-validation on synthesized weights (VERDICT r3 next-7).

The LPIPS implementation (voxe_tpu/models/lpips.py) is weight-gated and could
previously only be exercised with real VGG weights (absent — zero egress).
These tests synthesize a random torchvision-layout vgg16.pth + lpips heads and
drive the FULL numeric path, cross-checked against an INDEPENDENT torch
functional composition built directly from the same tensors — so with real
weights the only untested step is the file copy. Reference protocol:
thre3d_atom/modules/testers.py:17-71 (LPIPS-VGG on every held-out eval).
"""
from pathlib import Path

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from voxe_tpu.models.lpips import (
    _SCALE,
    _SHIFT,
    _VGG_SLICES,
    LPIPS,
    build_vgg16_features,
    try_load_lpips,
)


def _synthesize_weights(d: Path, features_only: bool = False) -> Path:
    """Random vgg16.pth (torchvision layout) + lpips_vgg.pth heads."""
    d.mkdir(parents=True, exist_ok=True)
    torch.manual_seed(0)
    feats = build_vgg16_features()
    # scale conv weights down so 13 stacked random convs stay numerically sane
    with torch.no_grad():
        for m in feats:
            if hasattr(m, "weight"):
                m.weight.mul_(0.3)
    if features_only:
        torch.save(feats.state_dict(), d / "vgg16.pth")
    else:  # full torchvision dict: features.* + classifier.* (ignored)
        state = {f"features.{k}": v for k, v in feats.state_dict().items()}
        state["classifier.0.weight"] = torch.zeros(8, 8)
        state["classifier.0.bias"] = torch.zeros(8)
        torch.save(state, d / "vgg16.pth")
    # lpips 'vgg' head layout: lin{i}.model.1.weight [1, C, 1, 1], positive
    chans = (64, 128, 256, 512, 512)
    heads = {
        f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1) * 0.1
        for i, c in enumerate(chans)
    }
    torch.save(heads, d / "lpips_vgg.pth")
    return d


def _independent_lpips(vgg_path: Path, heads_path: Path, img0, img1) -> float:
    """Hand-built functional LPIPS from the raw tensors: F.conv2d/relu/pool
    composition with the published torchvision-vgg16 structure — shares NO
    code with voxe_tpu.models.lpips."""
    state = torch.load(vgg_path, map_location="cpu", weights_only=True)
    if any(k.startswith("features.") for k in state):
        state = {k[len("features."):]: v for k, v in state.items()
                 if k.startswith("features.")}
    heads = torch.load(heads_path, map_location="cpu", weights_only=True)
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    pool_after = {3, 8, 15, 22, 29}  # layer indices of maxpools - 1
    tap_after = {3: 0, 8: 1, 15: 2, 22: 3, 29: 4}

    def stack(img):
        t = torch.from_numpy(np.asarray(img, np.float32)).permute(2, 0, 1)[None]
        t = (t * 2.0 - 1.0 - torch.from_numpy(_SHIFT).view(1, 3, 1, 1)) / (
            torch.from_numpy(_SCALE).view(1, 3, 1, 1)
        )
        feats = {}
        h = t
        for i in conv_idx:
            h = F.relu(F.conv2d(h, state[f"{i}.weight"], state[f"{i}.bias"],
                                padding=1))
            after = i + 1  # the relu index
            if after in tap_after:
                feats[tap_after[after]] = h
            if after in pool_after:
                h = F.max_pool2d(h, 2, 2)
        # relu5_3 (index 29) taps BEFORE the final pool; handled above
        return [feats[j] for j in range(5)]

    with torch.no_grad():
        f0, f1 = stack(img0), stack(img1)
        total = 0.0
        for j, (a, b) in enumerate(zip(f0, f1)):
            an = a / (a.norm(dim=1, keepdim=True) + 1e-10)
            bn = b / (b.norm(dim=1, keepdim=True) + 1e-10)
            w = heads[f"lin{j}.model.1.weight"].float()
            total += F.conv2d((an - bn) ** 2, w).mean(dim=(2, 3)).item()
    return float(total)


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    return _synthesize_weights(tmp_path_factory.mktemp("lpips_w"))


def test_vgg16_feature_indices_match_torchvision_contract():
    """Layer index layout (conv/relu pairs, pools at 4/9/16/23/30) and the
    LPIPS tap slices cover exactly the published torchvision vgg16 features."""
    feats = build_vgg16_features()
    assert len(feats) == 31
    from torch import nn

    for i in (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28):
        assert isinstance(feats[i], nn.Conv2d), i
    for i in (4, 9, 16, 23, 30):
        assert isinstance(feats[i], nn.MaxPool2d), i
    assert _VGG_SLICES[-1][1] == 30  # relu5_3, before the last pool
    # state-dict keys are the torchvision names (features-only form)
    assert "0.weight" in feats.state_dict() and "28.bias" in feats.state_dict()


@pytest.mark.parametrize("features_only", [False, True],
                         ids=["full-torchvision-dict", "features-only-dict"])
def test_lpips_matches_independent_torch_composition(tmp_path, features_only):
    d = _synthesize_weights(tmp_path / "w", features_only=features_only)
    lp = LPIPS(d)
    rng = np.random.default_rng(0)
    img0 = rng.random((64, 64, 3), dtype=np.float32)
    img1 = np.clip(img0 + 0.3 * rng.random((64, 64, 3), dtype=np.float32), 0, 1)
    ours = lp(img0, img1)
    ref = _independent_lpips(d / "vgg16.pth", d / "lpips_vgg.pth", img0, img1)
    assert ours == pytest.approx(ref, rel=1e-5, abs=1e-7)
    assert ours > 0.0


def test_lpips_metric_properties(weights_dir):
    lp = LPIPS(weights_dir)
    rng = np.random.default_rng(1)
    x = rng.random((64, 64, 3), dtype=np.float32)
    y = rng.random((64, 64, 3), dtype=np.float32)
    assert lp(x, x) == pytest.approx(0.0, abs=1e-9)
    assert lp(x, y) > 0.0
    assert lp(x, y) == pytest.approx(lp(y, x), rel=1e-6)


def test_tester_logs_lpips_when_fixture_dir_present(weights_dir, monkeypatch):
    """The held-out tester activates LPIPS from $VOXE_LPIPS_WEIGHTS_DIR (the
    deterministic local-weights recipe) — reference testers.py computes
    LPIPS-VGG unconditionally; here it switches on when weights are staged."""
    import jax.numpy as jnp

    from voxe_tpu.data.dataset import PosedImagesDataset
    from voxe_tpu.data.synthetic import generate_synthetic_scene
    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.train.testers import test_sh_vox_grid_vol_mod_with_posed_images

    scene = generate_synthetic_scene(
        Path(str(weights_dir)) / "scene", num_train=2, num_test=1,
        image_size=32, focal=32.0, grid_res=8,
    )
    dataset = PosedImagesDataset(
        scene / "images", scene / "test_camera_params.json", rgba_white_bkgd=True
    )
    res = 8
    grid = VoxelGrid(
        jnp.zeros((res, res, res, 1)), jnp.zeros((res, res, res, 3)),
        VoxelGridConfig(
            voxel_size=VoxelSize(*[3.0 / res] * 3),
            density_preactivation="identity",
            density_postactivation="softplus",
        ),
    )
    model = VolumetricModel(
        grid,
        SHVoxGridRenderConfig(
            num_samples_per_ray=16, camera_bounds=dataset.camera_bounds,
            white_bkgd=True, render_num_samples_per_ray=16,
            parallel_rays_chunk_size=1024,
        ),
    )
    monkeypatch.setenv("VOXE_LPIPS_WEIGHTS_DIR", str(weights_dir))
    metrics = test_sh_vox_grid_vol_mod_with_posed_images(model, dataset)
    assert "lpips" in metrics and np.isfinite(metrics["lpips"])
    monkeypatch.delenv("VOXE_LPIPS_WEIGHTS_DIR")
    metrics2 = test_sh_vox_grid_vol_mod_with_posed_images(model, dataset)
    assert "lpips" not in metrics2 and "ssim" in metrics2


def test_try_load_lpips_gates_gracefully(tmp_path):
    assert try_load_lpips(None) is None
    assert try_load_lpips(tmp_path / "missing") is None  # no files -> SSIM path
