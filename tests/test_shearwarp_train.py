"""Shear-warp TRAINING paths: recon quality, SDS step, mesh sharding, HLO.

The shear-warp renderer (voxe_tpu/render/shearwarp.py) replaces the exact
renderer's per-sample gather/scatter — which runs at ~12M updates/s on TPU
and dominates the train step (BENCHMARKS.md "measurement truth") — with
banded interpolation matmuls. These tests prove the TRAINING integrations:
reconstruction supervised on pre-warped base-plane targets reaches held-out
screen-space PSNR parity, the SDS edit step runs end-to-end with finite
grads, and the whole recon train direction compiles with zero gather/scatter
HLO ops.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from voxe_tpu.data.synthetic import make_demo_grid
from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
from voxe_tpu.models.volumetric import VolumetricModel
from voxe_tpu.render.interface import SHVoxGridRenderConfig
from voxe_tpu.render.shearwarp import compute_base_geometry, render_shear_warp
from voxe_tpu.train.recon import (
    make_recon_train_step_shearwarp,
    warp_dataset_to_base,
)
from voxe_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical

BASE_HW = (64, 64)
RES = 32


@pytest.fixture(scope="module")
def rcfg():
    return SHVoxGridRenderConfig(
        num_samples_per_ray=96,
        camera_bounds=CameraBounds(0.5, 10.0),
        white_bkgd=True,
        perturb_sampled_points=False,
    )


@pytest.fixture(scope="module")
def scene(rcfg):
    """10 posed renders of the demo grid + a held-out pose (in-memory)."""
    intr = CameraIntrinsics(48, 48, 48.0)
    model = VolumetricModel(make_demo_grid(res=RES), rcfg)
    rng = np.random.default_rng(0)
    poses_list, images = [], []
    for _ in range(10):
        pose = pose_spherical(
            float(rng.random() * 360.0), 15.0 + float(rng.random() * 70.0), 4.031
        )
        out = model.render(intr, pose)
        images.append(np.asarray(out.colour).reshape(48, 48, 3))
        poses_list.append(
            np.concatenate(
                [np.asarray(pose.rotation), np.asarray(pose.translation).reshape(3, 1)],
                axis=1,
            )
        )
    return {
        "intr": intr,
        "gt_model": model,
        "images": jnp.asarray(np.stack(images)),
        "poses": jnp.asarray(np.stack(poses_list)),
        "test_pose": pose_spherical(77.0, 33.0, 4.031),
    }


def _fresh_grid(key):
    k1, k2 = jax.random.split(key)
    cfg = VoxelGridConfig(
        voxel_size=VoxelSize(*[3.0 / RES] * 3),
        density_preactivation="identity",
        density_postactivation="softplus",
        expected_density_scale=1.0,
    )
    return VoxelGrid(
        densities=jax.random.uniform(k1, (RES, RES, RES, 1), minval=-1.0, maxval=1.0),
        features=jax.random.uniform(k2, (RES, RES, RES, 3), minval=-1.0, maxval=1.0),
        config=cfg,
    )


def test_host_geometry_matches_traced_path(rcfg):
    grid = make_demo_grid(res=RES)
    for yaw, pitch in [(40.0, 30.0), (130.0, 20.0), (220.0, 45.0), (310.0, -40.0)]:
        pose = pose_spherical(yaw, pitch, 4.0)
        _, geom = render_shear_warp(grid, pose, rcfg, base_hw=(48, 48))
        hg = compute_base_geometry(grid, pose)
        assert int(hg.perm_index) == int(geom.perm_index)
        np.testing.assert_allclose(np.asarray(hg.lo), np.asarray(geom.lo), atol=1e-4)
        np.testing.assert_allclose(np.asarray(hg.hi), np.asarray(geom.hi), atol=1e-4)


def test_recon_shearwarp_reaches_screen_space_parity(rcfg, scene):
    """Train on base-plane targets only; eval held-out with the EXACT
    screen-space renderer — the quality gate for the fast path."""
    key = jax.random.PRNGKey(0)
    grid = _fresh_grid(key)
    targets, masks = warp_dataset_to_base(
        scene["images"], scene["poses"], scene["intr"], grid, BASE_HW
    )
    assert float(masks.mean()) > 0.5  # screen images cover most of the window

    opt = optax.adam(0.03)
    opt_state = opt.init(grid)
    step = make_recon_train_step_shearwarp(rcfg, opt, BASE_HW)
    rng = np.random.default_rng(1)
    for _ in range(300):
        key, sk = jax.random.split(key)
        idx = jnp.asarray(int(rng.integers(0, 10)))
        grid, opt_state, metrics = step(
            grid, opt_state, targets, masks, scene["poses"], idx, sk
        )
    assert np.isfinite(float(metrics["total_loss"]))

    gt = scene["gt_model"].render(scene["intr"], scene["test_pose"]).colour
    pred = VolumetricModel(grid, rcfg).render(scene["intr"], scene["test_pose"]).colour
    psnr = -10.0 * np.log10(float(jnp.mean((gt - pred) ** 2)) + 1e-12)
    assert psnr > 25.0, f"held-out screen-space PSNR too low: {psnr:.2f} dB"


def test_recon_shearwarp_hlo_has_no_gather_scatter(rcfg, scene):
    """The point of the design: the full train direction (fwd + bwd + Adam)
    contains zero gather/scatter HLO ops. (The exact path's backward is 8
    scatter-adds at ~0.5-2.5 s each on TPU.)"""
    grid = _fresh_grid(jax.random.PRNGKey(0))
    opt = optax.adam(0.03)
    opt_state = opt.init(grid)
    step = make_recon_train_step_shearwarp(rcfg, opt, (32, 32))
    targets = jnp.zeros((2, 32, 32, 3))
    masks = jnp.ones((2, 32, 32))
    lowered = step.lower(
        grid, opt_state, targets, masks, scene["poses"][:2],
        jnp.asarray(0), jax.random.PRNGKey(1),
    )
    hlo = lowered.compile().as_text()
    ops = re.findall(r"= \S+ (scatter|gather)[.\d]*\(", hlo)
    # dynamic-slice (pose/target selection) is fine; gather/scatter is not
    assert not ops, f"gather/scatter leaked into the shear-warp train step: {ops}"


def test_recon_shearwarp_sharded_matches_unsharded(rcfg, scene):
    """8-way mesh DP over base rows reproduces single-device numerics."""
    from voxe_tpu.parallel.mesh import make_mesh

    grid = _fresh_grid(jax.random.PRNGKey(0))
    targets, masks = warp_dataset_to_base(
        scene["images"][:4], scene["poses"][:4], scene["intr"], grid, BASE_HW
    )
    opt = optax.adam(0.03)
    opt_state = opt.init(grid)
    args = (targets, masks, scene["poses"][:4], jnp.asarray(1), jax.random.PRNGKey(7))

    g1, _, m1 = make_recon_train_step_shearwarp(rcfg, opt, BASE_HW)(
        grid, opt_state, *args
    )
    g8, _, m8 = make_recon_train_step_shearwarp(
        rcfg, opt, BASE_HW, mesh=make_mesh(8)
    )(grid, opt_state, *args)
    np.testing.assert_allclose(
        np.asarray(g1.densities), np.asarray(g8.densities), atol=2e-5
    )
    assert abs(float(m1["total_loss"]) - float(m8["total_loss"])) < 1e-4


def test_trainer_end_to_end_shearwarp(tmp_path):
    """The production recon trainer with use_shear_warp=True: multi-stage
    coarse-to-fine, per-stage target warping, held-out PSNR via the exact
    renderer."""
    from voxe_tpu.data.dataset import PosedImagesDataset
    from voxe_tpu.data.synthetic import generate_synthetic_scene
    from voxe_tpu.train.recon import train_sh_vox_grid_vol_mod_with_posed_images
    from voxe_tpu.train.testers import test_sh_vox_grid_vol_mod_with_posed_images
    from voxe_tpu.utils.misc import (
        compute_expected_density_scale_for_relu_field_grid,
    )

    scene_dir = generate_synthetic_scene(
        tmp_path / "scene", num_train=8, num_test=2, image_size=48,
        focal=48.0, grid_res=32,
    )
    dataset = PosedImagesDataset(
        images_dir=scene_dir / "images",
        camera_params_json=scene_dir / "train_camera_params.json",
    )
    res, world = 32, 3.0
    cfg = VoxelGridConfig(
        voxel_size=VoxelSize(*([world / res] * 3)),
        density_preactivation="identity",
        density_postactivation="softplus",
        expected_density_scale=compute_expected_density_scale_for_relu_field_grid(
            (world,) * 3
        ),
    )
    grid = VoxelGrid(jnp.zeros((res, res, res, 1)), jnp.zeros((res, res, res, 3)), cfg)
    rcfg2 = SHVoxGridRenderConfig(
        num_samples_per_ray=64,
        camera_bounds=dataset.camera_bounds,
        white_bkgd=True,
        render_num_samples_per_ray=128,
        parallel_rays_chunk_size=16384,
    )
    model = VolumetricModel(grid, rcfg2)
    model = train_sh_vox_grid_vol_mod_with_posed_images(
        model,
        dataset,
        tmp_path / "out",
        image_batch_cache_size=4,
        ray_batch_size=4096,
        num_stages=2,
        num_iterations_per_stage=120,
        learning_rate=0.03,
        lr_decay_steps_per_stage=80,
        save_freq=10_000,
        test_freq=10_000,
        feedback_freq=10_000,
        summary_freq=10_000,
        fast_debug_mode=True,
        use_shear_warp=True,
    )
    metrics = test_sh_vox_grid_vol_mod_with_posed_images(model, dataset)
    assert metrics["psnr"] > 25.0, metrics


def test_non_square_images_and_base(rcfg):
    """H != W screen images warp and train through the shear-warp recon step,
    and orient_base_image handles non-square frames (flips only — the
    90-degree residual cannot be fixed shape-preservingly)."""
    from voxe_tpu.render.shearwarp import orient_base_image

    intr = CameraIntrinsics(40, 56, 48.0)
    model = VolumetricModel(make_demo_grid(res=RES), rcfg)
    rng = np.random.default_rng(3)
    poses_list, images = [], []
    for _ in range(4):
        pose = pose_spherical(
            float(rng.random() * 360.0), 15.0 + float(rng.random() * 70.0), 4.031
        )
        out = model.render(intr, pose)
        images.append(np.asarray(out.colour).reshape(40, 56, 3))
        poses_list.append(
            np.concatenate(
                [np.asarray(pose.rotation), np.asarray(pose.translation).reshape(3, 1)],
                axis=1,
            )
        )
    images = jnp.asarray(np.stack(images))
    poses = jnp.asarray(np.stack(poses_list))

    key = jax.random.PRNGKey(4)
    grid = _fresh_grid(key)
    base_hw = (48, 64)  # non-square base lattice
    targets, masks = warp_dataset_to_base(images, poses, intr, grid, base_hw)
    assert targets.shape == (4, 48, 64, 3)
    assert float(masks.mean()) > 0.3

    opt = optax.adam(0.03)
    opt_state = opt.init(grid)
    step = make_recon_train_step_shearwarp(rcfg, opt, base_hw)
    for i in range(5):
        key, sk = jax.random.split(key)
        grid, opt_state, metrics = step(
            grid, opt_state, targets, masks, poses, jnp.asarray(i % 4), sk
        )
    assert np.isfinite(float(metrics["total_loss"]))

    # non-square orientation: flips only, output shape preserved, finite
    from voxe_tpu.render.shearwarp import render_shear_warp

    pose = pose_spherical(120.0, 30.0, 4.031)
    out, _ = render_shear_warp(grid, pose, rcfg, base_hw=base_hw)
    oriented = orient_base_image(
        out.colour.reshape(*base_hw, 3), jnp.asarray(pose.rotation)
    )
    assert oriented.shape == (*base_hw, 3)
    assert np.isfinite(np.asarray(oriented)).all()


def test_sds_shearwarp_step(rcfg):
    """Tiny-SD SDS edit step on the shear-warp path: finite losses, grid
    actually moves, DCL anchors to the reference densities."""
    from voxe_tpu.models.sd import StableDiffusion, tiny_test_config
    from voxe_tpu.train.sds import make_sds_train_step_shearwarp

    grid = _fresh_grid(jax.random.PRNGKey(3))
    sd = StableDiffusion(config=tiny_test_config(), unet_dtype=jnp.float32)
    opt = optax.adam(1e-2)
    opt_state = opt.init(grid)
    step = make_sds_train_step_shearwarp(
        sd, rcfg, opt, (32, 32),
        density_correlation_weight=200.0, tv_density_weight=0.1,
    )
    text = sd.get_text_embeds("a yarn doll", "")
    ref_d = jnp.copy(grid.densities)
    ref_f = jnp.copy(grid.features)
    pose = pose_spherical(30.0, 40.0, 4.031)
    new_grid, _, metrics = step(
        grid, opt_state, sd.params, text,
        jnp.asarray(pose.rotation), jnp.asarray(pose.translation).reshape(3, 1),
        ref_d, ref_f, jax.random.PRNGKey(1), jnp.asarray(500),
    )
    assert all(np.isfinite(float(v)) for v in metrics.values())
    assert float(jnp.abs(new_grid.features - grid.features).max()) > 0.0


def test_recon_multi_step_matches_sequential(rcfg, scene):
    """K fused shear-warp recon steps (make_recon_train_multi_step_shearwarp,
    the trainer's steps_per_call>1 program) must match K sequential
    single-dispatch steps given the same split keys and image indices — the
    lax.scan changes dispatch structure, not math."""
    from voxe_tpu.train.recon import make_recon_train_multi_step_shearwarp

    grid = _fresh_grid(jax.random.PRNGKey(5))
    targets, masks = warp_dataset_to_base(
        scene["images"], scene["poses"], scene["intr"], grid, BASE_HW
    )
    opt = optax.adam(0.03)
    opt_state = opt.init(grid)
    K = 3
    idxs = jnp.asarray([1, 4, 7], jnp.int32)
    call_key = jax.random.PRNGKey(9)

    multi = make_recon_train_multi_step_shearwarp(rcfg, opt, BASE_HW, K)
    gm, _, mm = multi(grid, opt_state, targets, masks, scene["poses"], idxs, call_key)

    step = make_recon_train_step_shearwarp(rcfg, opt, BASE_HW)
    g, s = grid, opt_state
    for i, k in enumerate(jax.random.split(call_key, K)):
        g, s, m = step(g, s, targets, masks, scene["poses"], idxs[i], k)

    np.testing.assert_allclose(
        np.asarray(gm.densities), np.asarray(g.densities), atol=5e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(gm.features), np.asarray(g.features), atol=5e-5, rtol=0
    )
    # scan returns the LAST step's metrics
    np.testing.assert_allclose(
        float(mm["total_loss"]), float(m["total_loss"]), atol=1e-5
    )


def test_trainer_shearwarp_steps_per_call(tmp_path, caplog):
    """The recon trainer wires steps_per_call>1 on the shear-warp path (the
    r5 fused dispatch; previously it warned and fell back to 1): the loop
    strides by K, draws a [K] index batch, and trains to finite loss.
    22 iterations at K=4 exercise the PARTIAL final chunk — exactly 22
    optimizer steps must run, not 24 (a smaller scan compiles on demand)."""
    import logging

    caplog.set_level(logging.INFO, logger="voxe_tpu")
    from voxe_tpu.data.dataset import PosedImagesDataset
    from voxe_tpu.data.synthetic import generate_synthetic_scene
    from voxe_tpu.train.recon import train_sh_vox_grid_vol_mod_with_posed_images
    from voxe_tpu.utils.misc import (
        compute_expected_density_scale_for_relu_field_grid,
    )

    scene_dir = generate_synthetic_scene(
        tmp_path / "scene", num_train=6, num_test=1, image_size=32,
        focal=32.0, grid_res=24,
    )
    dataset = PosedImagesDataset(
        images_dir=scene_dir / "images",
        camera_params_json=scene_dir / "train_camera_params.json",
    )
    res, world = 16, 3.0
    cfg = VoxelGridConfig(
        voxel_size=VoxelSize(*([world / res] * 3)),
        density_preactivation="identity",
        density_postactivation="softplus",
        expected_density_scale=compute_expected_density_scale_for_relu_field_grid(
            (world,) * 3
        ),
    )
    grid = VoxelGrid(jnp.zeros((res, res, res, 1)), jnp.zeros((res, res, res, 3)), cfg)
    rcfg2 = SHVoxGridRenderConfig(
        num_samples_per_ray=48,
        camera_bounds=dataset.camera_bounds,
        white_bkgd=True,
    )
    model = VolumetricModel(grid, rcfg2)
    model = train_sh_vox_grid_vol_mod_with_posed_images(
        model,
        dataset,
        tmp_path / "out",
        image_batch_cache_size=4,
        ray_batch_size=1024,
        num_stages=1,
        num_iterations_per_stage=22,
        steps_per_call=4,
        learning_rate=0.03,
        lr_decay_steps_per_stage=20,
        save_freq=10_000,
        test_freq=10_000,
        feedback_freq=10_000,
        summary_freq=10_000,
        fast_debug_mode=True,
        use_shear_warp=True,
    )
    out = model.render(dataset.camera_intrinsics, pose_spherical(30.0, 40.0, 4.031))
    assert np.isfinite(np.asarray(out.colour)).all()
    # exactly 22 optimizer steps: the final chunk runs as a 2-step scan,
    # never overshooting the stage budget to 24
    globals_logged = [
        int(m.split("Global: ")[1].split()[0])
        for m in caplog.messages
        if "Global: " in m
    ]
    assert globals_logged, "no summary logs captured"
    assert max(globals_logged) == 22, globals_logged
