"""Reconstruction trainer: fit an SH voxel grid to posed images.

Rebuild of reference: thre3d_atom/modules/trainers.py:55-529 with TPU-first
restructuring of the hot loop:

* The whole iteration — pixel/ray draw, ray casting, dual (specular+diffuse)
  render, L1 losses, Adam update — is ONE jitted function. Rays are cast only
  for the sampled pixel indices (the reference casts every ray of the image
  batch then subsamples, trainers.py:291-313).
* The diffuse-regularization render shares the grid gather with the specular
  render: one interpolation pass feeds both the full-SH and the deg-0 SH
  shading (the reference renders the scene twice end-to-end,
  trainers.py:316-340 — pure 2x memory-bandwidth waste).
* Multi-device: the step can be sharded over a `rays` axis of a
  jax.sharding.Mesh via voxe_tpu.parallel (grads psum automatically).
"""
from __future__ import annotations

import time
from datetime import timedelta
from functools import partial
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from voxe_tpu.data.dataset import PosedImagesDataset
from voxe_tpu.grid.voxels import VoxelGrid, scale_voxel_grid
from voxe_tpu.models.volumetric import VolumetricModel
from voxe_tpu.render.accumulate import accumulate_radiance_density_on_rays
from voxe_tpu.render.interface import SHVoxGridRenderConfig, _sample
from voxe_tpu.render.process import _shade_and_mask
from voxe_tpu.render.rays import Rays
from voxe_tpu.render.shearwarp import render_shear_warp
from voxe_tpu.grid.voxels import grid_query
from voxe_tpu.utils.camera import CameraIntrinsics, CameraPose
from voxe_tpu.utils.constants import (
    CAMERA_BOUNDS,
    CAMERA_INTRINSICS,
    HEMISPHERICAL_RADIUS,
    NUM_COLOUR_CHANNELS,
)
from voxe_tpu.utils.logging import log
from voxe_tpu.utils.metrics import mse2psnr
from voxe_tpu.utils.misc import compute_thre3d_grid_sizes


def cast_rays_at_indices(
    intrinsics: CameraIntrinsics,
    poses: jnp.ndarray,  # [B, 3, 4]
    flat_indices: jnp.ndarray,  # [R] indices into B*H*W
) -> Rays:
    """Cast only the rays addressed by flat (image, pixel) indices."""
    height, width, focal = intrinsics.height, intrinsics.width, intrinsics.focal
    pixels_per_image = height * width
    img_idx = flat_indices // pixels_per_image
    pix_idx = flat_indices % pixels_per_image
    y = (pix_idx // width).astype(jnp.float32) + 0.5
    x = (pix_idx % width).astype(jnp.float32) + 0.5

    dirs = jnp.stack(
        [
            (x - width * 0.5) / focal,
            -(y - height * 0.5) / focal,
            -jnp.ones_like(x),
        ],
        axis=-1,
    )  # [R, 3]
    rot = poses[img_idx, :, :3]  # [R, 3, 3]
    trans = poses[img_idx, :, 3]  # [R, 3]
    rays_d = jnp.einsum("rij,rj->ri", rot, dirs)
    return Rays(trans, rays_d)


def render_specular_and_diffuse(
    grid: VoxelGrid,
    rays: Rays,
    config: SHVoxGridRenderConfig,
    key: Optional[jax.Array],
):
    """One grid gather -> two composited renders (full SH + diffuse deg-0)."""
    sampled = _sample(grid, rays, config, key)
    num_rays, num_samples, _ = sampled.points.shape
    flat_points = sampled.points.reshape(-1, 3)
    interpolated = grid_query(grid, flat_points)

    spec = _shade_and_mask(
        grid, flat_points, interpolated, rays, num_samples,
        NUM_COLOUR_CHANNELS, render_diffuse=False,
    )
    diff = _shade_and_mask(
        grid, flat_points, interpolated, rays, num_samples,
        NUM_COLOUR_CHANNELS, render_diffuse=True,
    )
    out_spec = accumulate_radiance_density_on_rays(
        spec, sampled.depths, rays, white_bkgd=config.white_bkgd
    )
    out_diff = accumulate_radiance_density_on_rays(
        diff, sampled.depths, rays, white_bkgd=config.white_bkgd
    )
    return out_spec, out_diff


def make_recon_train_step(
    intrinsics: CameraIntrinsics,
    render_config: SHVoxGridRenderConfig,
    optimizer: optax.GradientTransformation,
    ray_batch_size: int,
    apply_diffuse_render_regularization: bool = True,
    # donation saves one grid+optimizer copy per step (~0.25 ms at 160^3) but
    # some TPU transports mis-handle small non-donated outputs of donated
    # executables (observed INVALID_ARGUMENT on metric transfer); default off
    donate: bool = False,
    mesh=None,
) -> Callable:
    """Build the jitted per-iteration update.

    signature: step(grid, opt_state, images [N,H,W,3], poses [N,3,4],
                    batch_indices [B], key) -> (grid, opt_state, metrics)

    With `mesh`, the ray batch (and every per-ray intermediate) is sharded
    over the mesh's ray axis while grid/optimizer state stay replicated;
    GSPMD inserts the psum gradient all-reduce.
    """

    def step(grid, opt_state, images, poses, batch_indices, key):
        k_idx, k_render = jax.random.split(key)
        batch_images = images[batch_indices]  # [B, H, W, 3]
        batch_poses = poses[batch_indices]  # [B, 3, 4]
        total_pixels = batch_images.shape[0] * batch_images.shape[1] * batch_images.shape[2]

        flat_idx = jax.random.randint(k_idx, (ray_batch_size,), 0, total_pixels)
        if mesh is not None:
            from voxe_tpu.parallel.mesh import replicate, shard_rays

            flat_idx = shard_rays(mesh, flat_idx)
            grid = replicate(mesh, grid)
        pixels = batch_images.reshape(-1, 3)[flat_idx]
        rays = cast_rays_at_indices(intrinsics, batch_poses, flat_idx)
        if mesh is not None:
            from voxe_tpu.parallel.mesh import shard_rays

            pixels = shard_rays(mesh, pixels)
            rays = Rays(shard_rays(mesh, rays.origins), shard_rays(mesh, rays.directions))

        def loss_fn(g):
            out_spec, out_diff = render_specular_and_diffuse(
                g, rays, render_config, k_render
            )
            spec_l1 = jnp.mean(jnp.abs(out_spec.colour - pixels))
            spec_mse = jnp.mean((out_spec.colour - pixels) ** 2)
            total = spec_l1
            diff_l1 = diff_mse = jnp.zeros(())
            if apply_diffuse_render_regularization:
                diff_l1 = jnp.mean(jnp.abs(out_diff.colour - pixels))
                diff_mse = jnp.mean((out_diff.colour - pixels) ** 2)
                total = total + diff_l1
            return total, dict(
                specular_loss=spec_l1,
                diffuse_loss=diff_l1,
                specular_psnr=mse2psnr(spec_mse),
                diffuse_psnr=mse2psnr(diff_mse),
            )

        (total_loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(grid)
        updates, new_opt_state = optimizer.update(grads, opt_state, grid)
        new_grid = optax.apply_updates(grid, updates)
        metrics["total_loss"] = total_loss
        return new_grid, new_opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def warp_dataset_to_base(
    images: jnp.ndarray,  # [N, H, W, 3]
    poses: jnp.ndarray,  # [N, 3, 4]
    intrinsics: CameraIntrinsics,
    grid: VoxelGrid,
    base_hw,
):
    """One-time host-side prep for shear-warp training: splat every TARGET
    image onto its pose's base-plane lattice (data only — no gradient ever
    flows here, so the scatter cost is paid once per stage, not per step).

    Returns (targets [N, U, V, 3], masks [N, U, V])."""
    from voxe_tpu.render.shearwarp import (
        check_shear_warp_poses,
        compute_base_geometry,
        screen_to_base,
        warp_image_to_base,
    )

    # eye-inside-volume guard (VERDICT r4 weak-1): every dataset pose about
    # to supervise a shear-warp training stage must clear the grid AABB
    # along its marching axis — fail loudly here instead of silently
    # clamping the eye in the traced render
    check_shear_warp_poses(
        grid, np.asarray(poses), "shear-warp training (warp_dataset_to_base)"
    )
    warp = jax.jit(warp_image_to_base, static_argnums=(2,))
    targets, masks = [], []
    for i in range(images.shape[0]):
        pose = CameraPose(
            rotation=np.asarray(poses[i][:, :3]),
            translation=np.asarray(poses[i][:, 3:]),
        )
        geom = compute_base_geometry(grid, pose)
        coords = screen_to_base(pose, intrinsics, geom, grid, base_hw)
        t, m = warp(jnp.asarray(images[i]), coords, tuple(base_hw))
        targets.append(t)
        masks.append(m)
    return jnp.stack(targets), jnp.stack(masks)


def make_recon_train_step_shearwarp(
    render_config: SHVoxGridRenderConfig,
    optimizer: optax.GradientTransformation,
    base_hw,
    apply_diffuse_render_regularization: bool = True,
    mesh=None,
) -> Callable:
    """Jitted per-iteration update on the SHEAR-WARP fast path.

    One full base-plane frame per step instead of a random ray subset: the
    render is two banded-matmul contractions + compositing (MXU work), whose
    backward is transposed matmuls — no gather/scatter anywhere (the exact
    renderer's 8 corner scatter-adds run at ~12M updates/s on TPU and
    dominate the step; BENCHMARKS.md "measurement truth"). The photometric
    loss is computed in base-plane space against targets pre-warped by
    `warp_dataset_to_base`, masked to the pixels the screen image covers.

    signature: step(grid, opt_state, targets [N,U,V,3], masks [N,U,V],
                    poses [N,3,4], image_idx (scalar), key)
               -> (grid, opt_state, metrics)
    """
    return jax.jit(
        _shearwarp_recon_step_fn(
            render_config, optimizer, base_hw,
            apply_diffuse_render_regularization, mesh,
        )
    )


def _shearwarp_recon_step_fn(
    render_config, optimizer, base_hw, apply_diffuse_render_regularization, mesh
):
    """The unjitted shear-warp recon step body — shared by the single-step
    builder above and the K-fused scan builder below."""
    base_hw = tuple(base_hw)

    def step(grid, opt_state, targets, masks, poses, image_idx, key):
        if mesh is not None:
            from voxe_tpu.parallel.mesh import replicate

            grid = replicate(mesh, grid)
        target = jax.lax.dynamic_index_in_dim(targets, image_idx, keepdims=False)
        mask = jax.lax.dynamic_index_in_dim(masks, image_idx, keepdims=False)
        pose_rt = jax.lax.dynamic_index_in_dim(poses, image_idx, keepdims=False)
        pose = CameraPose(rotation=pose_rt[:, :3], translation=pose_rt[:, 3:])
        m = mask[..., None]
        denom = jnp.maximum(jnp.sum(mask) * NUM_COLOUR_CHANNELS, 1.0)

        def loss_fn(g):
            out, _ = render_shear_warp(
                g,
                pose,
                render_config,
                base_hw=base_hw,
                key=key,
                with_diffuse=apply_diffuse_render_regularization,
                mesh=mesh,
            )
            img = out.colour.reshape(*base_hw, NUM_COLOUR_CHANNELS)
            spec_l1 = jnp.sum(jnp.abs(img - target) * m) / denom
            spec_mse = jnp.sum(((img - target) ** 2) * m) / denom
            total = spec_l1
            diff_l1 = diff_mse = jnp.zeros(())
            if apply_diffuse_render_regularization:
                dimg = out.extra["diffuse_colour"].reshape(
                    *base_hw, NUM_COLOUR_CHANNELS
                )
                diff_l1 = jnp.sum(jnp.abs(dimg - target) * m) / denom
                diff_mse = jnp.sum(((dimg - target) ** 2) * m) / denom
                total = total + diff_l1
            return total, dict(
                specular_loss=spec_l1,
                diffuse_loss=diff_l1,
                specular_psnr=mse2psnr(spec_mse),
                diffuse_psnr=mse2psnr(diff_mse),
            )

        (total_loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(grid)
        updates, new_opt_state = optimizer.update(grads, opt_state, grid)
        new_grid = optax.apply_updates(grid, updates)
        metrics["total_loss"] = total_loss
        return new_grid, new_opt_state, metrics

    return step


def make_recon_train_multi_step_shearwarp(
    render_config: SHVoxGridRenderConfig,
    optimizer: optax.GradientTransformation,
    base_hw,
    steps_per_call: int,
    apply_diffuse_render_regularization: bool = True,
    mesh=None,
) -> Callable:
    """K fused shear-warp recon steps per device dispatch.

    The shear-warp step is ~11 ms at production scale, so the ~4 ms/iter of
    per-dispatch framing the relay charges (BENCHMARKS.md r5 "production
    dispatch" A/B) is a ~36% tax on a one-dispatch-per-step loop — far
    worse than on the 50 ms SDS step. The scan body is the SAME traced
    step as the single-dispatch builder (shared `_shearwarp_recon_step_fn`:
    the pose is already dynamically indexed there, so nothing about the
    program changes shape); the per-step image index rides in as a [K]
    array drawn host-side, preserving the trainer's sampling semantics.

    Rebuilds the reference's hot loop (thre3d_atom/modules/trainers.py:
    256-341) at K iterations per dispatch; the exact-path analog is
    `make_recon_train_multi_step` below.

    signature: multi(grid, opt_state, targets [N,U,V,3], masks [N,U,V],
                     poses [N,3,4], image_idxs [K], key)
               -> (grid, opt_state, last-step metrics)
    """
    step_fn = _shearwarp_recon_step_fn(
        render_config, optimizer, base_hw,
        apply_diffuse_render_regularization, mesh,
    )

    def multi(grid, opt_state, targets, masks, poses, image_idxs, key):
        keys = jax.random.split(key, steps_per_call)

        def body(carry, inputs):
            g, s = carry
            idx, k = inputs
            g, s, m = step_fn(g, s, targets, masks, poses, idx, k)
            return (g, s), m

        (grid, opt_state), metrics = jax.lax.scan(
            body, (grid, opt_state), (image_idxs, keys)
        )
        return grid, opt_state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    return jax.jit(multi)


def make_recon_train_step_streaming(
    intrinsics: CameraIntrinsics,
    render_config: SHVoxGridRenderConfig,
    optimizer: optax.GradientTransformation,
    apply_diffuse_render_regularization: bool = True,
    mesh=None,
) -> Callable:
    """Jitted update for STREAMING datasets (memmap-backed scenes too large to
    device-cache; reference lazy mode datasets.py:113-123 analog).

    The host samples pixel indices and gathers the [R, 3] pixel batch from the
    memmap; everything else (ray casting from the tiny pose array, render,
    grads, Adam) stays on-device in one program.

    signature: step(grid, opt_state, batch_poses [B,3,4], flat_idx [R],
                    pixels [R,3], key) -> (grid, opt_state, metrics)
    """

    def step(grid, opt_state, batch_poses, flat_idx, pixels, key):
        _, k_render = jax.random.split(key)
        if mesh is not None:
            from voxe_tpu.parallel.mesh import replicate, shard_rays

            flat_idx = shard_rays(mesh, flat_idx)
            pixels = shard_rays(mesh, pixels)
            grid = replicate(mesh, grid)
        rays = cast_rays_at_indices(intrinsics, batch_poses, flat_idx)

        def loss_fn(g):
            out_spec, out_diff = render_specular_and_diffuse(
                g, rays, render_config, k_render
            )
            spec_l1 = jnp.mean(jnp.abs(out_spec.colour - pixels))
            spec_mse = jnp.mean((out_spec.colour - pixels) ** 2)
            total = spec_l1
            diff_l1 = diff_mse = jnp.zeros(())
            if apply_diffuse_render_regularization:
                diff_l1 = jnp.mean(jnp.abs(out_diff.colour - pixels))
                diff_mse = jnp.mean((out_diff.colour - pixels) ** 2)
                total = total + diff_l1
            return total, dict(
                specular_loss=spec_l1,
                diffuse_loss=diff_l1,
                specular_psnr=mse2psnr(spec_mse),
                diffuse_psnr=mse2psnr(diff_mse),
            )

        (total_loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(grid)
        updates, new_opt_state = optimizer.update(grads, opt_state, grid)
        new_grid = optax.apply_updates(grid, updates)
        metrics["total_loss"] = total_loss
        return new_grid, new_opt_state, metrics

    return jax.jit(step)


def make_recon_train_multi_step(
    intrinsics: CameraIntrinsics,
    render_config: SHVoxGridRenderConfig,
    optimizer: optax.GradientTransformation,
    ray_batch_size: int,
    num_train_images: int,
    image_batch_size: int,
    steps_per_call: int,
    apply_diffuse_render_regularization: bool = True,
    mesh=None,
) -> Callable:
    """K training steps fused into ONE dispatch via lax.scan.

    The dataset lives on-device and the per-step randomness (image batch,
    pixel subset, stratified jitter) is PRNG-key-driven, so nothing about an
    iteration needs the host: scanning K steps per call removes K-1 dispatch
    round-trips (significant wherever host->device latency is non-trivial)
    and lets XLA overlap step tails.

    signature: multi_step(grid, opt_state, images, poses, key)
               -> (grid, opt_state, last-step metrics)
    """

    def body(carry, step_key):
        grid, opt_state, images, poses = carry
        k_batch, k_idx, k_render = jax.random.split(step_key, 3)
        batch_indices = jax.random.randint(
            k_batch, (image_batch_size,), 0, num_train_images
        )
        batch_images = images[batch_indices]
        batch_poses = poses[batch_indices]
        total_pixels = image_batch_size * intrinsics.height * intrinsics.width

        flat_idx = jax.random.randint(k_idx, (ray_batch_size,), 0, total_pixels)
        if mesh is not None:
            from voxe_tpu.parallel.mesh import replicate, shard_rays

            flat_idx = shard_rays(mesh, flat_idx)
            grid = replicate(mesh, grid)
        pixels = batch_images.reshape(-1, 3)[flat_idx]
        rays = cast_rays_at_indices(intrinsics, batch_poses, flat_idx)

        def loss_fn(g):
            out_spec, out_diff = render_specular_and_diffuse(
                g, rays, render_config, k_render
            )
            spec_l1 = jnp.mean(jnp.abs(out_spec.colour - pixels))
            spec_mse = jnp.mean((out_spec.colour - pixels) ** 2)
            total = spec_l1
            diff_l1 = diff_mse = jnp.zeros(())
            if apply_diffuse_render_regularization:
                diff_l1 = jnp.mean(jnp.abs(out_diff.colour - pixels))
                diff_mse = jnp.mean((out_diff.colour - pixels) ** 2)
                total = total + diff_l1
            return total, dict(
                specular_loss=spec_l1,
                diffuse_loss=diff_l1,
                specular_psnr=mse2psnr(spec_mse),
                diffuse_psnr=mse2psnr(diff_mse),
            )

        (total_loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(grid)
        updates, new_opt_state = optimizer.update(grads, opt_state, grid)
        new_grid = optax.apply_updates(grid, updates)
        metrics["total_loss"] = total_loss
        return (new_grid, new_opt_state, images, poses), metrics

    def multi_step(grid, opt_state, images, poses, key):
        keys = jax.random.split(key, steps_per_call)
        (grid, opt_state, _, _), metrics = jax.lax.scan(
            body, (grid, opt_state, images, poses), keys
        )
        return grid, opt_state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    return jax.jit(multi_step)


def train_sh_vox_grid_vol_mod_with_posed_images(
    vol_mod: VolumetricModel,
    train_dataset: PosedImagesDataset,
    output_dir: Path,
    test_dataset: Optional[PosedImagesDataset] = None,
    image_batch_cache_size: int = 8,
    ray_batch_size: int = 32768,
    num_stages: int = 4,
    num_iterations_per_stage: int = 2000,
    scale_factor: float = 2.0,
    learning_rate: float = 0.03,
    lr_decay_gamma_per_stage: float = 0.1,
    lr_decay_steps_per_stage: int = 1000,
    stagewise_lr_decay_gamma: float = 0.9,
    render_feedback_pose: Optional[CameraPose] = None,
    save_freq: int = 1000,
    test_freq: int = 1000,
    feedback_freq: int = 100,
    summary_freq: int = 10,
    apply_diffuse_render_regularization: bool = True,
    verbose_rendering: bool = True,
    fast_debug_mode: bool = False,
    seed: int = 42,
    grid_random_init_range: tuple = (-1.0, 1.0),
    num_devices: int = 1,
    resume_from: Optional[Path] = None,
    steps_per_call: int = 1,
    coarse_stages_on_cpu: bool = False,
    coarse_ray_batch_size: Optional[int] = None,
    use_shear_warp: bool = False,
    shear_warp_base_res: Optional[int] = None,
) -> VolumetricModel:
    """Multi-stage coarse-to-fine reconstruction (reference trainers.py:55-506).

    Beyond the reference: with `resume_from` pointing at a
    `training_state_latest.pth` written by a previous run, training resumes
    mid-run with the optimizer state and PRNG key intact (the reference can
    only restart pipeline stages from model snapshots, SURVEY.md section 5).
    """
    output_dir = Path(output_dir)
    model_dir = output_dir / "saved_models"
    logs_dir = output_dir / "training_logs"
    render_dir = logs_dir / "rendered_output"
    for d in (model_dir, logs_dir, render_dir):
        d.mkdir(parents=True, exist_ok=True)

    try:
        from tensorboardX import SummaryWriter

        tb_writer = SummaryWriter(str(logs_dir / "tensorboard"))
    except Exception:  # pragma: no cover
        tb_writer = None

    # stagewise grid sizes (smallest first) + per-stage downsampled datasets
    final_dims = vol_mod.grid.grid_dims
    stagewise_sizes = compute_thre3d_grid_sizes(final_dims, num_stages, scale_factor)

    dataset_config = train_dataset.get_config_dict()
    base_downsample = dataset_config["downsample_factor"]
    stagewise_datasets = [train_dataset]
    for stage in range(1, num_stages):
        cfg = dict(dataset_config)
        cfg["downsample_factor"] = base_downsample * (scale_factor**stage)
        stagewise_datasets.insert(0, PosedImagesDataset(**cfg))

    # downscale grid to the smallest stage and re-randomize (reference
    # trainers.py:152-162: start training from scratch at the coarsest stage)
    key = jax.random.PRNGKey(seed)
    key, k_dens, k_feat = jax.random.split(key, 3)
    grid = scale_voxel_grid(vol_mod.grid, stagewise_sizes[0])
    lo, hi = grid_random_init_range
    grid = grid.replace(
        densities=jax.random.uniform(k_dens, grid.densities.shape, minval=lo, maxval=hi),
        features=jax.random.uniform(k_feat, grid.features.shape, minval=lo, maxval=hi),
    )

    # feedback pose defaults to the first test (or train) frame
    feedback_dataset = test_dataset if test_dataset is not None else train_dataset
    if render_feedback_pose is None:
        pose0 = feedback_dataset.poses[0]
        render_feedback_pose = CameraPose(
            rotation=pose0[:, :3], translation=pose0[:, 3:]
        )

    camera_bounds = train_dataset.camera_bounds
    camera_intrinsics = train_dataset.camera_intrinsics
    hemispherical_radius = train_dataset.get_hemispherical_radius_estimate()
    extra_info = {
        CAMERA_BOUNDS: list(camera_bounds),
        CAMERA_INTRINSICS: list(camera_intrinsics),
        HEMISPHERICAL_RADIUS: hemispherical_radius,
    }

    if not fast_debug_mode:
        from voxe_tpu.viz.static import visualize_camera_rays

        log.info("creating a camera-rays visualization ...")
        visualize_camera_rays(train_dataset, output_dir, num_rays_per_image=1)

    # data-parallel ray batching over a device mesh (SURVEY.md §2: the
    # TPU-native scaling layer the single-GPU reference never had)
    mesh = None
    if num_devices > 1:
        from voxe_tpu.parallel.mesh import maybe_mesh

        mesh = maybe_mesh(num_devices)
        log.info(f"data-parallel ray batching over {num_devices} devices")

    rng = np.random.default_rng(seed)
    log.info("beginning reconstruction training")
    time_training = 0.0
    global_step = 0

    resume_meta = None
    if resume_from is not None:
        import json as _json

        with np.load(Path(resume_from), allow_pickle=False) as data:
            resume_meta = _json.loads(bytes(data["__meta__"].tobytes()).decode())
        log.info(
            f"resuming from {resume_from}: stage {resume_meta['stage']}, "
            f"stage_iteration {resume_meta['stage_iteration']}"
        )
        global_step = int(resume_meta["global_step"])

    import contextlib

    for stage in range(1, num_stages + 1):
        if resume_meta is not None and stage < resume_meta["stage"]:
            # fast-forward completed stages: grid must track the stage ladder
            if stage != num_stages:
                grid = scale_voxel_grid(grid, stagewise_sizes[stage])
            continue

        # Optional hybrid placement: coarse stages are tiny compute (a 20^3-
        # 80^3 grid step is <1 ms of FLOPs) but can hit pathological TPU
        # compile paths on some toolchains; running them on the host CPU and
        # reserving the accelerator for the final full-resolution stage costs
        # nothing and avoids per-stage accelerator compiles entirely.
        stage_device_ctx = contextlib.nullcontext()
        stage_mesh = mesh
        if coarse_stages_on_cpu and stage != num_stages:
            cpu_devices = jax.devices("cpu")
            if cpu_devices:
                stage_device_ctx = jax.default_device(cpu_devices[0])
                # the mesh spans the default-platform devices; a CPU-placed
                # coarse stage runs un-meshed (its compute is trivial anyway)
                stage_mesh = None
        with stage_device_ctx:
            stage_dataset = stagewise_datasets[stage - 1]
            streaming = getattr(stage_dataset, "streaming", False)
            if streaming:
                images = None
                poses = jnp.asarray(stage_dataset.poses)
            else:
                images, poses = stage_dataset.device_arrays()
            batch_iter = stage_dataset.iter_batches(image_batch_cache_size, rng)

            stage_lr = learning_rate * (stagewise_lr_decay_gamma ** (stage - 1))
            schedule = optax.exponential_decay(
                init_value=stage_lr,
                transition_steps=lr_decay_steps_per_stage,
                decay_rate=lr_decay_gamma_per_stage,
                staircase=True,
            )
            optimizer = optax.adam(schedule, b1=0.9, b2=0.999)
            opt_state = optimizer.init(grid)

            stage_render_config = vol_mod.render_config.replace(
                num_samples_per_ray=vol_mod.render_config.num_samples_per_ray,
            )
            effective_ray_batch = ray_batch_size
            if (
                coarse_stages_on_cpu
                and stage != num_stages
                and coarse_ray_batch_size is not None
            ):
                effective_ray_batch = coarse_ray_batch_size
            stage_ray_batch = min(
                effective_ray_batch,
                image_batch_cache_size
                * stage_dataset.camera_intrinsics.height
                * stage_dataset.camera_intrinsics.width,
            )
            sw_active = use_shear_warp and not streaming
            sw_targets = sw_masks = None
            if use_shear_warp and streaming:
                log.warning(
                    "shear-warp training needs on-device base targets; "
                    "streaming stage falls back to the exact renderer"
                )
            if sw_active:
                # default base lattice = 2x the stage image res: the window
                # spans the whole grid diagonal, so the object's effective
                # sampling density is lower than in a screen frame; 2x
                # restores it (measured +6.1 dB held-out at 160^3, matching
                # the exact renderer to 0.3 dB — BENCHMARKS.md "Quality")
                if shear_warp_base_res:
                    base_res = shear_warp_base_res  # explicit override: exact
                else:
                    from voxe_tpu.render.shearwarp import lane_aligned_res

                    base_res = lane_aligned_res(2 * max(
                        stage_dataset.camera_intrinsics.height,
                        stage_dataset.camera_intrinsics.width,
                    ))
                base_hw = (base_res, base_res)
                log.info(f"shear-warp fast path: base lattice {base_hw}")
                sw_targets, sw_masks = warp_dataset_to_base(
                    images, poses, stage_dataset.camera_intrinsics, grid, base_hw
                )
                if steps_per_call > 1:
                    # one program per chunk size; a smaller scan compiles on
                    # demand for the final partial chunk so the fused path
                    # runs EXACTLY num_iterations_per_stage optimizer steps
                    def _build_sw_multi(k, _rc=stage_render_config, _b=base_hw,
                                        _m=stage_mesh):
                        return make_recon_train_multi_step_shearwarp(
                            _rc, optimizer, _b, k,
                            apply_diffuse_render_regularization, mesh=_m,
                        )

                    sw_multi_fns = {steps_per_call: _build_sw_multi(steps_per_call)}
                else:
                    train_step = make_recon_train_step_shearwarp(
                        stage_render_config,
                        optimizer,
                        base_hw,
                        apply_diffuse_render_regularization,
                        mesh=stage_mesh,
                    )
            elif streaming:
                if steps_per_call > 1:
                    log.warning(
                        "streaming dataset: scan step-fusion needs the scene "
                        "on-device; falling back to steps_per_call=1"
                    )
                    steps_per_call = 1
                train_step = make_recon_train_step_streaming(
                    stage_dataset.camera_intrinsics,
                    stage_render_config,
                    optimizer,
                    apply_diffuse_render_regularization,
                    mesh=stage_mesh,
                )
            elif steps_per_call > 1:
                def _build_multi(k, _intr=stage_dataset.camera_intrinsics,
                                 _rc=stage_render_config, _rb=stage_ray_batch,
                                 _n=len(stage_dataset), _m=stage_mesh):
                    return make_recon_train_multi_step(
                        _intr, _rc, optimizer, _rb,
                        num_train_images=_n,
                        image_batch_size=min(image_batch_cache_size, _n),
                        steps_per_call=k,
                        apply_diffuse_render_regularization=apply_diffuse_render_regularization,
                        mesh=_m,
                    )

                multi_step_fns = {steps_per_call: _build_multi(steps_per_call)}
            else:
                train_step = make_recon_train_step(
                    stage_dataset.camera_intrinsics,
                    stage_render_config,
                    optimizer,
                    stage_ray_batch,
                    apply_diffuse_render_regularization,
                    mesh=stage_mesh,
                )

            start_iteration = 1
            if resume_meta is not None and stage == resume_meta["stage"]:
                from voxe_tpu.train.checkpointing import load_training_state

                template = {"grid": grid, "opt_state": opt_state, "key": key}
                state, _ = load_training_state(Path(resume_from), template)
                grid, opt_state, key = state["grid"], state["opt_state"], state["key"]
                start_iteration = int(resume_meta["stage_iteration"]) + 1
                resume_meta = None

            log.info(
                f"training stage: {stage}  grid: {grid.grid_dims}  "
                f"images: [{stage_dataset.camera_intrinsics.height} x "
                f"{stage_dataset.camera_intrinsics.width}]  lr: {stage_lr:.5f}"
            )

            stage_time_start = time_training
            stage_wall_start = time.perf_counter()
            last_time = time.perf_counter()
            for stage_iteration in range(
                start_iteration, num_iterations_per_stage + 1, steps_per_call
            ):
                key, step_key = jax.random.split(key)
                # final chunk may be partial: run exactly the configured
                # number of optimizer steps, never K-1 extra past the budget
                chunk = min(
                    steps_per_call, num_iterations_per_stage - stage_iteration + 1
                )
                if sw_active:
                    if steps_per_call > 1:
                        if chunk not in sw_multi_fns:
                            sw_multi_fns[chunk] = _build_sw_multi(chunk)
                        idxs = jnp.asarray(
                            rng.integers(0, len(stage_dataset), chunk), jnp.int32
                        )
                        grid, opt_state, metrics = sw_multi_fns[chunk](
                            grid, opt_state, sw_targets, sw_masks, poses, idxs,
                            step_key,
                        )
                        global_step += chunk
                    else:
                        idx = jnp.asarray(int(rng.integers(0, len(stage_dataset))))
                        grid, opt_state, metrics = train_step(
                            grid, opt_state, sw_targets, sw_masks, poses, idx,
                            step_key,
                        )
                        global_step += 1
                elif streaming:
                    # host-side sampling from the memmap; device sees only the
                    # tiny pose block + the [R, 3] pixel batch
                    batch_indices = np.asarray(next(batch_iter))
                    intr = stage_dataset.camera_intrinsics
                    frame_pixels = intr.height * intr.width
                    flat_idx = rng.integers(
                        0, len(batch_indices) * frame_pixels, stage_ray_batch
                    )
                    pixels = stage_dataset.sample_pixels(
                        flat_idx % frame_pixels,
                        batch_indices[flat_idx // frame_pixels],
                    )
                    grid, opt_state, metrics = train_step(
                        grid, opt_state, poses[jnp.asarray(batch_indices)],
                        jnp.asarray(flat_idx), jnp.asarray(pixels), step_key,
                    )
                    global_step += 1
                elif steps_per_call > 1:
                    if chunk not in multi_step_fns:
                        multi_step_fns[chunk] = _build_multi(chunk)
                    grid, opt_state, metrics = multi_step_fns[chunk](
                        grid, opt_state, images, poses, step_key
                    )
                    global_step += chunk
                else:
                    batch_indices = jnp.asarray(next(batch_iter))
                    grid, opt_state, metrics = train_step(
                        grid, opt_state, images, poses, batch_indices, step_key
                    )
                    global_step += 1

                last_iter = stage_iteration + steps_per_call > num_iterations_per_stage
                if (
                    global_step % summary_freq == 0
                    or stage_iteration == 1
                    or last_iter
                ):
                    metrics_host = {k: float(v) for k, v in metrics.items()}
                    time_training += time.perf_counter() - last_time
                    log.info(
                        f"Stage: {stage} Global: {global_step} "
                        + " ".join(f"{k}: {v:.3f}" for k, v in metrics_host.items())
                    )
                    if tb_writer is not None:
                        for k, v in metrics_host.items():
                            tb_writer.add_scalar(k, v, global_step=global_step)
                    last_time = time.perf_counter()

                if (
                    global_step % feedback_freq == 0 or stage_iteration == 1 or last_iter
                ) and not fast_debug_mode:
                    from voxe_tpu.viz.static import (
                        visualize_sh_vox_grid_vol_mod_rendered_feedback,
                    )

                    feedback_model = VolumetricModel(grid, vol_mod.render_config)
                    visualize_sh_vox_grid_vol_mod_rendered_feedback(
                        feedback_model,
                        "default",
                        render_feedback_pose,
                        camera_intrinsics,
                        global_step,
                        render_dir,
                        training_time=time_training,
                        use_shear_warp=sw_active,
                    )
                    last_time = time.perf_counter()

                if (
                    test_dataset is not None
                    and not fast_debug_mode
                    and (global_step % test_freq == 0 or last_iter)
                ):
                    from voxe_tpu.train.testers import (
                        test_sh_vox_grid_vol_mod_with_posed_images,
                    )

                    test_model = VolumetricModel(grid, vol_mod.render_config)
                    test_sh_vox_grid_vol_mod_with_posed_images(
                        test_model, test_dataset, tb_writer, global_step
                    )
                    last_time = time.perf_counter()

                if global_step % save_freq == 0 or stage_iteration == 1 or last_iter:
                    snapshot = VolumetricModel(grid, vol_mod.render_config)
                    snapshot.save(
                        model_dir / f"model_stage_{stage}_iter_{global_step}.pth",
                        extra_info=extra_info,
                    )
                    from voxe_tpu.train.checkpointing import save_training_state

                    save_training_state(
                        model_dir / "training_state_latest.pth",
                        {"grid": grid, "opt_state": opt_state, "key": key},
                        {
                            "stage": stage,
                            "stage_iteration": stage_iteration,
                            "global_step": global_step,
                        },
                    )

            # per-stage accounting with a HARD device barrier (a device->host
            # fetch — the only reliable barrier on the axon relay transport,
            # BENCHMARKS.md "measurement truth"): deconfounds per-stage time
            # from async dispatch and relay-window wall-clock noise
            _ = np.asarray(jax.device_get(grid.densities.ravel()[:1]))
            time_training += time.perf_counter() - last_time
            last_time = time.perf_counter()
            log.info(
                f"stage {stage} done: training time "
                f"{time_training - stage_time_start:.1f}s (drained), wall "
                f"{time.perf_counter() - stage_wall_start:.1f}s incl. "
                "logging/checkpoints"
            )

        if stage != num_stages:
            grid = scale_voxel_grid(grid, stagewise_sizes[stage])

    vol_mod.grid = grid
    vol_mod.extra_info.update(extra_info)
    vol_mod.save(model_dir / "model_final.pth", extra_info=extra_info)
    log.info(
        f"Training complete; actual training time: {timedelta(seconds=time_training)}"
    )
    return vol_mod
