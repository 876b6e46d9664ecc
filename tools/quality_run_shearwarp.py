"""Production-scale recon quality run on the shear-warp fast path.

Generates a synthetic posed scene, trains the full 4-stage coarse-to-fine
ladder to a 160^3 grid with --use_shear_warp semantics (coarse stages on
host CPU, final stage on the accelerator), then reports HELD-OUT PSNR
through the exact screen-space renderer — the quality gate for training on
base-plane supervision at production scale (BENCHMARKS.md "Quality").

Run:  python tools/quality_run_shearwarp.py [--image 128 --iters 150]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--image", type=int, default=128)
    p.add_argument("--iters", type=int, default=150, help="iterations per stage")
    p.add_argument("--grid", type=int, default=160)
    p.add_argument("--views", type=int, default=16, help="training views (reference scenes have ~100)")
    p.add_argument("--out", type=str, default="/tmp/voxe_quality_sw")
    p.add_argument("--cpu", action="store_true", help="force everything on CPU")
    p.add_argument("--base", type=int, default=None,
                   help="shear-warp base lattice res (default: 2x stage image res)")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="fused iterations per device dispatch "
                   "(r5: works on the shear-warp path)")
    p.add_argument("--exact", action="store_true",
                   help="CONTROL: train on the exact per-sample renderer "
                   "with the same budget instead of shear-warp")
    args = p.parse_args()

    import os

    if args.cpu:
        os.environ.setdefault("VOXE_PLATFORM", "cpu")

    import jax
    import jax.numpy as jnp

    from voxe_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from voxe_tpu.data.dataset import PosedImagesDataset
    from voxe_tpu.data.synthetic import generate_synthetic_scene
    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.train.recon import train_sh_vox_grid_vol_mod_with_posed_images
    from voxe_tpu.train.testers import test_sh_vox_grid_vol_mod_with_posed_images
    from voxe_tpu.utils.misc import (
        compute_expected_density_scale_for_relu_field_grid,
    )

    out = Path(args.out)
    scene = out / "scene"
    if not (scene / "train_camera_params.json").exists():
        print("generating synthetic scene ...")
        with jax.default_device(jax.devices("cpu")[0]):
            generate_synthetic_scene(
                scene, num_train=args.views, num_test=4, image_size=args.image,
                focal=float(args.image), grid_res=48,
            )
    train_ds = PosedImagesDataset(
        scene / "images", scene / "train_camera_params.json", rgba_white_bkgd=True
    )
    test_ds = PosedImagesDataset(
        scene / "images", scene / "test_camera_params.json", rgba_white_bkgd=True
    )

    res, world = args.grid, 3.0
    cfg = VoxelGridConfig(
        voxel_size=VoxelSize(*([world / res] * 3)),
        density_preactivation="identity",
        density_postactivation="softplus",
        gather_dtype="bfloat16",
        expected_density_scale=compute_expected_density_scale_for_relu_field_grid(
            (world,) * 3
        ),
    )
    grid = VoxelGrid(jnp.zeros((res, res, res, 1)), jnp.zeros((res, res, res, 3)), cfg)
    rcfg = SHVoxGridRenderConfig(
        num_samples_per_ray=192,
        camera_bounds=train_ds.camera_bounds,
        white_bkgd=True,
        render_num_samples_per_ray=256,
        parallel_rays_chunk_size=16384,
    )
    model = VolumetricModel(grid, rcfg)

    t0 = time.time()
    model = train_sh_vox_grid_vol_mod_with_posed_images(
        model,
        train_ds,
        out / "run",
        image_batch_cache_size=8,
        num_stages=4,
        num_iterations_per_stage=args.iters,
        save_freq=100_000,
        test_freq=100_000,
        feedback_freq=100_000,
        summary_freq=50,
        fast_debug_mode=True,
        use_shear_warp=not args.exact,
        shear_warp_base_res=args.base,
        steps_per_call=args.steps_per_call,
        coarse_stages_on_cpu=not args.cpu,
    )
    wall = time.time() - t0

    # held-out evaluation through the EXACT screen-space renderer
    metrics = test_sh_vox_grid_vol_mod_with_posed_images(model, test_ds)
    train_metrics = test_sh_vox_grid_vol_mod_with_posed_images(model, train_ds)
    print(
        f"RESULT: held-out PSNR {metrics['psnr']:.2f} dB | "
        f"train-view PSNR {train_metrics['psnr']:.2f} dB | "
        f"grid {res}^3 | {4 * args.iters} total iters | wall {wall / 60:.1f} min"
    )


if __name__ == "__main__":
    main()
