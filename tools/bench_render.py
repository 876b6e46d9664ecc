"""Benchmark: full-frame eval/video rendering — exact path vs the fast
screen-space shear-warp path (--use_shear_warp on the render CLIs).

The render CLI's working set (render_sh_based_voxel_grid.py defaults on the
dog2-class scene): 160^3 grid, 400^2 intrinsics x render_scale_factor 2.0 =
800^2 frames, 512 samples/ray on the exact path. The fast path composites
the shear-warp base image (2x long side by default) and warps it to screen
with one bilinear 2D gather pass (render/shearwarp.py
render_shear_warp_to_screen).

Timing methodology (BENCHMARKS.md "measurement truth"): frames dispatch
back-to-back and drain through ONE device->host fetch of a pixel from every
frame — the same pipelining a real turntable render gets.

Run:  python tools/bench_render.py [--frames 20] [--exact_frames 4]
      [--screen 800] [--samples 512] [--res 160]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--exact_frames", type=int, default=4)
    p.add_argument("--screen", type=int, default=800)
    p.add_argument("--samples", type=int, default=512)
    p.add_argument("--res", type=int, default=160)
    args = p.parse_args()

    import jax

    from voxe_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    from bench import make_dog2_grid
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.utils.camera import (
        CameraBounds,
        CameraIntrinsics,
        get_thre360_animation_poses,
    )

    print(f"devices: {jax.devices()}")
    grid = make_dog2_grid(args.res)
    rcfg = SHVoxGridRenderConfig(
        num_samples_per_ray=256,
        render_num_samples_per_ray=args.samples,
        camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
        perturb_sampled_points=False,
    )
    vm = VolumetricModel(grid, rcfg)
    intr = CameraIntrinsics(args.screen, args.screen, float(args.screen))
    poses = get_thre360_animation_poses(
        hemispherical_radius=4.0311, camera_pitch=60.0, num_poses=max(args.frames, 8)
    )

    def run(label: str, n: int, **overrides) -> float:
        # compile + settle
        out = vm.render(intr, poses[0], **overrides)
        _ = np.asarray(out.colour.ravel()[:1])
        t0 = time.perf_counter()
        outs = [
            vm.render(intr, poses[i % len(poses)], **overrides) for i in range(n)
        ]
        for o in outs:  # one fetch per frame = the hard barrier
            _ = np.asarray(o.colour.ravel()[:1])
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt * 1e3:.1f} ms/frame ({n} frames, "
              f"{args.screen}^2) -> 180-frame turntable {dt * 180 / 60:.2f} min")
        return dt

    # fused: the whole path in ONE dispatch, uint8 frames on device (what
    # the render CLI's --use_shear_warp actually executes)
    _ = vm.render_camera_path_fast(intr, poses[: args.frames])  # compile
    t0 = time.perf_counter()
    frames = vm.render_camera_path_fast(intr, poses[: args.frames])
    fused = (time.perf_counter() - t0) / args.frames
    assert frames.dtype == np.uint8
    print(f"shear-warp fused path: {fused * 1e3:.1f} ms/frame "
          f"({args.frames} frames, {args.screen}^2) -> 180-frame turntable "
          f"{fused * 180 / 60:.2f} min")

    fast = run("shear-warp per-dispatch", args.frames, use_shear_warp=True)
    exact = run("exact per-sample", args.exact_frames)
    print(f"speedup: fused {exact / fused:.1f}x, per-dispatch {exact / fast:.1f}x")


if __name__ == "__main__":
    main()
