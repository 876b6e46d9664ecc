"""On-chip numeric parity: Pallas fused compositing vs streamed compositing.

The fused Pallas kernel (voxe_tpu/ops/composite.py) is default-off on the
shear-warp path because it measures SLOWER than the slice-streamed
composite (83.35 vs 53.27 ms/iter in the SDS step, BENCHMARKS.md r4) — but
its correctness should be checkable on real hardware, not just in CI's
interpret mode (tests/test_composite_kernel.py). This tool renders the
production dog2 working set (160^3 softplus grid -> 384^2 base frame, 256
samples/ray) both ways on the current backend and reports the difference.

Measured on the v5e relay (2026-08-19): max 4.3e-3 / mean 5.5e-4 — bf16
accumulation-order tolerance.

Run: python tools/verify_fused_kernel.py [--base 384] [--res 160]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base", type=int, default=384)
    p.add_argument("--res", type=int, default=160)
    p.add_argument("--samples", type=int, default=256)
    args = p.parse_args()

    import jax

    # Persistent cache only off-CPU (ADVICE r4): a VOXE_PLATFORM=cpu run must
    # not write CPU executables into the shared TPU cache — see
    # voxe_tpu/utils/compile_cache.py for the full rationale.
    from voxe_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    from bench import make_dog2_grid
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.render.shearwarp import render_shear_warp
    from voxe_tpu.utils.camera import CameraBounds, pose_spherical

    grid = make_dog2_grid(args.res)
    pose = pose_spherical(35.0, -30.0, 4.0311)
    outs = {}
    for fused in (False, True):
        cfg = SHVoxGridRenderConfig(
            num_samples_per_ray=args.samples,
            camera_bounds=CameraBounds(2.0, 6.0),
            white_bkgd=True,
            perturb_sampled_points=False,
            use_fused_kernel=fused,
        )
        fn = jax.jit(
            lambda g, cfg=cfg: render_shear_warp(
                g, pose, cfg, base_hw=(args.base, args.base)
            )[0].colour
        )
        outs[fused] = np.asarray(fn(grid))
    diff = np.abs(outs[True] - outs[False])
    print(f"backend: {jax.default_backend()}")
    print(f"max|fused - streamed|  = {diff.max():.3e}")
    print(f"mean|fused - streamed| = {diff.mean():.3e}")
    ok = diff.max() < 5e-2 and diff.mean() < 1e-3
    print("ON-CHIP PARITY OK" if ok else "PARITY FAILED")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
