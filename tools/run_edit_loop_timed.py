"""End-to-end timed dog2-scale edit loop — the north-star workload.

Runs the COMPLETE 8000-iteration global-edit training loop (random hemisphere
poses, directional prompt selection, t-annealing schedule, shear-warp render
-> SD2.0-shape SDS -> DCL -> Adam) on real SD 2.0 shapes with zero weights
(identical FLOPs; real weights cannot enter this zero-egress image) and
reports wall-clock against the reference's ~50 min on an RTX A5000
(README.md:91-92) and the driver's <=10 min v4-8 target (BASELINE.md).

`--steps_per_call K` uses the fused lax.scan multi-step (K iterations per
dispatch; in-jit pose draw) to amortize relay dispatch latency.

Run:  python tools/run_edit_loop_timed.py --iters 8000 --steps_per_call 25
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8000)
    p.add_argument("--steps_per_call", type=int, default=25)
    p.add_argument("--frame", type=int, default=400)
    p.add_argument("--base", type=int, default=0,
                   help="explicit base lattice side (default: lane-aligned frame)")
    p.add_argument("--grid", type=int, default=160)
    args = p.parse_args()

    import jax

    from voxe_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp
    import numpy as np
    import optax

    from voxe_tpu.models.sd import StableDiffusion
    from voxe_tpu.models.sd.sds import DIRECTION_PROMPTS
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.train.sds import (
        make_sds_train_multi_step,
        make_sds_train_step_shearwarp,
    )
    from voxe_tpu.utils.camera import CameraBounds, CameraIntrinsics, get_random_pose

    print(f"devices: {jax.devices()}")
    res, frame = args.grid, args.frame
    # the trainers' default base-lattice policy (sds.py): lane-aligned
    from voxe_tpu.render.shearwarp import lane_aligned_res

    base = args.base or lane_aligned_res(frame)
    print(f"base lattice: {base} (frame {frame})")
    from bench import make_dog2_grid

    grid = make_dog2_grid(res)
    render_config = SHVoxGridRenderConfig(
        num_samples_per_ray=256, camera_bounds=CameraBounds(2.0, 6.0), white_bkgd=True
    )
    t0 = time.perf_counter()
    sd = StableDiffusion(
        sd_version="2.0", init_mode="zeros",
        t_sched_start=4000, t_sched_freq=600, t_sched_gamma=0.75,
    )
    print(f"sd build: {time.perf_counter() - t0:.1f}s")
    text_by_dir = jnp.stack(
        [
            sd.get_text_embeds(f"a dog made of yarn, {d} view", "")
            for d in DIRECTION_PROMPTS
        ]
    )
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(grid)
    ref_d = jnp.copy(grid.densities)
    ref_f = jnp.copy(grid.features)
    intrinsics = CameraIntrinsics(frame, frame, float(frame))

    def fetch(x):
        return np.asarray(x.ravel()[:1])

    key = jax.random.PRNGKey(7)
    K = args.steps_per_call
    t_wall = time.perf_counter()
    if K > 1:
        multi = make_sds_train_multi_step(
            sd, render_config, optimizer, intrinsics, K,
            density_correlation_weight=200.0, use_shear_warp=True,
            sw_base_hw=(base, base),
        )
        t0 = time.perf_counter()
        done = 0
        while done < args.iters:
            bounds = []
            for gs in range(done + 1, done + K + 1):
                sd.update_t_schedule(min(gs, args.iters))
                bounds.append(
                    (
                        int(sd.num_train_timesteps * sd.min_step_ratio),
                        int(sd.num_train_timesteps * sd.max_step_ratio),
                    )
                )
            key, k_step = jax.random.split(key)
            grid, opt_state, metrics = multi(
                grid, opt_state, sd.params, text_by_dir, ref_d, ref_f,
                jnp.asarray(bounds, jnp.int32), k_step,
            )
            if done == 0:
                fetch(grid.densities)
                print(f"compile+first chunk: {time.perf_counter() - t0:.1f}s")
                t_wall = time.perf_counter()  # steady-state clock
            done += K
            if done % 1000 < K:
                print(f"  iter {done}: loss {float(metrics['total_loss']):.4f} "
                      f"({time.perf_counter() - t_wall:.0f}s steady)")
    else:
        step = make_sds_train_step_shearwarp(
            sd, render_config, optimizer, (base, base),
            density_correlation_weight=200.0,
        )
        rng = np.random.default_rng(0)
        t0 = time.perf_counter()
        for i in range(args.iters):
            pose, direction, _, _ = get_random_pose(4.0311, rng)
            sd.update_t_schedule(i + 1)
            key, k_t, k_step = jax.random.split(key, 3)
            t = sd.sample_timestep(k_t)
            text = text_by_dir[DIRECTION_PROMPTS.index(direction)]
            grid, opt_state, metrics = step(
                grid, opt_state, sd.params, text,
                jnp.asarray(pose.rotation), jnp.asarray(pose.translation).reshape(3, 1),
                ref_d, ref_f, k_step, t,
            )
            if i == 0:
                fetch(grid.densities)
                print(f"compile+first step: {time.perf_counter() - t0:.1f}s")
                t_wall = time.perf_counter()
            if (i + 1) % 1000 == 0:
                print(f"  iter {i + 1}: ({time.perf_counter() - t_wall:.0f}s steady)")

    fetch(grid.densities)
    steady = time.perf_counter() - t_wall
    n_steady = args.iters - (K if K > 1 else 1)
    print(
        f"RESULT: {args.iters}-iteration edit loop | steady-state "
        f"{steady / 60:.2f} min ({steady / n_steady * 1e3:.1f} ms/iter) | "
        f"reference ~50 min (A5000) | extrapolated full-8000 "
        f"{steady / n_steady * 8000 / 60:.2f} min"
    )


if __name__ == "__main__":
    main()
