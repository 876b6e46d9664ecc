"""Component bisection of the SHEAR-WARP SDS edit step (the bench.py headline).

Times, each as a chained dispatch train draining through a device->host fetch
(the only hard barrier on the axon relay transport — BENCHMARKS.md
"measurement truth"):

  render_grad — shear-warp render fwd+bwd + Adam (no SD)
  sd_half     — resize->VAE-encode->2xUNet(CFG)->SDS-grad fwd+bwd w.r.t. a
                fixed image (no render)
  full        — the complete jitted edit step (what bench.py measures)

Usage (one at a time; the relay is single-client):
  python tools/bench_shearwarp_edit.py --iters 30 [--only full,sd_half]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--frame", type=int, default=384,
                   help="base lattice (default matches the trainers' "
                   "lane-aligned 400->384 rounding; pass 400 for the "
                   "pre-r4 exact-frame shape)")
    p.add_argument("--grid", type=int, default=160)
    p.add_argument("--sd_version", type=str, default="2.0")
    p.add_argument("--only", type=str, default="")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="Pallas compositing kernel in the shear-warp render")
    args = p.parse_args()

    import jax

    from voxe_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp
    import numpy as np
    import optax

    from voxe_tpu.models.sd import StableDiffusion
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.render.shearwarp import render_shear_warp
    from voxe_tpu.train.sds import make_sds_train_step_shearwarp
    from voxe_tpu.utils.camera import CameraBounds, pose_spherical

    print(f"devices: {jax.devices()}")
    res, frame = args.grid, args.frame
    from bench import make_dog2_grid

    grid = make_dog2_grid(res)
    render_config = SHVoxGridRenderConfig(
        num_samples_per_ray=256, camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True, use_fused_kernel=args.fused,
    )
    pose = pose_spherical(30.0, 40.0, 4.0311)
    rot = jnp.asarray(pose.rotation)
    trans = jnp.asarray(pose.translation).reshape(3, 1)
    optimizer = optax.adam(0.03)

    which = set(args.only.split(",")) if args.only else {
        "render_grad", "sd_half", "full"
    }

    def fetch(x):
        return np.asarray(x.ravel()[:1])

    def bench(label, fn, carry, iters):
        carry = fn(carry)  # compile
        fetch(carry)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry)
        fetch(carry)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"  {label:>12}: {ms:8.2f} ms/iter  ({iters} chained iters)")

    if "render_grad" in which:
        opt_state = optimizer.init(grid)

        @jax.jit
        def render_step(g, o):
            def loss_fn(g_):
                out, _ = render_shear_warp(
                    g_, pose, render_config, base_hw=(frame, frame)
                )
                return jnp.mean((out.colour - 0.5) ** 2)

            grads = jax.grad(loss_fn)(g)
            updates, o2 = optimizer.update(grads, o, g)
            return optax.apply_updates(g, updates), o2

        state = [grid, opt_state]

        def once(c):
            state[0], state[1] = render_step(state[0], state[1])
            return state[0].densities

        bench("render_grad", once, grid.densities, args.iters)

    sd = None
    if {"sd_half", "full"} & which:
        t0 = time.perf_counter()
        sd = StableDiffusion(sd_version=args.sd_version, init_mode="zeros")
        print(f"sd build: {time.perf_counter() - t0:.1f}s")
        text = sd.get_text_embeds("a dog made of yarn, front view", "")

    if "sd_half" in which:
        @jax.jit
        def sd_half(img):
            def loss_fn(img_):
                return sd.sds_loss(
                    sd.params, text, img_, jax.random.PRNGKey(0),
                    jnp.asarray(500), 100.0,
                )

            g = jax.grad(loss_fn)(img)
            return img - 1e-6 * g  # chain through the gradient

        bench("sd_half", sd_half, jnp.zeros((1, frame, frame, 3)), args.iters)

    if "full" in which:
        step = make_sds_train_step_shearwarp(
            sd, render_config, optimizer, (frame, frame),
            density_correlation_weight=200.0, remat_sds=not args.no_remat,
        )
        opt_state = optimizer.init(grid)
        ref_d = jnp.copy(grid.densities)
        ref_f = jnp.copy(grid.features)
        state = [grid, opt_state]

        def once(c):
            state[0], state[1], m = step(
                state[0], state[1], sd.params, text, rot, trans,
                ref_d, ref_f, jax.random.PRNGKey(0), jnp.asarray(500),
            )
            return state[0].densities

        bench("full", once, grid.densities, args.iters)


if __name__ == "__main__":
    main()
