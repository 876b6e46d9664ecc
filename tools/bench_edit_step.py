"""Benchmark + component bisection of the SDS edit step at real SD shapes.

The flagship workload (reference edit_pretrained_relu_field.py:109-114 +
thre3d_atom/thre3d_reprs/sd.py:191-215): per iteration one full-frame render
(im_h*im_w rays x num_samples), bilinear resize to 512^2, VAE encode, 2x UNet
forward with CFG, SDS gradient injection back through the renderer, Adam.

Measures (each as a chained async dispatch train, one block at the end):
  * full        — the complete jitted edit step
  * render_only — the same step with do_sds=False (render + regularizers)
  * unet_pair   — jitted 2xUNet CFG forward alone
  * vae_encode  — jitted VAE encode alone (forward only)

Run ONE at a time on the TPU (the axon relay is single-client):
  python tools/bench_edit_step.py --iters 100
  python tools/bench_edit_step.py --profile /tmp/edit_trace  # adds a trace

Weights are zeros (identical shapes/FLOPs to real SD 2.0; values irrelevant
for timing).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(label: str, fn, iters: int, *, warmup: int = 2) -> float:
    """fn(carry_scalar) -> new carry scalar. Iterations are DEPENDENCY-CHAINED
    through the scalar so the transport cannot overlap/elide dispatches; the
    drain is a device->host FETCH — block_until_ready returns early on the
    axon relay (BENCHMARKS.md "measurement truth")."""
    import jax.numpy as jnp
    import numpy as np

    carry = jnp.zeros(())
    for _ in range(warmup):
        carry = fn(carry)
    _ = np.asarray(carry)  # hard barrier
    carry = carry * 0.0
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(carry)
    _ = np.asarray(carry)  # hard barrier
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label:>12}: {dt * 1e3:9.2f} ms/iter  ({iters} chained iters)")
    return dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--image", type=int, default=400, help="frame H=W (dog2: 400)")
    p.add_argument("--grid", type=int, default=160)
    p.add_argument("--samples", type=int, default=256)
    p.add_argument("--sd_version", type=str, default="2.0")
    p.add_argument("--profile", type=str, default="", help="trace logdir")
    p.add_argument(
        "--only", type=str, default="", help="comma list: full,render_only,unet_pair,vae_encode"
    )
    p.add_argument("--remat_render", action="store_true",
               help="jax.checkpoint around the render — the KNOWN-PATHOLOGICAL\n               config (make_sds_train_step docstring); off = production default")
    args = p.parse_args()

    import jax

    from voxe_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp
    import optax

    from voxe_tpu.models.sd import StableDiffusion
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.render.rays import cast_rays, flatten_rays
    from voxe_tpu.train.sds import make_sds_train_step
    from voxe_tpu.utils.camera import CameraBounds, CameraIntrinsics

    print(f"devices: {jax.devices()}")
    res, im, samples = args.grid, args.image, args.samples
    from bench import make_dog2_grid

    grid = make_dog2_grid(res)
    render_config = SHVoxGridRenderConfig(
        num_samples_per_ray=samples,
        camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
    )

    t_build = time.perf_counter()
    sd = StableDiffusion(sd_version=args.sd_version, init_mode="zeros")
    print(f"sd build: {time.perf_counter() - t_build:.1f}s")
    text_embeddings = sd.get_text_embeds("a dog made of yarn", "")

    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(grid)
    intrinsics = CameraIntrinsics(im, im, float(im))
    rays = flatten_rays(
        cast_rays(intrinsics, jnp.eye(3), jnp.array([[0.0], [0.0], [4.0]]))
    )
    pixels = jnp.zeros((im * im, 3))
    ref_d = jnp.copy(grid.densities)
    ref_f = jnp.copy(grid.features)
    t = jnp.asarray(500)
    step_key = jax.random.PRNGKey(1)

    which = set(args.only.split(",")) if args.only else {
        "full", "render_only", "unet_pair", "vae_encode"
    }
    results = {}

    def run_step(step, label):
        state = {"g": grid, "o": opt_state}

        def once(carry=None):
            state["g"], state["o"], m = step(
                state["g"], state["o"], sd.params, text_embeddings, rays, pixels,
                ref_d, ref_f, step_key, t,
            )
            return m["total_loss"]

        t0 = time.perf_counter()
        once()  # compile
        print(f"  {label} compile: {time.perf_counter() - t0:.1f}s")
        results[label] = timed(label, once, args.iters)

    if "full" in which:
        step = make_sds_train_step(
            sd, render_config, optimizer, (im, im),
            density_correlation_weight=200.0, tv_density_weight=0.1,
            remat_render=args.remat_render,
        )
        run_step(step, "full")

    if "render_only" in which:
        # NOTE: with do_sds=False the colours are unused -> XLA DCEs the whole
        # render; this measures DCL/TV/Adam only (kept as that control)
        step = make_sds_train_step(
            sd, render_config, optimizer, (im, im), do_sds=False,
            density_correlation_weight=200.0, tv_density_weight=0.1,
        )
        run_step(step, "render_only")

    if "render_grad" in which:
        # render fwd+bwd actually exercised: photometric (uncoupled) loss on
        # the colours, no SD
        step = make_sds_train_step(
            sd, render_config, optimizer, (im, im), do_sds=False,
            uncoupled_mode=True, uncoupled_l2_mode=True,
            density_correlation_weight=1.0, tv_density_weight=0.1,
            remat_render=args.remat_render,
        )
        run_step(step, "render_grad")

    if "render_vae" in which:
        # render -> resize -> VAE encode -> sum(latents^2), grad wrt grid:
        # the full cross-component chain MINUS the UNet
        from voxe_tpu.render.interface import render_sh_voxel_grid
        from voxe_tpu.render.rays import Rays

        size = sd.config.image_size

        @jax.jit
        def render_vae(g, params, k, rays_o, rays_d):
            def loss_fn(g_):
                colours = render_sh_voxel_grid(
                    g_, Rays(rays_o, rays_d), render_config, key=k
                ).colour
                img = colours.reshape(1, im, im, 3)
                img512 = jax.image.resize(img, (1, size, size, 3), method="bilinear")
                latents = sd.encode_imgs(params["vae"], img512, key=k)
                return jnp.sum(latents ** 2)

            return jax.value_and_grad(loss_fn)(g)

        t0 = time.perf_counter()
        jax.block_until_ready(
            render_vae(grid, sd.params, step_key, rays.origins, rays.directions)[0]
        )
        print(f"  render_vae compile: {time.perf_counter() - t0:.1f}s")
        results["render_vae"] = timed(
            "render_vae",
            lambda c: render_vae(
                grid, sd.params, step_key, rays.origins + c, rays.directions
            )[0],
            args.iters,
        )

    if "sds_only" in which:
        # value_and_grad of the SDS loss w.r.t. the rendered image — the SD
        # half of the step in isolation (render/optimizer excluded)
        @jax.jit
        def sds_only(params, img, k, tt):
            def loss_fn(im):
                return sd.sds_loss(params, text_embeddings, im, k, tt, 100.0)

            return jax.value_and_grad(loss_fn)(img)

        img0 = jnp.full((1, im, im, 3), 0.5)
        t0 = time.perf_counter()
        jax.block_until_ready(sds_only(sd.params, img0, step_key, t))
        print(f"  sds_only compile: {time.perf_counter() - t0:.1f}s")
        results["sds_only"] = timed(
            "sds_only",
            lambda c: sds_only(sd.params, img0 + c, step_key, t)[0], args.iters,
        )

    if "vae_grad" in which:
        # fwd+bwd through the VAE encoder alone
        @jax.jit
        def vae_grad(params, img, k):
            def loss_fn(im):
                return jnp.sum(sd.encode_imgs(params, im, key=k) ** 2)

            return jax.value_and_grad(loss_fn)(img)

        size = sd.config.image_size
        imgv = jnp.full((1, size, size, 3), 0.5)
        t0 = time.perf_counter()
        jax.block_until_ready(vae_grad(sd.params["vae"], imgv, step_key))
        print(f"  vae_grad compile: {time.perf_counter() - t0:.1f}s")
        results["vae_grad"] = timed(
            "vae_grad",
            lambda c: vae_grad(sd.params["vae"], imgv + c, step_key)[0], args.iters
        )

    if "unet_pair" in which:
        latent = sd.config.latent_size

        @jax.jit
        def unet_pair(params, lat, tt, ctx):
            noise_pred = sd.unet_noise_pred(params, lat, tt, ctx)
            u, c = jnp.split(noise_pred, 2, axis=0)
            return c + 100.0 * (c - u)

        lat2 = jnp.zeros((2, latent, latent, 4))
        t0 = time.perf_counter()
        jax.block_until_ready(unet_pair(sd.params["unet"], lat2, t, text_embeddings))
        print(f"  unet_pair compile: {time.perf_counter() - t0:.1f}s")
        results["unet_pair"] = timed(
            "unet_pair",
            lambda c: jnp.sum(
                unet_pair(sd.params["unet"], lat2 + c, t, text_embeddings)
            ) * 1e-20,
            args.iters,
        )

    if "vae_encode" in which:
        size = sd.config.image_size

        @jax.jit
        def vae_enc(params, img, k):
            return sd.encode_imgs(params, img, key=k)

        img = jnp.zeros((1, size, size, 3))
        t0 = time.perf_counter()
        jax.block_until_ready(vae_enc(sd.params["vae"], img, step_key))
        print(f"  vae_encode compile: {time.perf_counter() - t0:.1f}s")
        results["vae_encode"] = timed(
            "vae_encode",
            lambda c: jnp.sum(vae_enc(sd.params["vae"], img + c, step_key)) * 1e-20,
            args.iters,
        )

    if args.profile:
        from voxe_tpu.utils.profiling import trace

        step = make_sds_train_step(
            sd, render_config, optimizer, (im, im),
            density_correlation_weight=200.0, tv_density_weight=0.1,
        )
        g, o = grid, opt_state
        # compiled above or now; one warm step outside the trace
        g, o, m = step(g, o, sd.params, text_embeddings, rays, pixels, ref_d, ref_f, step_key, t)
        jax.block_until_ready(m["total_loss"])
        with trace(args.profile):
            for _ in range(5):
                g, o, m = step(
                    g, o, sd.params, text_embeddings, rays, pixels, ref_d, ref_f,
                    step_key, t,
                )
            jax.block_until_ready(m["total_loss"])

    print(json.dumps({k: v * 1e3 for k, v in results.items()}))


if __name__ == "__main__":
    main()
