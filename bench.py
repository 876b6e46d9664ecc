"""Benchmark: reconstruction-training ray throughput (rays/sec/chip).

Measures the recon hot loop — the jitted train step (dual-render fwd + bwd +
Adam) at the reference's default working set: 32768 rays x 256 samples/ray on
a 160^3 softplus-field grid, sh_degree 0 (reference defaults:
train_sh_based_voxel_grid_with_posed_images.py:92-99).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` compares against an ESTIMATED reference throughput on its own
hardware (RTX A5000): the reference recon trainer runs its hot loop at ~10
it/s at 32768 rays/iter (ReLU-fields-class trainers; no number is published in
the repo — BASELINE.md notes published=={}), i.e. ~0.33M rays/s. Revisit when
a measured reference number exists.
"""
import json
import logging
import os
import sys
import time

# keep stdout to exactly one JSON line: route all logging to stderr
logging.basicConfig(stream=sys.stderr, level=logging.WARNING, force=True)

REFERENCE_RAYS_PER_SEC_EST = 0.33e6


def main() -> None:
    import jax

    # persistent compilation cache: makes the benchmark robust to slow/flaky
    # remote-compile services — any prior successful compile is reused
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import optax

    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.train.recon import make_recon_train_step
    from voxe_tpu.utils.camera import CameraBounds, CameraIntrinsics
    from voxe_tpu.utils.misc import (
        compute_expected_density_scale_for_relu_field_grid,
    )

    res = 160
    ray_batch = 32768
    num_samples = 256
    image_size = 256  # ray pool resolution (pixels are synthetic)
    num_images = 8

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    config = VoxelGridConfig(
        voxel_size=VoxelSize(*[3.0 / res] * 3),
        density_preactivation="identity",
        density_postactivation="softplus",
        gather_dtype="bfloat16",  # the TPU-native default (quality-neutral)
        expected_density_scale=compute_expected_density_scale_for_relu_field_grid(
            (3.0, 3.0, 3.0)
        ),
    )
    grid = VoxelGrid(
        densities=jax.random.uniform(k1, (res, res, res, 1), minval=-1.0, maxval=1.0),
        features=jax.random.uniform(k2, (res, res, res, 3), minval=-1.0, maxval=1.0),
        config=config,
    )
    render_config = SHVoxGridRenderConfig(
        num_samples_per_ray=num_samples,
        camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
        # VOXE_FUSED_KERNEL=1 measures the Pallas compositing kernel path
        use_fused_kernel=os.environ.get("VOXE_FUSED_KERNEL", "0") == "1",
    )
    optimizer = optax.adam(0.03)
    opt_state = optimizer.init(grid)
    intrinsics = CameraIntrinsics(image_size, image_size, float(image_size))

    step = make_recon_train_step(
        intrinsics, render_config, optimizer, ray_batch_size=ray_batch, donate=False
    )

    images = jnp.zeros((num_images, image_size, image_size, 3))
    poses = (
        jnp.tile(jnp.eye(3, 4)[None], (num_images, 1, 1)).at[:, 2, 3].set(4.0)
    )
    batch_idx = jnp.arange(num_images)

    import numpy as np

    # warmup / compile. NOTE: on relayed TPU transports block_until_ready can
    # return before device execution finishes (verified with profiler traces,
    # BENCHMARKS.md "measurement truth"); a device->host fetch of the result
    # is the only hard barrier, so all timing here drains through one.
    g, s, m = step(grid, opt_state, images, poses, batch_idx, jax.random.PRNGKey(1))
    _ = np.asarray(g.densities.ravel()[:1])

    iters = int(os.environ.get("VOXE_BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for i in range(iters):
        g, s, m = step(g, s, images, poses, batch_idx, jax.random.PRNGKey(i))
    _ = np.asarray(g.densities.ravel()[:1])  # hard barrier
    elapsed = time.perf_counter() - t0

    rays_per_sec = ray_batch * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "recon_train_rays_per_sec_per_chip",
                "value": round(rays_per_sec),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC_EST, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
