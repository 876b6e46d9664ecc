"""Same-hardware measured comparison: reference (torch) vs voxe_tpu recon step.

The recon-mode `vs_baseline` in bench.py divides by an ESTIMATE of the
reference's GPU throughput (no number is published). This harness removes
the cross-hardware guesswork for the ALGORITHMIC comparison: it runs one
training iteration of the SAME working set — render N rays x S samples from
an R^3 softplus SH grid, L1 loss, backward, Adam — through the actual
reference implementation (/root/reference, torch CPU) and through voxe_tpu's
exact-renderer step (jax CPU), on this host's CPU, identical deterministic
sampling. Reports it/s and the measured ratio (recorded in BASELINE.md).

Run:  VOXE_PLATFORM=cpu python tools/bench_reference_cpu.py
"""
from __future__ import annotations

import functools
import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE = Path("/root/reference")

RES = 64
NUM_RAYS = 8192
NUM_SAMPLES = 64
ITERS = 10
SCALE = 13.37


def _inputs():
    import numpy as np

    rng = np.random.default_rng(7)
    densities = rng.uniform(-1, 1, (RES, RES, RES, 1)).astype(np.float32)
    features = rng.uniform(-1, 1, (RES, RES, RES, 3)).astype(np.float32)
    origins = np.tile(np.array([[0.3, -0.2, 4.0]], np.float32), (NUM_RAYS, 1))
    dirs = rng.normal(size=(NUM_RAYS, 3)).astype(np.float32)
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 0.5
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pixels = rng.uniform(0, 1, (NUM_RAYS, 3)).astype(np.float32)
    return densities, features, origins, dirs, pixels


def bench_reference() -> float:
    import torch

    # stub the reference's unused yaml/easydict imports (as the parity tests do)
    if "yaml" not in sys.modules:
        stub = types.ModuleType("yaml")
        stub.dump = stub.safe_dump = lambda *a, **k: ""
        stub.load = stub.safe_load = lambda *a, **k: {}
        sys.modules["yaml"] = stub
    if "easydict" not in sys.modules:
        from voxe_tpu.utils.misc import EasyDict

        stub = types.ModuleType("easydict")
        stub.EasyDict = EasyDict
        sys.modules["easydict"] = stub
    sys.path.insert(0, str(REFERENCE))
    from thre3d_atom.rendering.volumetric.accumulate import (
        accumulate_radiance_density_on_rays,
    )
    from thre3d_atom.rendering.volumetric.process import (
        process_points_with_sh_voxel_grid,
    )
    from thre3d_atom.rendering.volumetric.render_interface import Rays, render
    from thre3d_atom.rendering.volumetric.sample import (
        sample_uniform_points_on_rays,
    )
    from thre3d_atom.thre3d_reprs.voxels import VoxelGrid, VoxelSize
    from thre3d_atom.utils.imaging_utils import CameraBounds

    densities, features, origins, dirs, pixels = _inputs()
    vs = 3.0 / RES
    grid = VoxelGrid(
        densities=torch.from_numpy(densities.copy()),
        features=torch.from_numpy(features.copy()),
        voxel_size=VoxelSize(vs, vs, vs),
        density_preactivation=torch.nn.Identity(),
        density_postactivation=torch.nn.Softplus(),
        expected_density_scale=SCALE,
        tunable=True,  # nn.Parameters (reference voxels.py:112-114)
    )
    rays = Rays(
        origins=torch.from_numpy(origins.copy()),
        directions=torch.from_numpy(dirs.copy()),
    )
    target = torch.from_numpy(pixels.copy())
    optimizer = torch.optim.Adam(grid.parameters(), lr=0.03)

    def step():
        optimizer.zero_grad()
        out = render(
            rays,
            camera_bounds=CameraBounds(2.0, 6.0),
            num_samples=NUM_SAMPLES,
            sampler_fn=functools.partial(sample_uniform_points_on_rays, perturb=False),
            point_processor_fn=functools.partial(
                process_points_with_sh_voxel_grid, voxel_grid=grid,
                render_diffuse=False,
            ),
            accumulator_fn=functools.partial(
                accumulate_radiance_density_on_rays,
                stochastic_density_noise_std=0.0,
                white_bkgd=True,
            ),
        )
        loss = torch.nn.functional.l1_loss(out.colour, target)
        loss.backward()
        optimizer.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(ITERS):
        step()
    return (time.perf_counter() - t0) / ITERS


def bench_ours() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
    from voxe_tpu.render.interface import SHVoxGridRenderConfig, render_sh_voxel_grid
    from voxe_tpu.render.rays import Rays
    from voxe_tpu.utils.camera import CameraBounds

    densities, features, origins, dirs, pixels = _inputs()
    vs = 3.0 / RES
    grid = VoxelGrid(
        jnp.asarray(densities),
        jnp.asarray(features),
        VoxelGridConfig(
            voxel_size=VoxelSize(vs, vs, vs),
            density_preactivation="identity",
            density_postactivation="softplus",
            expected_density_scale=SCALE,
        ),
    )
    rays = Rays(jnp.asarray(origins), jnp.asarray(dirs))
    target = jnp.asarray(pixels)
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=NUM_SAMPLES,
        camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
        perturb_sampled_points=False,
    )
    optimizer = optax.adam(0.03)
    opt_state = optimizer.init(grid)

    @jax.jit
    def step(g, o):
        def loss_fn(g_):
            out = render_sh_voxel_grid(g_, rays, config)
            return jnp.mean(jnp.abs(out.colour - target))

        grads = jax.grad(loss_fn)(g)
        updates, o2 = optimizer.update(grads, o, g)
        return optax.apply_updates(g, updates), o2

    g, o = step(grid, opt_state)  # compile+warmup
    _ = np.asarray(g.densities.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        g, o = step(g, o)
    _ = np.asarray(g.densities.ravel()[:1])
    return (time.perf_counter() - t0) / ITERS


def bench_ours_shearwarp() -> float:
    """Shear-warp step at the matched working set: a (90, 91) base frame is
    ~8190 pixels and the 64^3 grid gives exactly 64 slices per pixel."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.render.shearwarp import render_shear_warp
    from voxe_tpu.utils.camera import CameraBounds, pose_spherical

    densities, features, _, _, _ = _inputs()
    vs = 3.0 / RES
    grid = VoxelGrid(
        jnp.asarray(densities),
        jnp.asarray(features),
        VoxelGridConfig(
            voxel_size=VoxelSize(vs, vs, vs),
            density_preactivation="identity",
            density_postactivation="softplus",
            expected_density_scale=SCALE,
        ),
    )
    base_hw = (90, 91)
    rng = np.random.default_rng(7)
    target = jnp.asarray(
        rng.uniform(0, 1, (base_hw[0] * base_hw[1], 3)).astype(np.float32)
    )
    pose = pose_spherical(30.0, 40.0, 4.0)
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=NUM_SAMPLES,
        camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
        perturb_sampled_points=False,
    )
    optimizer = optax.adam(0.03)
    opt_state = optimizer.init(grid)

    @jax.jit
    def step(g, o):
        def loss_fn(g_):
            out, _ = render_shear_warp(g_, pose, config, base_hw=base_hw)
            return jnp.mean(jnp.abs(out.colour - target))

        grads = jax.grad(loss_fn)(g)
        updates, o2 = optimizer.update(grads, o, g)
        return optax.apply_updates(g, updates), o2

    g, o = step(grid, opt_state)
    _ = np.asarray(g.densities.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        g, o = step(g, o)
    _ = np.asarray(g.densities.ravel()[:1])
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    print(
        f"working set: {RES}^3 grid, {NUM_RAYS} rays x {NUM_SAMPLES} samples, "
        f"L1 + backward + Adam, {ITERS} iters, CPU"
    )
    ref_s = bench_reference()
    print(f"  reference exact (torch CPU): {ref_s * 1e3:8.1f} ms/iter")
    ours_s = bench_ours()
    print(f"  voxe_tpu exact  (jax   CPU): {ours_s * 1e3:8.1f} ms/iter"
          f"   ({ref_s / ours_s:.2f}x vs reference)")
    sw_s = bench_ours_shearwarp()
    print(f"  voxe_tpu shear-warp (jax CPU): {sw_s * 1e3:6.1f} ms/iter"
          f"   ({ref_s / sw_s:.2f}x vs reference)")


if __name__ == "__main__":
    main()
