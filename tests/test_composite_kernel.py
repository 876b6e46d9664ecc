"""Pallas fused-compositing kernel vs jnp reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import voxe_tpu.ops.composite as composite_mod
from voxe_tpu.ops.composite import (
    composite_weights,
    composite_weights_reference,
)


@pytest.fixture(autouse=True)
def _interpret_mode():
    composite_mod._FORCE_INTERPRET = True
    yield
    composite_mod._FORCE_INTERPRET = False


def _random_inputs(n=64, s=128, seed=0):
    rng = np.random.default_rng(seed)
    density = jnp.asarray(rng.uniform(0, 5, (n, s)).astype(np.float32))
    depths = jnp.asarray(np.sort(rng.uniform(2, 6, (n, s)).astype(np.float32), axis=-1))
    dirn = jnp.asarray(rng.uniform(0.9, 1.4, (n,)).astype(np.float32))
    return density, depths, dirn


def test_kernel_matches_reference():
    density, depths, dirn = _random_inputs()
    w_k, acc_k = composite_weights(density, depths, dirn)
    w_r, acc_r = composite_weights_reference(density, depths, dirn)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc_k), np.asarray(acc_r), rtol=1e-5, atol=1e-6)


def test_kernel_handles_nonaligned_tile_rows():
    # N not a multiple of the tile height -> padding path
    density, depths, dirn = _random_inputs(n=37)
    w_k, acc_k = composite_weights(density, depths, dirn)
    w_r, acc_r = composite_weights_reference(density, depths, dirn)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc_k), np.asarray(acc_r), rtol=1e-5, atol=1e-6)


def test_custom_vjp_matches_reference_grad():
    density, depths, dirn = _random_inputs(n=16)

    def loss_kernel(d):
        w, acc = composite_weights(d, depths, dirn)
        return jnp.sum(w * w) + jnp.sum(acc)

    def loss_ref(d):
        w, acc = composite_weights_reference(d, depths, dirn)
        return jnp.sum(w * w) + jnp.sum(acc)

    g_k = jax.grad(loss_kernel)(density)
    g_r = jax.grad(loss_ref)(density)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r), rtol=1e-4, atol=1e-6)


def test_fused_render_path_matches_reference_path(key):
    """End-to-end: use_fused_kernel render == plain render (deterministic)."""
    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
    from voxe_tpu.render.interface import SHVoxGridRenderConfig, render_sh_voxel_grid
    from voxe_tpu.render.rays import Rays
    from voxe_tpu.utils.camera import CameraBounds

    res = 16
    k1, k2 = jax.random.split(key)
    grid = VoxelGrid(
        jax.random.normal(k1, (res, res, res, 1)),
        jax.random.normal(k2, (res, res, res, 3)),
        VoxelGridConfig(
            voxel_size=VoxelSize(*[3.0 / res] * 3),
            density_preactivation="identity",
            density_postactivation="softplus",
        ),
    )
    rays = Rays(
        jnp.tile(jnp.array([[0.0, 0.5, 4.0]]), (32, 1)),
        jnp.tile(jnp.array([[0.05, -0.1, -1.0]]), (32, 1)),
    )
    base = SHVoxGridRenderConfig(
        num_samples_per_ray=128,
        camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
        perturb_sampled_points=False,
    )
    out_ref = render_sh_voxel_grid(grid, rays, base, key=None)
    out_fused = render_sh_voxel_grid(
        grid, rays, base.replace(use_fused_kernel=True), key=None
    )
    np.testing.assert_allclose(
        np.asarray(out_fused.colour), np.asarray(out_ref.colour), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_fused.depth), np.asarray(out_ref.depth), rtol=1e-4, atol=1e-4
    )


def test_fused_accumulate_padding_matches_unfused():
    """accumulate(use_fused_kernel=True) pads the sample axis to lane
    alignment with zero-density samples whose depths realize the requested
    final-delta semantics; results must match the plain jnp path exactly
    (here S=160 — the shear-warp slice count — and both delta modes).
    Interpret mode runs the REAL Pallas kernel on CPU."""
    from voxe_tpu.render.accumulate import accumulate_radiance_density_on_rays
    from voxe_tpu.render.rays import Rays

    rng = np.random.default_rng(3)
    n, s = 48, 160
    radiance = jnp.asarray(rng.normal(size=(n, s, 3)).astype(np.float32))
    density = jnp.asarray(rng.uniform(0, 5, (n, s)).astype(np.float32))
    processed = jnp.concatenate([radiance, density[..., None]], axis=-1)
    depths = jnp.asarray(
        np.sort(rng.uniform(2, 6, (n, s)).astype(np.float32), axis=-1)
    )
    dirs = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    rays = Rays(jnp.zeros((n, 3)), dirs)

    for mode in ("slab", "inf"):
        plain = accumulate_radiance_density_on_rays(
            processed, depths, rays, white_bkgd=True, final_delta=mode
        )
        fused = accumulate_radiance_density_on_rays(
            processed, depths, rays, white_bkgd=True, final_delta=mode,
            use_fused_kernel=True,
        )
        np.testing.assert_allclose(
            np.asarray(plain.colour), np.asarray(fused.colour),
            rtol=1e-5, atol=1e-5, err_msg=mode,
        )
        np.testing.assert_allclose(
            np.asarray(plain.depth), np.asarray(fused.depth),
            rtol=1e-4, atol=1e-4, err_msg=mode,
        )


def test_shearwarp_fused_kernel_grads_match():
    """Shear-warp render with use_fused_kernel: image and grid gradients
    match the unfused path (custom VJP is exact)."""
    from voxe_tpu.data.synthetic import make_demo_grid
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.render.shearwarp import render_shear_warp
    from voxe_tpu.utils.camera import CameraBounds, pose_spherical

    grid = make_demo_grid(res=24)
    pose = pose_spherical(40.0, 30.0, 4.0)

    def loss(g, fused):
        cfg = SHVoxGridRenderConfig(
            num_samples_per_ray=48,
            camera_bounds=CameraBounds(0.5, 10.0),
            white_bkgd=True,
            use_fused_kernel=fused,
        )
        out, _ = render_shear_warp(g, pose, cfg, base_hw=(32, 32))
        return jnp.mean(out.colour ** 2)

    v0, g0 = jax.value_and_grad(lambda g: loss(g, False))(grid)
    v1, g1 = jax.value_and_grad(lambda g: loss(g, True))(grid)
    assert abs(float(v0) - float(v1)) < 1e-6
    np.testing.assert_allclose(
        np.asarray(g0.densities), np.asarray(g1.densities), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g0.features), np.asarray(g1.features), rtol=1e-4, atol=1e-6
    )
