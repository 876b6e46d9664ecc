"""Render-core unit tests: SH, sampling, ray-AABB, compositing, full pipeline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
from voxe_tpu.render.accumulate import accumulate_radiance_density_on_rays
from voxe_tpu.render.interface import SHVoxGridRenderConfig, render_sh_voxel_grid
from voxe_tpu.render.rays import Rays, cast_rays, flatten_rays
from voxe_tpu.render.sample import (
    ray_aabb_intersection,
    sample_uniform_points_on_rays,
)
from voxe_tpu.render.sh import C0, evaluate_spherical_harmonics
from voxe_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical
from voxe_tpu.grid.voxels import AxisAlignedBoundingBox


def test_sh_degree0_is_constant():
    coeffs = jnp.ones((10, 3, 1)) * 2.0
    dirs = jax.random.normal(jax.random.PRNGKey(0), (10, 3))
    out = evaluate_spherical_harmonics(0, coeffs, dirs)
    np.testing.assert_allclose(np.asarray(out), 2.0 * C0, rtol=1e-6)


def test_sh_degree1_linear_in_direction():
    # coefficient only on the z-linear band (index 2): result = C0*c0 + C1*z*c2
    coeffs = jnp.zeros((1, 1, 4)).at[..., 2].set(1.0)
    up = jnp.array([[0.0, 0.0, 1.0]])
    down = -up
    out_up = evaluate_spherical_harmonics(1, coeffs, up)
    out_down = evaluate_spherical_harmonics(1, coeffs, down)
    np.testing.assert_allclose(np.asarray(out_up), -np.asarray(out_down), rtol=1e-6)


def test_uniform_sampling_bounds_and_spacing(key):
    rays = Rays(jnp.zeros((4, 3)), jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1)))
    out = sample_uniform_points_on_rays(
        rays, CameraBounds(2.0, 6.0), num_samples=16, perturb=False
    )
    assert out.depths.shape == (4, 16)
    np.testing.assert_allclose(np.asarray(out.depths[:, 0]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depths[:, -1]), 6.0, rtol=1e-6)
    # perturbed samples stay within bounds and are monotone-ish (stratified)
    out_p = sample_uniform_points_on_rays(
        rays, CameraBounds(2.0, 6.0), num_samples=16, perturb=True, key=key
    )
    d = np.asarray(out_p.depths)
    assert (d >= 2.0 - 1e-5).all() and (d <= 6.0 + 1e-5).all()
    assert (np.diff(d, axis=-1) > -1e-4).all()


def test_ray_aabb_intersection_hits_and_misses():
    aabb = AxisAlignedBoundingBox((-1.0, 1.0), (-1.0, 1.0), (-1.0, 1.0))
    origins = jnp.array([[0.0, 0.0, 4.0], [3.0, 3.0, 4.0]])
    directions = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    bounds, hit = ray_aabb_intersection(
        Rays(origins, directions), CameraBounds(0.5, 10.0), aabb
    )
    assert bool(hit[0, 0]) and not bool(hit[1, 0])
    # the interval is expanded outward by 1e-3 of its span (see
    # ray_aabb_intersection docstring) so boundary samples get masked
    np.testing.assert_allclose(np.asarray(bounds[0]), [3.0, 5.0], atol=5e-3)
    np.testing.assert_allclose(np.asarray(bounds[1]), [0.5, 10.0], rtol=1e-5)


def test_compositing_analytic_single_opaque_sample():
    # one ray, two samples: the first is opaque enough to absorb everything.
    # radiance logit large -> colour ~ 1 for sample 0, ~0 for sample 1.
    processed = jnp.array(
        [[[20.0, 20.0, 20.0, 1e6], [-20.0, -20.0, -20.0, 1e6]]]
    )  # [1, 2, 4]
    depths = jnp.array([[2.0, 3.0]])
    rays = Rays(jnp.zeros((1, 3)), jnp.array([[0.0, 0.0, -1.0]]))
    out = accumulate_radiance_density_on_rays(
        processed, depths, rays, white_bkgd=False
    )
    np.testing.assert_allclose(np.asarray(out.colour), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), 2.0, atol=1e-4)


def test_compositing_empty_space_gives_background():
    processed = jnp.zeros((1, 8, 4)) - jnp.array([0.0, 0.0, 0.0, 0.0])
    processed = processed.at[..., :3].set(-1e10)  # -inf radiance
    depths = jnp.tile(jnp.linspace(2.0, 6.0, 8)[None], (1, 1))
    rays = Rays(jnp.zeros((1, 3)), jnp.array([[0.0, 0.0, -1.0]]))
    out_white = accumulate_radiance_density_on_rays(
        processed, depths, rays, white_bkgd=True, background_value=1.0
    )
    np.testing.assert_allclose(np.asarray(out_white.colour), 1.0, atol=1e-5)
    out_black = accumulate_radiance_density_on_rays(
        processed, depths, rays, white_bkgd=True, background_value=0.0
    )
    np.testing.assert_allclose(np.asarray(out_black.colour), 0.0, atol=1e-5)


def _solid_grid(res=8, world=3.0, value=10.0):
    config = VoxelGridConfig(
        voxel_size=VoxelSize(world / res, world / res, world / res),
        density_preactivation="identity",
        density_postactivation="relu",
        expected_density_scale=1.0,
    )
    densities = jnp.full((res, res, res, 1), value)
    features = jnp.zeros((res, res, res, 3))  # sigmoid(0)=0.5 grey
    return VoxelGrid(densities, features, config)


def test_full_render_solid_cube_center_grey():
    grid = _solid_grid()
    intr = CameraIntrinsics(32, 32, 20.0)
    pose = pose_spherical(30.0, 45.0, 4.0)
    rays = flatten_rays(
        cast_rays(intr, jnp.asarray(pose.rotation), jnp.asarray(pose.translation))
    )
    cfg = SHVoxGridRenderConfig(
        num_samples_per_ray=128, camera_bounds=CameraBounds(2.0, 6.0), white_bkgd=True
    )
    out = render_sh_voxel_grid(grid, rays, cfg, key=None)
    img = np.asarray(out.colour).reshape(32, 32, 3)
    # center pixel hits the solid grey cube
    np.testing.assert_allclose(img[16, 16], 0.5, atol=0.02)
    # corner pixel misses -> white background
    np.testing.assert_allclose(img[0, 0], 1.0, atol=0.02)


def test_render_is_jittable_and_differentiable(key):
    grid = _solid_grid(res=4)
    rays = Rays(
        jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (16, 1)),
        jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (16, 1)),
    )
    cfg = SHVoxGridRenderConfig(
        num_samples_per_ray=32, camera_bounds=CameraBounds(2.0, 6.0)
    )

    @jax.jit
    def loss_fn(g, k):
        out = render_sh_voxel_grid(g, rays, cfg, key=k)
        return jnp.mean(out.colour)

    grads = jax.grad(lambda g: loss_fn(g, key))(grid)
    assert np.isfinite(np.asarray(grads.densities)).all()
    assert np.isfinite(np.asarray(grads.features)).all()
    assert float(jnp.abs(grads.densities).sum()) > 0.0
