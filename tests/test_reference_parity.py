"""Numerical parity against the actual reference (torch) renderer.

Loads the reference implementation from /root/reference (read-only, CPU
torch), renders the SAME voxel grid along the SAME rays with deterministic
sampling in both frameworks, and requires near-float-exact agreement. This is
the ground-truth check that our grid_sample semantics, SH evaluation, and
compositing match the reference bit-for-bit up to float reassociation.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def reference_modules():
    torch = pytest.importorskip("torch")

    # the reference imports yaml/easydict (not installed here); stub them —
    # only the render-path modules are exercised, which don't use either
    import types

    if "yaml" not in sys.modules:
        yaml_stub = types.ModuleType("yaml")
        yaml_stub.dump = yaml_stub.safe_dump = lambda *a, **k: ""
        yaml_stub.load = yaml_stub.safe_load = lambda *a, **k: {}
        sys.modules["yaml"] = yaml_stub
    if "easydict" not in sys.modules:
        from voxe_tpu.utils.misc import EasyDict

        easydict_stub = types.ModuleType("easydict")
        easydict_stub.EasyDict = EasyDict
        sys.modules["easydict"] = easydict_stub

    sys.path.insert(0, str(REFERENCE))
    from thre3d_atom.rendering.volumetric.render_interface import render
    from thre3d_atom.rendering.volumetric.sample import (
        sample_uniform_points_on_rays,
    )
    from thre3d_atom.rendering.volumetric.process import (
        process_points_with_sh_voxel_grid,
    )
    from thre3d_atom.rendering.volumetric.accumulate import (
        accumulate_radiance_density_on_rays,
    )
    from thre3d_atom.rendering.volumetric.render_interface import Rays as TorchRays
    from thre3d_atom.thre3d_reprs.voxels import VoxelGrid as TorchVoxelGrid, VoxelSize
    from thre3d_atom.utils.imaging_utils import CameraBounds as TorchBounds

    return dict(
        torch=torch,
        render=render,
        sample=sample_uniform_points_on_rays,
        process=process_points_with_sh_voxel_grid,
        accumulate=accumulate_radiance_density_on_rays,
        TorchRays=TorchRays,
        TorchVoxelGrid=TorchVoxelGrid,
        VoxelSize=VoxelSize,
        TorchBounds=TorchBounds,
    )


@pytest.mark.parametrize("sh_degree", [0, 2])
def test_render_matches_reference(reference_modules, sh_degree):
    import functools

    import jax.numpy as jnp

    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
    from voxe_tpu.render.interface import SHVoxGridRenderConfig, render_sh_voxel_grid
    from voxe_tpu.render.rays import Rays
    from voxe_tpu.utils.camera import CameraBounds

    m = reference_modules
    torch = m["torch"]

    res = 12
    feat = 3 * (sh_degree + 1) ** 2
    rng = np.random.default_rng(7)
    densities = rng.uniform(-1, 1, (res, res, res, 1)).astype(np.float32)
    features = rng.uniform(-1, 1, (res, res, res, feat)).astype(np.float32)

    num_rays = 64
    origins = np.tile(np.array([[0.3, -0.2, 4.0]], np.float32), (num_rays, 1))
    dirs = rng.normal(size=(num_rays, 3)).astype(np.float32)
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 0.5  # point at the volume
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    scale = 13.37
    vs = 3.0 / res

    # ---- reference (torch) render, deterministic sampling
    tgrid = m["TorchVoxelGrid"](
        densities=torch.from_numpy(densities.copy()),
        features=torch.from_numpy(features.copy()),
        voxel_size=m["VoxelSize"](vs, vs, vs),
        density_preactivation=torch.nn.Identity(),
        density_postactivation=torch.nn.Softplus(),
        expected_density_scale=scale,
    )
    trays = m["TorchRays"](
        origins=torch.from_numpy(origins.copy()),
        directions=torch.from_numpy(dirs.copy()),
    )
    with torch.no_grad():
        ref_out = m["render"](
            trays,
            camera_bounds=m["TorchBounds"](2.0, 6.0),
            num_samples=48,
            sampler_fn=functools.partial(m["sample"], perturb=False),
            point_processor_fn=functools.partial(
                m["process"], voxel_grid=tgrid, render_diffuse=False
            ),
            accumulator_fn=functools.partial(
                m["accumulate"],
                stochastic_density_noise_std=0.0,
                white_bkgd=True,
            ),
        )
    ref_colour = ref_out.colour.numpy()
    ref_depth = ref_out.depth.numpy()

    # ---- ours (jax), identical configuration
    grid = VoxelGrid(
        jnp.asarray(densities),
        jnp.asarray(features),
        VoxelGridConfig(
            voxel_size=VoxelSize(vs, vs, vs),
            density_preactivation="identity",
            density_postactivation="softplus",
            expected_density_scale=scale,
        ),
    )
    ours = render_sh_voxel_grid(
        grid,
        Rays(jnp.asarray(origins), jnp.asarray(dirs)),
        SHVoxGridRenderConfig(
            num_samples_per_ray=48,
            camera_bounds=CameraBounds(2.0, 6.0),
            perturb_sampled_points=False,
            white_bkgd=True,
        ),
        key=None,
    )

    np.testing.assert_allclose(
        np.asarray(ours.colour), ref_colour, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours.depth), ref_depth, rtol=2e-3, atol=2e-3
    )


def test_attn_render_matches_reference(reference_modules):
    """The attention-channel render path vs the reference's render_attn
    (forward_attn + black-background compositing)."""
    import functools

    import jax.numpy as jnp

    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
    from voxe_tpu.render.interface import (
        SHVoxGridRenderConfig,
        render_sh_voxel_grid_attn,
    )
    from voxe_tpu.render.rays import Rays
    from voxe_tpu.utils.camera import CameraBounds

    m = reference_modules
    torch = m["torch"]
    from thre3d_atom.rendering.volumetric.render_interface import render_attn
    from thre3d_atom.rendering.volumetric.process import (
        process_points_with_sh_voxel_grid_attn,
    )
    from thre3d_atom.rendering.volumetric.accumulate import (
        accumulate_radiance_density_on_rays_attn,
    )

    res = 10
    rng = np.random.default_rng(11)
    densities = rng.uniform(-1, 1, (res, res, res, 1)).astype(np.float32)
    features = rng.uniform(-1, 1, (res, res, res, 3)).astype(np.float32)
    attn = rng.uniform(-2, 2, (res, res, res, 1)).astype(np.float32)

    num_rays = 32
    origins = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (num_rays, 1))
    dirs = rng.normal(size=(num_rays, 3)).astype(np.float32)
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 0.5
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    vs = 3.0 / res
    tgrid = m["TorchVoxelGrid"](
        densities=torch.from_numpy(densities.copy()),
        features=torch.from_numpy(features.copy()),
        voxel_size=m["VoxelSize"](vs, vs, vs),
        density_preactivation=torch.nn.Identity(),
        density_postactivation=torch.nn.Softplus(),
        expected_density_scale=5.0,
        attn=torch.from_numpy(attn.copy()),
    )
    trays = m["TorchRays"](
        origins=torch.from_numpy(origins.copy()),
        directions=torch.from_numpy(dirs.copy()),
    )
    with torch.no_grad():
        ref_out = render_attn(
            trays,
            camera_bounds=m["TorchBounds"](2.0, 6.0),
            num_samples=32,
            sampler_fn=functools.partial(m["sample"], perturb=False),
            point_processor_fn=functools.partial(
                process_points_with_sh_voxel_grid_attn,
                voxel_grid=tgrid,
                render_diffuse=False,
            ),
            accumulator_fn=functools.partial(
                accumulate_radiance_density_on_rays_attn,
                stochastic_density_noise_std=0.0,
                white_bkgd=True,
            ),
        )
    ref_attn = ref_out.attn.numpy()

    grid = VoxelGrid(
        jnp.asarray(densities),
        jnp.asarray(features),
        VoxelGridConfig(
            voxel_size=VoxelSize(vs, vs, vs),
            density_preactivation="identity",
            density_postactivation="softplus",
            expected_density_scale=5.0,
        ),
        attn=jnp.asarray(attn),
    )
    ours = render_sh_voxel_grid_attn(
        grid,
        Rays(jnp.asarray(origins), jnp.asarray(dirs)),
        SHVoxGridRenderConfig(
            num_samples_per_ray=32,
            camera_bounds=CameraBounds(2.0, 6.0),
            perturb_sampled_points=False,
            white_bkgd=True,
        ),
        key=None,
    )
    np.testing.assert_allclose(
        np.asarray(ours.colour), ref_attn.reshape(num_rays, -1), rtol=5e-4, atol=5e-4
    )
