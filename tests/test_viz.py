"""Visualization smoke tests: depth postprocessing, feedback panels, paths."""
import numpy as np
import pytest

from voxe_tpu.utils.camera import (
    get_thre360_animation_poses,
    get_thre360_spiral_animation_poses,
    pose_spherical,
)
from voxe_tpu.viz.static import postprocess_depth_map


def test_postprocess_depth_map_shapes_and_range():
    rng = np.random.default_rng(0)
    depth = rng.uniform(2, 6, (16, 16, 1)).astype(np.float32)
    acc = rng.uniform(0, 1, (16, 16, 1)).astype(np.float32)
    out = postprocess_depth_map(depth, acc_map=acc)
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8
    out2 = postprocess_depth_map(depth)
    assert out2.shape == (16, 16, 3)


def test_thre360_poses_are_on_sphere():
    poses = get_thre360_animation_poses(4.0, 60.0, 10)
    assert len(poses) == 9  # last dropped for loop smoothness
    for p in poses:
        assert np.linalg.norm(p.translation) == pytest.approx(4.0, rel=1e-5)
        assert np.linalg.det(p.rotation) == pytest.approx(1.0, abs=1e-5)


def test_spiral_poses_radii_increase():
    poses = get_thre360_spiral_animation_poses((0.5, 4.0), 3.0, 2, 8)
    radii = [np.linalg.norm(p.translation) for p in poses]
    assert radii[0] < radii[-1]


def test_pose_spherical_looks_at_origin():
    pose = pose_spherical(123.0, 47.0, 5.0)
    # camera -z axis (third rotation column negated) points at the origin
    view_dir = -pose.rotation[:, 2]
    to_origin = -pose.translation[:, 0]
    to_origin = to_origin / np.linalg.norm(to_origin)
    np.testing.assert_allclose(view_dir, to_origin, atol=1e-5)


def test_refinement_diagnostics_pngs(tmp_path):
    """The reference's refinement wandb visualizations exist as PNG dumps
    (refinement_functions.py:19-174)."""
    from voxe_tpu.viz.refinement import (
        plot_attn_scatter,
        visualize_attention_maps,
        visualize_attn_render_diagnostics,
        visualize_render_diff,
    )

    rng = np.random.default_rng(0)
    e_map = rng.random((24, 24)).astype(np.float32)
    o_map = rng.random((24, 24)).astype(np.float32)
    visualize_attention_maps(e_map, o_map, 7, tmp_path)
    render = rng.standard_normal((24, 24)).astype(np.float32)
    visualize_attn_render_diagnostics(render, e_map, "edit", 7, tmp_path)
    visualize_render_diff(render, -render, 7, tmp_path)
    plot_attn_scatter(
        locations=rng.integers(0, 16, (200, 3)),
        features=rng.random((200, 3)),
        edit_attn=rng.random(200),
        object_attn=rng.random(200),
        cluster_ids=rng.integers(0, 2, 200),
        step=7,
        out_dir=tmp_path,
    )
    expected = [
        "edit_attn_map_7.png", "object_attn_map_7.png", "diff_attn_map_7.png",
        "mask_edit_7.png", "pred_attn_edit_7.png", "diff_masked_edit_7.png",
        "render_diff_7.png", "scatter3d_locations_7.png",
        "scatter3d_features_7.png", "scatter3d_ids_7.png",
    ]
    for name in expected:
        p = tmp_path / name
        assert p.exists() and p.stat().st_size > 0, name


def test_get_edit_region_writes_scatters(tmp_path):
    """get_edit_region(viz_dir=...) emits the cluster scatter set."""
    import jax.numpy as jnp

    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.seg.graphcut import get_edit_region
    from voxe_tpu.utils.camera import CameraBounds

    res = 10
    rng = np.random.default_rng(1)
    dens = np.full((res, res, res, 1), -5.0, np.float32)
    dens[3:7, 3:7, 3:7] = 10.0
    feats = rng.standard_normal((res, res, res, 3)).astype(np.float32)
    edit_attn = np.zeros((res, res, res, 1), np.float32)
    edit_attn[4:6, 4:6, 4:6] = 5.0
    obj_attn = np.full((res, res, res, 1), 1.0, np.float32)

    cfg = VoxelGridConfig(
        voxel_size=VoxelSize(*[3.0 / res] * 3),
        density_preactivation="identity",
        density_postactivation="softplus",
    )
    rcfg = SHVoxGridRenderConfig(
        num_samples_per_ray=8, camera_bounds=CameraBounds(2.0, 6.0), white_bkgd=True
    )

    def vm(attn):
        return VolumetricModel(
            VoxelGrid(jnp.asarray(dens), jnp.asarray(feats), cfg, attn=jnp.asarray(attn)),
            rcfg,
        )

    get_edit_region(
        vol_mod_edit=vm(edit_attn), vol_mod_object=vm(obj_attn),
        vol_mod_output=vm(np.zeros_like(edit_attn)),
        viz_dir=tmp_path, num_obj_voxels_thresh=1, min_num_edit_voxels=1,
        top_k_edit_thresh=5, top_k_obj_thresh=5,
    )
    for name in ("scatter3d_locations_0.png", "scatter3d_ids_0.png"):
        assert (tmp_path / name).exists(), name
