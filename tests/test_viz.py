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
