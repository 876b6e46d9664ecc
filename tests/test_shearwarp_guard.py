"""Eye-inside-volume guard for the shear-warp fast path (VERDICT r4 weak-1).

The factorization requires the eye strictly before slice 0 along the marching
axis; `_render_canonical` clamps `e_k = min(e_k, -0.5)` which silently renders
wrong geometry for a camera inside the grid AABB. These tests pin the
host-side detection (`shear_warp_pose_margins` & co., render/shearwarp.py),
the trainer-setup hard failures, and the model facade's exact-renderer
fallback — no silent-corruption path stays reachable from the default-on
trainers (reference handles arbitrary eyes via the ray-AABB slab test,
thre3d_atom/rendering/volumetric/sample.py:71-184).
"""
import numpy as np
import pytest

from voxe_tpu.data.synthetic import make_demo_grid
from voxe_tpu.render.interface import SHVoxGridRenderConfig
from voxe_tpu.render.shearwarp import (
    check_shear_warp_hemisphere,
    check_shear_warp_poses,
    shear_warp_pose_margins,
    shear_warp_supports_pose,
)
from voxe_tpu.utils.camera import (
    CameraBounds,
    CameraIntrinsics,
    CameraPose,
    pose_spherical,
)


@pytest.fixture(scope="module")
def grid():
    return make_demo_grid(res=32)  # world size 3 -> AABB half-extent ~1.45


def _pose_at(eye, look_at=(0.0, 0.0, 0.0)):
    """Camera-to-world pose at `eye` looking toward `look_at` (OpenGL -z)."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(look_at, np.float64) - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(up, fwd)) > 0.99:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    rot = np.stack([right, true_up, -fwd], axis=1)  # columns: x, y, z(=-fwd)
    return CameraPose(rotation=rot, translation=eye.reshape(3, 1))


def test_orbit_pose_supported(grid):
    for yaw, pitch in [(40.0, 30.0), (220.0, 45.0), (0.0, 85.0)]:
        assert shear_warp_supports_pose(grid, pose_spherical(yaw, pitch, 4.0))


def test_inside_aabb_pose_rejected(grid):
    # camera at the grid center — inside along every axis
    assert not shear_warp_supports_pose(grid, _pose_at([0.1, 0.05, 0.02]))
    # camera inside, near a face, looking across the volume
    assert not shear_warp_supports_pose(grid, _pose_at([1.2, 0.0, 0.0]))


def test_margins_per_branch(grid):
    """Eye outside each of the 6 faces: margin = face distance in voxels."""
    vs = float(grid.config.voxel_size[0])
    half = (grid.grid_dims[0] - 1) / 2.0 * vs  # AABB half-extent
    for axis in range(3):
        for sign in (-1.0, 1.0):
            eye = np.zeros(3)
            eye[axis] = sign * (half + 10.0 * vs)  # 10 voxels beyond the face
            pose = _pose_at(eye)
            view = -pose.rotation[:, 2].reshape(1, 3)
            m = shear_warp_pose_margins(grid, eye.reshape(1, 3), view)[0]
            assert m == pytest.approx(10.0, abs=1e-6), (axis, sign, m)
            assert shear_warp_supports_pose(grid, pose)


def test_grazing_pose_rejected(grid):
    """An eye outside the AABB but within the 0.5-voxel clamp margin."""
    vs = float(grid.config.voxel_size[0])
    half = (grid.grid_dims[0] - 1) / 2.0 * vs
    eye = np.array([0.0, 0.0, half + 0.25 * vs])
    assert not shear_warp_supports_pose(grid, _pose_at(eye))


def test_check_poses_raises_with_context(grid):
    good = pose_spherical(40.0, 30.0, 4.0)
    bad = _pose_at([0.0, 0.0, 0.0], look_at=(1.0, 0.0, 0.0))
    poses = np.stack(
        [
            np.concatenate([p.rotation, np.reshape(p.translation, (3, 1))], 1)
            for p in (good, bad, good)
        ]
    )
    with pytest.raises(ValueError, match="inside.*marching axis"):
        check_shear_warp_poses(grid, poses, "unit test")
    # all-good pose sets pass silently
    check_shear_warp_poses(grid, poses[:1], "unit test")


def test_hemisphere_check(grid):
    # dog2-style orbit: radius 4 clears the world-size-3 grid everywhere
    check_shear_warp_hemisphere(grid, 4.0311, "unit test")
    # a radius inside the AABB diagonal must be rejected: at radius 1.0 the
    # eye is inside the grid for every pose
    with pytest.raises(ValueError, match="inside"):
        check_shear_warp_hemisphere(grid, 1.0, "unit test")
    # the r/sqrt(3) worst case: radius just above the half-extent is outside
    # the AABB corner-wise but inside along the dominant axis for oblique
    # poses — must be rejected too
    with pytest.raises(ValueError, match="inside"):
        check_shear_warp_hemisphere(grid, 1.8, "unit test")


def test_model_render_falls_back_to_exact(grid):
    """VolumetricModel.render(use_shear_warp=True) with an inside-volume
    camera must return the EXACT renderer's output (silent-corruption path
    closed with a per-pose fallback)."""
    from voxe_tpu.models.volumetric import VolumetricModel

    cfg = SHVoxGridRenderConfig(
        num_samples_per_ray=64,
        render_num_samples_per_ray=64,
        camera_bounds=CameraBounds(0.05, 6.0),
        white_bkgd=True,
        perturb_sampled_points=False,
    )
    vm = VolumetricModel(grid, cfg)
    intr = CameraIntrinsics(24, 24, 24.0)
    inside_pose = _pose_at([0.9, 0.0, 0.0])
    out_sw = vm.render(intr, inside_pose, use_shear_warp=True)
    out_exact = vm.render(intr, inside_pose)
    np.testing.assert_allclose(
        np.asarray(out_sw.colour), np.asarray(out_exact.colour), atol=1e-6
    )
    # a supported pose still takes the shear-warp path (differs from exact
    # by quadrature, so outputs are close but not identical)
    ok_pose = pose_spherical(40.0, 30.0, 4.0)
    out_sw2 = vm.render(intr, ok_pose, use_shear_warp=True)
    out_exact2 = vm.render(intr, ok_pose)
    assert not np.allclose(
        np.asarray(out_sw2.colour), np.asarray(out_exact2.colour), atol=1e-6
    )


def test_warp_dataset_to_base_rejects_inside_pose(grid):
    from voxe_tpu.train.recon import warp_dataset_to_base

    import jax.numpy as jnp

    intr = CameraIntrinsics(16, 16, 16.0)
    bad = _pose_at([0.0, 0.0, 0.0], look_at=(1.0, 0.0, 0.0))
    poses = np.concatenate([bad.rotation, bad.translation.reshape(3, 1)], 1)[
        None
    ]
    with pytest.raises(ValueError, match="shear-warp"):
        warp_dataset_to_base(
            jnp.zeros((1, 16, 16, 3)), jnp.asarray(poses), intr, grid, (16, 16)
        )


def test_all_axis_margins_and_tie_conservatism(grid):
    """The hemisphere check's tie handling (r5 review finding): per-axis
    margins must match the hand formula, and a pose AT an |v_x|=|v_y| tie
    must be judged by the WORST of the tied axes, not whichever argmax
    NumPy happens to pick."""
    from voxe_tpu.render.shearwarp import _all_axis_margins

    dims = np.array(grid.grid_dims, np.float64)
    vs = np.array(list(grid.config.voxel_size), np.float64)
    loc = np.array(list(grid.config.grid_location), np.float64)
    lo = loc - (dims - 1.0) / 2.0 * vs
    hi = loc + (dims - 1.0) / 2.0 * vs

    # eye outside +x face, marching toward -x (view_x < 0): margin along x is
    # (e_x - hi_x)/vs_x; along y (view_y > 0): (lo_y - e_y)/vs_y
    eye = np.array([[hi[0] + 2 * vs[0], lo[1] - 3 * vs[1], 0.0]])
    view = np.array([[-0.7, 0.7, -0.14]])
    m = _all_axis_margins(grid, eye, view)
    assert m.shape == (1, 3)
    np.testing.assert_allclose(m[0, 0], 2.0, atol=1e-9)
    np.testing.assert_allclose(m[0, 1], 3.0, atol=1e-9)

    # exact tie |v_x| == |v_y|: shear_warp_pose_margins picks ONE axis
    # (argmax tie-break), but a conservative caller must see BOTH margins —
    # here x clears by 2 voxels while y clears by 3: min over tied axes = 2
    assert float(np.min(m[0, :2])) == pytest.approx(2.0)
