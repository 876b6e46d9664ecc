"""Camera types, spherical pose math, and animation camera paths.

Behavioral parity with the reference pose conventions
(reference: thre3d_atom/utils/imaging_utils.py:17-258): OpenGL-style camera
(+x right, +y up, looking down -z), poses built as yaw @ pitch @ translate_z.

TPU-first notes: pose construction is tiny host-side math, so it lives in
NumPy; `random_pose_jax` additionally provides a `jax.random`-keyed variant so
training loops can draw poses inside a jitted step without host round-trips.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import numpy as np

try:  # jax is optional for the pure-host utilities in this module
    import jax
    import jax.numpy as jnp

    _HAS_JAX = True
except Exception:  # pragma: no cover
    _HAS_JAX = False


class CameraIntrinsics(NamedTuple):
    height: int
    width: int
    focal: float


class CameraPose(NamedTuple):
    rotation: np.ndarray  # [3, 3]
    translation: np.ndarray  # [3, 1]


class CameraBounds(NamedTuple):
    near: float
    far: float


# ----------------------------------------------------------------------------------
# dynamic range helpers
# ----------------------------------------------------------------------------------


def adjust_dynamic_range(data, drange_in, drange_out, slack: bool = False):
    """Linearly remap `data` from `drange_in` to `drange_out`.

    With ``slack=True`` the mapping is a pure affine transform (no clipping),
    matching the voxel-grid point normalization of the reference
    (reference: thre3d_atom/utils/imaging_utils.py:42-71).
    """
    if tuple(drange_in) == tuple(drange_out):
        return data
    scale = (np.float32(drange_out[1]) - np.float32(drange_out[0])) / (
        np.float32(drange_in[1]) - np.float32(drange_in[0])
    )
    if slack:
        bias = np.float32(drange_out[0]) - np.float32(drange_in[0]) * scale
        return data * scale + bias
    out = (data - np.float32(drange_in[0])) * scale + np.float32(drange_out[0])
    return out.clip(drange_out[0], drange_out[1])


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def get_2d_coordinates(height: int, width: int, drange=(-1.0, 1.0)) -> np.ndarray:
    """[H, W, 2] meshgrid of coordinates in `drange`
    (reference: thre3d_atom/utils/imaging_utils.py:74-85)."""
    ys = np.linspace(drange[0], drange[1], height, dtype=np.float32)
    xs = np.linspace(drange[0], drange[1], width, dtype=np.float32)
    grid_y, grid_x = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([grid_y, grid_x], axis=-1)


def scale_camera_intrinsics(
    camera_intrinsics: CameraIntrinsics, scale_factor: float = 1.0
) -> CameraIntrinsics:
    return CameraIntrinsics(
        height=int(np.ceil(camera_intrinsics.height * scale_factor)),
        width=int(np.ceil(camera_intrinsics.width * scale_factor)),
        focal=camera_intrinsics.focal * scale_factor,
    )


# ----------------------------------------------------------------------------------
# spherical pose construction
# ----------------------------------------------------------------------------------


def _translate_z(z: float) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[2, 3] = z
    return m


def _rotate_pitch(pitch: float) -> np.ndarray:
    c, s = np.cos(pitch), np.sin(pitch)
    m = np.eye(4, dtype=np.float32)
    m[1, 1], m[1, 2] = c, -s
    m[2, 1], m[2, 2] = s, c
    return m


def _rotate_yaw(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 1] = c, -s
    m[1, 0], m[1, 1] = s, c
    return m


def pose_spherical(yaw: float, pitch: float, radius: float) -> CameraPose:
    """Camera-to-world pose on a sphere (yaw/pitch in degrees).

    (reference: thre3d_atom/utils/imaging_utils.py:188-194)
    """
    c2w = _translate_z(radius)
    c2w = _rotate_pitch(pitch / 180.0 * np.pi) @ c2w
    c2w = _rotate_yaw(yaw / 180.0 * np.pi) @ c2w
    return CameraPose(rotation=c2w[:3, :3], translation=c2w[:3, 3:])


def classify_view_direction(pitch_deg: float, yaw_deg: float) -> str:
    """Bucket a hemisphere pose into {front, side, back, overhead}.

    (reference: thre3d_atom/utils/imaging_utils.py:206-214)
    """
    direction = "front"
    if 45.0 < yaw_deg < 315.0:
        direction = "side"
    if 120.0 < yaw_deg < 240.0:
        direction = "back"
    if pitch_deg < 25.0:
        direction = "overhead"
    return direction


def get_random_pose(
    radius: float, rng: np.random.Generator | None = None
) -> Tuple[CameraPose, str, float, float]:
    """Random hemisphere pose: pitch ~ U[15, 90], yaw ~ U[0, 360).

    Returns (pose, direction_label, pitch_deg, yaw_deg)
    (reference: thre3d_atom/utils/imaging_utils.py:197-215)
    """
    rng = rng if rng is not None else np.random.default_rng()
    rand_pitch = 15.0 + float(rng.random()) * 75.0
    rand_yaw = float(rng.random()) * 360.0
    pose = pose_spherical(rand_yaw, rand_pitch, radius)
    return pose, classify_view_direction(rand_pitch, rand_yaw), rand_pitch, rand_yaw


# jax variant: draw pose parameters with a PRNG key (device-side friendly)
if _HAS_JAX:

    def random_pose_jax(key, radius: float):
        """Keyed random hemisphere pose returning (rotation[3,3], translation[3,1],
        pitch_deg, yaw_deg) as jnp arrays; same distribution as `get_random_pose`."""
        kp, ky = jax.random.split(key)
        pitch_deg = 15.0 + jax.random.uniform(kp) * 75.0
        yaw_deg = jax.random.uniform(ky) * 360.0
        pitch = pitch_deg * (jnp.pi / 180.0)
        yaw = yaw_deg * (jnp.pi / 180.0)
        cp, sp = jnp.cos(pitch), jnp.sin(pitch)
        cy, sy = jnp.cos(yaw), jnp.sin(yaw)
        rot_pitch = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]]
        ).at[1, 1].set(cp).at[1, 2].set(-sp).at[2, 1].set(sp).at[2, 2].set(cp)
        rot_yaw = (
            jnp.eye(3).at[0, 0].set(cy).at[0, 1].set(-sy).at[1, 0].set(sy).at[1, 1].set(cy)
        )
        rotation = rot_yaw @ rot_pitch
        translation = rotation @ jnp.array([[0.0], [0.0], [radius]])
        return rotation, translation, pitch_deg, yaw_deg


# ----------------------------------------------------------------------------------
# animation camera paths
# ----------------------------------------------------------------------------------


def get_thre360_animation_poses(
    hemispherical_radius: float, camera_pitch: float, num_poses: int
) -> Sequence[CameraPose]:
    """Turntable: constant pitch, yaw sweeping 0..360 (last pose dropped).

    (reference: thre3d_atom/utils/imaging_utils.py:223-232)
    """
    return [
        pose_spherical(yaw, camera_pitch, hemispherical_radius)
        for yaw in np.linspace(0, 360, num_poses)[:-1]
    ]


def get_thre360_spiral_animation_poses(
    horizontal_radius_range: Tuple[float, float],
    vertical_camera_height: float,
    num_rounds: int,
    num_poses: int,
) -> Sequence[CameraPose]:
    """Spiral path (reference: thre3d_atom/utils/imaging_utils.py:235-258)."""
    horizontal_radii = np.linspace(*horizontal_radius_range, num_poses)[:-1]
    hemispherical_radii = [
        np.sqrt(hr**2 + vertical_camera_height**2) for hr in horizontal_radii
    ]
    yaws = np.linspace(0, 360 * num_rounds, num_poses)[:-1]
    pitches = [
        math.atan(hr / vertical_camera_height) * 180 / math.pi
        for hr in horizontal_radii
    ]
    return [
        pose_spherical(yaw, pitch, radius)
        for yaw, pitch, radius in zip(yaws, pitches, hemispherical_radii)
    ]
