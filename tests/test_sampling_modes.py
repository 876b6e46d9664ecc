"""Linear-disparity sampling + NDC ray tests (real-scene path coverage)."""
import jax.numpy as jnp
import numpy as np

from voxe_tpu.render.rays import Rays, cast_rays, ndcize_rays
from voxe_tpu.render.sample import sample_uniform_points_on_rays
from voxe_tpu.utils.camera import CameraBounds, CameraIntrinsics


def test_linear_disparity_concentrates_samples_near():
    rays = Rays(jnp.zeros((2, 3)), jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (2, 1)))
    out = sample_uniform_points_on_rays(
        rays, CameraBounds(1.0, 100.0), num_samples=64, perturb=False,
        linear_disparity_sampling=True,
    )
    d = np.asarray(out.depths[0])
    # endpoints hit near/far; spacing grows with depth (inverse-depth uniform)
    assert d[0] == np.float32(1.0) or abs(d[0] - 1.0) < 1e-4
    assert abs(d[-1] - 100.0) < 1e-2
    gaps = np.diff(d)
    assert gaps[0] < gaps[-1] / 10  # strongly front-loaded
    # median sample well before the midpoint of the linear range
    assert d[32] < 10.0


def test_ndcize_rays_maps_into_unit_cube_directions():
    intr = CameraIntrinsics(64, 64, 64.0)
    rot = jnp.eye(3)
    trans = jnp.array([[0.0], [0.0], [0.0]])
    rays = cast_rays(intr, rot, trans)
    flat = Rays(rays.origins.reshape(-1, 3), rays.directions.reshape(-1, 3))
    ndc = ndcize_rays(flat, intr)
    o = np.asarray(ndc.origins)
    # origins on the z = -1+2*near/... plane; x/y within the canvas range
    assert np.isfinite(o).all()
    assert np.abs(o[:, :2]).max() <= 1.5
    d = np.asarray(ndc.directions)
    assert np.isfinite(d).all()
    # all NDC ray z-directions push toward the far plane (positive dz)
    assert (d[:, 2] > 0).all()
