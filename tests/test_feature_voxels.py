"""FeatureVoxelGrid (hybrid grid+MLP, reference feature_voxels.py) tests:
query parity vs the plain grid under an identity head, end-to-end render,
trainability, rescaling, and pickle-free checkpoint roundtrip."""
import io
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from voxe_tpu.grid.feature_voxels import (
    FeatureVoxelGrid,
    FeatureVoxelGridConfig,
    apply_mlp,
    create_feature_voxel_grid,
    feature_grid_from_saved,
    feature_grid_query,
    feature_grid_save_arrays,
    init_mlp_params,
    scale_feature_voxel_grid,
)
from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize, grid_query
from voxe_tpu.render.interface import SHVoxGridRenderConfig, render_feature_voxel_grid
from voxe_tpu.render.rays import Rays, cast_rays, flatten_rays
from voxe_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical


def _make_grid(key, res=6, num_features=4, **cfg_kwargs):
    cfg = FeatureVoxelGridConfig(
        voxel_size=VoxelSize(3.0 / res, 3.0 / res, 3.0 / res), **cfg_kwargs
    )
    return create_feature_voxel_grid(key, (res, res, res), num_features, cfg)


def test_identity_head_matches_plain_grid_query(key):
    """With a single-layer identity rgbnet, the decoded query must equal the
    plain VoxelGrid query on the same tensors — validating interpolation
    placement and the pre/post-activation ordering (feature_voxels.py:317-354)."""
    res, F = 5, 3
    fv = _make_grid(key, res=res, num_features=F)
    identity_head = [(jnp.eye(F), jnp.zeros((F,)))]
    fv = fv.replace(rgbnet=identity_head)

    vg = VoxelGrid(
        fv.densities,
        fv.features,
        VoxelGridConfig(voxel_size=fv.config.voxel_size),
    )
    pts = jax.random.uniform(jax.random.PRNGKey(7), (64, 3), minval=-1.2, maxval=1.2)
    out_fv = np.asarray(feature_grid_query(fv, pts))
    out_vg = np.asarray(grid_query(vg, pts))
    np.testing.assert_allclose(out_fv, out_vg, atol=1e-6)


def test_mlp_final_bias_zero_and_shapes(key):
    params = init_mlp_params(key, in_dim=8, width=64, depth=4, out_dim=3)
    assert len(params) == 4
    assert params[0][0].shape == (8, 64)
    assert params[-1][0].shape == (64, 3)
    np.testing.assert_array_equal(np.asarray(params[-1][1]), 0.0)
    x = jnp.ones((10, 8))
    assert apply_mlp(params, x).shape == (10, 3)


def test_densitynet_gate(key):
    """use_densitynet routes interpolated density through the head (the
    reference ships this path commented out, feature_voxels.py:338)."""
    fv = _make_grid(key, use_densitynet=True)
    # densitynet == 2x scaling
    fv = fv.replace(densitynet=[(jnp.full((1, 1), 2.0), jnp.zeros((1,)))])
    pts = jnp.zeros((4, 3))
    out_on = feature_grid_query(fv, pts)
    fv_off = FeatureVoxelGrid(
        fv.densities,
        fv.features,
        fv.rgbnet,
        fv.densitynet,
        config=FeatureVoxelGridConfig(
            voxel_size=fv.config.voxel_size, use_densitynet=False
        ),
    )
    out_off = feature_grid_query(fv_off, pts)
    np.testing.assert_allclose(
        np.asarray(out_on[..., -1]), 2.0 * np.asarray(out_off[..., -1]), rtol=1e-5
    )


def test_render_feature_grid_end_to_end(key):
    fv = _make_grid(key, res=8, num_features=4)
    intr = CameraIntrinsics(16, 16, 10.0)
    pose = pose_spherical(30.0, 45.0, 4.0)
    rays = flatten_rays(
        cast_rays(intr, jnp.asarray(pose.rotation), jnp.asarray(pose.translation))
    )
    cfg = SHVoxGridRenderConfig(
        num_samples_per_ray=48, camera_bounds=CameraBounds(2.0, 6.0), white_bkgd=True
    )
    out = jax.jit(
        lambda g, r: render_feature_voxel_grid(g, r, cfg, key=None)
    )(fv, rays)
    img = np.asarray(out.colour)
    assert img.shape == (16 * 16, 3)
    assert np.isfinite(img).all()
    assert (img >= 0.0).all() and (img <= 1.0).all()


def test_feature_grid_trains(key):
    """The whole pytree (grid tensors + both MLP heads) is trainable with
    optax — a few Adam steps reduce a render-target loss and touch the
    rgbnet parameters."""
    fv = _make_grid(key, res=6, num_features=4)
    rays = Rays(
        jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (64, 1)),
        jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (64, 1)),
    )
    cfg = SHVoxGridRenderConfig(
        num_samples_per_ray=32, camera_bounds=CameraBounds(2.0, 6.0)
    )
    target = jnp.full((64, 3), 0.8)

    def loss_fn(grid):
        out = render_feature_voxel_grid(grid, rays, cfg, key=None)
        return jnp.mean((out.colour - target) ** 2)

    opt = optax.adam(1e-2)
    opt_state = opt.init(fv)

    @jax.jit
    def step(grid, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(grid)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(grid, updates), opt_state, loss, grads

    grid = fv
    losses = []
    for _ in range(15):
        grid, opt_state, loss, grads = step(grid, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8
    # gradient reached the MLP head
    g_norm = float(jnp.linalg.norm(grads.rgbnet[0][0]))
    assert g_norm > 0.0


def test_scale_feature_voxel_grid_preserves_aabb(key):
    fv = _make_grid(key, res=4, num_features=4)
    scaled = scale_feature_voxel_grid(fv, (8, 8, 8))
    assert scaled.grid_dims == (8, 8, 8)
    np.testing.assert_allclose(
        np.asarray(scaled.aabb), np.asarray(fv.aabb), rtol=1e-6
    )
    # heads carry over object-identical
    assert scaled.rgbnet is fv.rgbnet


def test_checkpoint_roundtrip(tmp_path, key):
    fv = _make_grid(key, res=5, num_features=4)
    arrays, meta = feature_grid_save_arrays(fv)
    path = tmp_path / "fvg.npz"
    np.savez(
        path,
        __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        **arrays,
    )
    with np.load(path) as data:
        meta2 = json.loads(bytes(data["__meta__"].tobytes()).decode())
        loaded = feature_grid_from_saved(data, meta2)
    pts = jax.random.uniform(jax.random.PRNGKey(3), (32, 3), minval=-1, maxval=1)
    np.testing.assert_allclose(
        np.asarray(feature_grid_query(loaded, pts)),
        np.asarray(feature_grid_query(fv, pts)),
        atol=0,
    )
    assert loaded.config == fv.config
