"""Mid-run resume test: interrupted training continues bit-compatibly."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig
from voxe_tpu.train.checkpointing import load_training_state, save_training_state


def test_training_state_roundtrip(tmp_path, key):
    grid = VoxelGrid(
        jax.random.normal(key, (6, 6, 6, 1)),
        jax.random.normal(key, (6, 6, 6, 3)),
        VoxelGridConfig(),
    )
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(grid)
    # take one real update so opt_state has non-trivial moments
    grads = jax.tree_util.tree_map(jnp.ones_like, grid)
    updates, opt_state = optimizer.update(grads, opt_state, grid)
    grid = optax.apply_updates(grid, updates)

    state = {"grid": grid, "opt_state": opt_state, "key": key}
    meta = {"stage": 2, "stage_iteration": 17, "global_step": 42}
    path = tmp_path / "training_state_latest.pth"
    save_training_state(path, state, meta)

    template = {
        "grid": jax.tree_util.tree_map(jnp.zeros_like, grid),
        "opt_state": optimizer.init(jax.tree_util.tree_map(jnp.zeros_like, grid)),
        "key": jnp.zeros_like(key),
    }
    restored, meta2 = load_training_state(path, template)
    assert meta2 == meta
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_recon_resume_continues(tmp_path):
    """Train 2 stages; resume from the latest state and confirm training
    proceeds and completes with a final model."""
    from voxe_tpu.data.dataset import PosedImagesDataset
    from voxe_tpu.data.synthetic import generate_synthetic_scene
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.train.recon import train_sh_vox_grid_vol_mod_with_posed_images
    from voxe_tpu.grid.voxels import VoxelSize

    scene = generate_synthetic_scene(
        tmp_path / "scene", num_train=4, num_test=1, image_size=32, focal=32.0,
        grid_res=16,
    )
    ds = PosedImagesDataset(
        scene / "images", scene / "train_camera_params.json", rgba_white_bkgd=True
    )
    res = 16
    cfg = VoxelGridConfig(
        voxel_size=VoxelSize(*[3.0 / res] * 3),
        density_preactivation="identity",
        density_postactivation="softplus",
    )

    def make_model():
        return VolumetricModel(
            VoxelGrid(jnp.zeros((res, res, res, 1)), jnp.zeros((res, res, res, 3)), cfg),
            SHVoxGridRenderConfig(
                num_samples_per_ray=24, camera_bounds=ds.camera_bounds,
                white_bkgd=True, render_num_samples_per_ray=24,
                parallel_rays_chunk_size=2048,
            ),
        )

    common = dict(
        image_batch_cache_size=4, ray_batch_size=512, num_stages=2,
        num_iterations_per_stage=10, save_freq=5, test_freq=1000,
        feedback_freq=1000, summary_freq=1000, fast_debug_mode=True,
    )
    # run 1: full training (leaves training_state_latest.pth at final save)
    train_sh_vox_grid_vol_mod_with_posed_images(
        make_model(), ds, tmp_path / "run1", **common
    )
    latest = tmp_path / "run1" / "saved_models" / "training_state_latest.pth"
    assert latest.exists()

    # run 2: resume from run1's stage-2 state; should fast-forward stage 1
    # and still produce a final model
    out = train_sh_vox_grid_vol_mod_with_posed_images(
        make_model(), ds, tmp_path / "run2", resume_from=latest, **common
    )
    assert (tmp_path / "run2" / "saved_models" / "model_final.pth").exists()
    assert np.isfinite(np.asarray(out.grid.densities)).all()
