"""End-to-end edit + refinement pipeline test at tiny scale (random SD)."""
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from voxe_tpu.data.synthetic import generate_synthetic_scene
from voxe_tpu.data.dataset import PosedImagesDataset
from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
from voxe_tpu.models.sd import StableDiffusion, tiny_test_config
from voxe_tpu.models.volumetric import VolumetricModel, load_volumetric_model
from voxe_tpu.render.interface import SHVoxGridRenderConfig


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return generate_synthetic_scene(
        tmp_path_factory.mktemp("scene"),
        num_train=4, num_test=1, image_size=32, focal=32.0, grid_res=24,
    )


@pytest.fixture(scope="module")
def dataset(scene):
    return PosedImagesDataset(
        scene / "images", scene / "train_camera_params.json", rgba_white_bkgd=True
    )


@pytest.fixture(scope="module")
def sd():
    return StableDiffusion(config=tiny_test_config(), unet_dtype=jnp.float32)


def _pretrained_model(dataset, res=16):
    config = VoxelGridConfig(
        voxel_size=VoxelSize(*[3.0 / res] * 3),
        density_preactivation="identity",
        density_postactivation="softplus",
    )
    densities = np.full((res, res, res, 1), -5.0, dtype=np.float32)
    densities[4:12, 4:12, 4:12] = 10.0
    grid = VoxelGrid(
        jnp.asarray(densities), jnp.zeros((res, res, res, 3)), config
    )
    return VolumetricModel(
        grid,
        SHVoxGridRenderConfig(
            num_samples_per_ray=32,
            camera_bounds=dataset.camera_bounds,
            white_bkgd=True,
            render_num_samples_per_ray=48,
            parallel_rays_chunk_size=4096,
        ),
    )


def test_sds_edit_training_runs_and_changes_grid(dataset, sd, tmp_path):
    from voxe_tpu.train.sds import (
        train_sh_vox_grid_vol_mod_with_posed_images_and_sds,
    )

    pretrained = _pretrained_model(dataset)
    import copy

    sds_model = VolumetricModel(
        copy.deepcopy(pretrained.grid), pretrained.render_config
    )
    before = np.asarray(pretrained.grid.densities).copy()

    out = train_sh_vox_grid_vol_mod_with_posed_images_and_sds(
        sds_vol_mod=sds_model,
        pretrained_vol_mod=pretrained,
        train_dataset=dataset,
        image_dims=(32, 32),
        output_dir=tmp_path / "edit",
        ray_batch_size=1024,
        num_iterations=4,
        sds_prompt="a yarn doll",
        density_correlation_weight=200.0,
        summary_freq=2,
        feedback_freq=100,
        save_freq=100,
        sd_model=sd,
        fast_debug_mode=True,
    )
    after = np.asarray(out.grid.densities)
    assert not np.allclose(before, after)  # SDS gradients reached the grid
    final = tmp_path / "edit" / "saved_models" / "model_final.pth"
    assert final.exists()
    # ref grid must be untouched
    np.testing.assert_array_equal(before, np.asarray(pretrained.grid.densities))


@pytest.mark.parametrize("use_shear_warp", [False, True], ids=["exact", "shearwarp"])
def test_refinement_pipeline_end_to_end(dataset, sd, tmp_path, use_shear_warp):
    from voxe_tpu.train.refine import refine_edited_relu_field

    pretrained = _pretrained_model(dataset)
    edited = _pretrained_model(dataset)
    # make the "edited" grid differ inside a sub-blob
    dens = np.asarray(edited.grid.densities).copy()
    dens[8:12, 8:12, 8:12] += 3.0
    attn = jnp.full_like(edited.grid.densities, -20.0)

    def with_attn(model):
        return VolumetricModel(
            model.grid.replace(
                densities=jnp.asarray(dens), attn=attn
            ),
            model.render_config,
        )

    vm_edit, vm_obj, vm_out = (
        with_attn(edited),
        with_attn(edited),
        with_attn(edited),
    )

    refine_edited_relu_field(
        vol_mod_edit=vm_edit,
        vol_mod_object=vm_obj,
        vol_mod_output=vm_out,
        vol_mod_ref=pretrained,
        train_dataset=dataset,
        output_dir=tmp_path / "refine",
        prompt="a dog wearing a party hat",
        edit_idx=[4, 5],
        timestamp=200,
        image_dims=(32, 32),
        num_iterations=3,
        summary_freq=1,
        feedback_freq=100,
        save_freq=100,
        num_obj_voxels_thresh=100,
        min_num_edit_voxels=5,
        top_k_edit_thresh=20,
        top_k_obj_thresh=20,
        sd_model=sd,
        fast_debug_mode=True,
        use_shear_warp=use_shear_warp,
    )

    saved = tmp_path / "refine" / "saved_models"
    assert (saved / "model_final_attn_edit.pth").exists()
    assert (saved / "model_final_attn_object.pth").exists()
    assert (saved / "model_final_refined.pth").exists()

    refined, _ = load_volumetric_model(saved / "model_final_refined.pth", with_attn=True)
    keep = np.asarray(refined.grid.attn)
    # the keep grid carries the graph-cut labels {-10, -5, 0}
    assert set(np.unique(keep)).issubset({-10.0, -5.0, 0.0})
    # attn training actually moved the attn grids
    assert not np.allclose(np.asarray(vm_edit.grid.attn), np.asarray(attn))


def test_refinement_sharded_matches_unsharded(dataset, sd, tmp_path):
    """8-way mesh DP through the refinement attn-grid updates reproduces
    single-device numerics (VERDICT round-1: refine step had no mesh
    numerics coverage)."""
    from voxe_tpu.parallel.mesh import make_mesh
    from voxe_tpu.train.refine import refine_edited_relu_field

    def run(mesh, out):
        pretrained = _pretrained_model(dataset)
        edited = _pretrained_model(dataset)
        attn = jnp.full_like(edited.grid.densities, -20.0)

        def with_attn(model):
            return VolumetricModel(
                model.grid.replace(attn=attn), model.render_config
            )

        vm_edit, vm_obj, vm_out = (
            with_attn(edited), with_attn(edited), with_attn(edited),
        )
        refine_edited_relu_field(
            vol_mod_edit=vm_edit,
            vol_mod_object=vm_obj,
            vol_mod_output=vm_out,
            vol_mod_ref=pretrained,
            train_dataset=dataset,
            output_dir=out,
            prompt="a dog wearing a party hat",
            edit_idx=[4, 5],
            timestamp=200,
            image_dims=(32, 32),
            num_iterations=2,
            summary_freq=10,
            feedback_freq=100,
            save_freq=100,
            num_obj_voxels_thresh=100,
            min_num_edit_voxels=5,
            top_k_edit_thresh=20,
            top_k_obj_thresh=20,
            sd_model=sd,
            fast_debug_mode=True,
            use_shear_warp=True,
            mesh=mesh,
        )
        return np.asarray(vm_edit.grid.attn)

    single = run(None, tmp_path / "r1")
    sharded = run(make_mesh(8), tmp_path / "r8")
    np.testing.assert_allclose(single, sharded, atol=3e-5)


def test_refine_multi_step_matches_manual_loop(dataset, sd):
    """The fused K-step refinement scan (make_refine_multi_step) reproduces
    K manual calls of the single fused iteration fed the same per-step keys,
    poses, and direction-selected token data."""
    import jax
    import optax

    from voxe_tpu.train.refine import (
        make_refine_iter_shearwarp,
        make_refine_multi_step,
    )
    from voxe_tpu.train.sds import HEMISPHERICAL_RADIUS_CONSTANT
    from voxe_tpu.utils.camera import random_pose_jax

    K = 3
    model = _pretrained_model(dataset)
    base_grid = model.grid.replace(
        attn=jnp.full_like(model.grid.densities, -20.0)
    )
    opt_e = optax.adam(1e-2)
    opt_o = optax.adam(1e-2)
    sw_hw = (32, 32)
    prompt = "a dog wearing a party hat"
    dirs = ("side", "overhead", "back", "front")
    text_by_dir = jnp.stack(
        [sd.get_text_embeds(prompt + f", {d} view", "") for d in dirs]
    )
    bucket = 8
    idxs = jnp.tile(jnp.arange(1, bucket + 1, dtype=jnp.int32)[None], (4, 1))
    emask = jnp.zeros((4, bucket)).at[:, 3:5].set(1.0)
    omask = 1.0 - emask

    common = (sd, model.render_config, opt_e, opt_o, base_grid, sw_hw, 200, 1e-3)
    multi = make_refine_multi_step(
        *common, steps_per_call=K, radius=HEMISPHERICAL_RADIUS_CONSTANT
    )
    single = make_refine_iter_shearwarp(*common)

    edit_attn = base_grid.attn
    obj_attn = base_grid.attn
    st_e = opt_e.init(edit_attn)
    st_o = opt_o.init(obj_attn)
    key = jax.random.PRNGKey(7)

    got = multi(
        edit_attn, obj_attn, st_e, st_o, sd.params,
        text_by_dir, idxs, emask, omask, key,
    )

    # manual replay with the body's exact key/pose/direction derivation
    e, o, se, so = edit_attn, obj_attn, st_e, st_o
    for step_key in jax.random.split(key, K):
        k_pose, k_iter = jax.random.split(step_key)
        rot, trans, pitch_deg, yaw_deg = random_pose_jax(
            k_pose, HEMISPHERICAL_RADIUS_CONSTANT
        )
        d = 3
        if 45.0 < float(yaw_deg) < 315.0:
            d = 0
        if 120.0 < float(yaw_deg) < 240.0:
            d = 2
        if float(pitch_deg) < 25.0:
            d = 1
        e, o, se, so, _ = single(
            e, o, se, so, sd.params, text_by_dir[d], rot,
            trans.reshape(3, 1), idxs[d], emask[d], omask[d], k_iter,
        )

    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(e), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(o), atol=2e-5)


def test_refinement_fused_end_to_end(dataset, sd, tmp_path):
    """The trainer's fused path (steps_per_call > 1) runs the whole
    refinement stage — chunked scan loop, graph cut, merge, saves."""
    from voxe_tpu.train.refine import refine_edited_relu_field

    pretrained = _pretrained_model(dataset)
    edited = _pretrained_model(dataset)
    attn = jnp.full_like(edited.grid.densities, -20.0)

    def with_attn(model):
        return VolumetricModel(
            model.grid.replace(attn=attn), model.render_config
        )

    vm_edit, vm_obj, vm_out = (
        with_attn(edited), with_attn(edited), with_attn(edited),
    )
    refine_edited_relu_field(
        vol_mod_edit=vm_edit,
        vol_mod_object=vm_obj,
        vol_mod_output=vm_out,
        vol_mod_ref=pretrained,
        train_dataset=dataset,
        output_dir=tmp_path / "refine_fused",
        prompt="a dog wearing a party hat",
        edit_idx=[4, 5],
        timestamp=200,
        image_dims=(32, 32),
        num_iterations=4,
        summary_freq=2,
        feedback_freq=100,
        save_freq=100,
        num_obj_voxels_thresh=100,
        min_num_edit_voxels=5,
        top_k_edit_thresh=20,
        top_k_obj_thresh=20,
        sd_model=sd,
        fast_debug_mode=True,
        use_shear_warp=True,
        steps_per_call=2,
    )
    saved = tmp_path / "refine_fused" / "saved_models"
    assert (saved / "model_final_refined.pth").exists()
    assert not np.allclose(np.asarray(vm_edit.grid.attn), np.asarray(attn))


def test_refine_fused_loop_runs_exact_iteration_budget(
    dataset, sd, tmp_path, monkeypatch
):
    """num_iterations not a multiple of steps_per_call: the fused refinement
    loop must run EXACTLY num_iterations attn-grid updates (remainder-sized
    scan for the last chunk), not round up to a full chunk."""
    import voxe_tpu.train.refine as refine_mod
    from voxe_tpu.train.refine import refine_edited_relu_field

    executed = []
    real_builder = refine_mod.make_refine_multi_step

    def counting_builder(*args, **kwargs):
        k = args[8]  # (..., sw_hw, timestamp, attn_tv_weight, K, radius)
        fn = real_builder(*args, **kwargs)

        def wrapped(*a, **kw):
            executed.append(k)
            return fn(*a, **kw)

        return wrapped

    monkeypatch.setattr(refine_mod, "make_refine_multi_step", counting_builder)
    pretrained = _pretrained_model(dataset)
    edited = _pretrained_model(dataset)
    attn = jnp.full_like(edited.grid.densities, -20.0)

    def with_attn(model):
        return VolumetricModel(
            model.grid.replace(attn=attn), model.render_config
        )

    refine_edited_relu_field(
        vol_mod_edit=with_attn(edited),
        vol_mod_object=with_attn(edited),
        vol_mod_output=with_attn(edited),
        vol_mod_ref=pretrained,
        train_dataset=dataset,
        output_dir=tmp_path / "refine_budget",
        prompt="a dog wearing a party hat",
        edit_idx=[4, 5],
        timestamp=200,
        image_dims=(32, 32),
        num_iterations=3,
        summary_freq=10,
        feedback_freq=100,
        save_freq=100,
        num_obj_voxels_thresh=100,
        min_num_edit_voxels=5,
        top_k_edit_thresh=20,
        top_k_obj_thresh=20,
        sd_model=sd,
        fast_debug_mode=True,
        use_shear_warp=True,
        steps_per_call=2,
    )
    assert executed == [2, 1], executed  # 3 updates total, never 4


def test_refine_timestamp_zero_draws_random_timestep(dataset, sd):
    """timestamp<=0 on the fused shear-warp path means 'fresh random
    timestep per iteration' (parity with sd.get_attn_map,
    models/sd/sds.py:382-385): the t<=0 iteration must equal a
    fixed-timestamp iteration run at exactly the drawn t."""
    import jax
    import optax

    from voxe_tpu.train.refine import make_refine_iter_shearwarp

    pretrained = _pretrained_model(dataset)
    base_grid = pretrained.grid.replace(
        attn=jnp.full_like(pretrained.grid.densities, -20.0)
    )
    rc = pretrained.render_config
    opt = optax.adam(1e-2)
    key = jax.random.PRNGKey(7)
    # replicate the core's 5-way split to find the t it will draw
    _, _, k_t, _, _ = jax.random.split(key, 5)
    t_drawn = int(sd.sample_timestep(k_t))
    assert t_drawn > 0

    from voxe_tpu.utils.camera import pose_spherical

    pose = pose_spherical(30.0, 40.0, 4.0311)
    rot = jnp.asarray(pose.rotation)
    trans = jnp.asarray(pose.translation).reshape(3, 1)
    text = sd.get_text_embeds("a dog wearing a party hat, front view", "")
    idxs = jnp.arange(1, 9, dtype=jnp.int32)
    emask = jnp.zeros((8,)).at[3:5].set(1.0)
    omask = 1.0 - emask
    # start from an ACTIVE attn state (sigmoid(0)=0.5): the masked-L1 loss
    # only counts pixels whose attn render is positive, and at -20 the mask
    # is empty, making the update t-independent (TV only)
    attn0 = jnp.zeros_like(base_grid.attn)

    def run(timestamp):
        it = make_refine_iter_shearwarp(
            sd, rc, opt, opt, base_grid, (16, 16),
            timestamp=timestamp, attn_tv_weight=1e-3,
        )
        e, o, _, _, m = it(
            attn0, attn0, opt.init(attn0), opt.init(attn0), sd.params,
            text, rot, trans, idxs, emask, omask, key,
        )
        return np.asarray(e), np.asarray(o)

    e_rand, o_rand = run(0)
    e_fixed, o_fixed = run(t_drawn)
    np.testing.assert_allclose(e_rand, e_fixed, atol=1e-6)
    np.testing.assert_allclose(o_rand, o_fixed, atol=1e-6)
    # a different fixed t produces a different update (sanity that t matters)
    e_other, _ = run(t_drawn + 37 if t_drawn + 37 < 1000 else t_drawn - 37)
    assert not np.allclose(e_rand, e_other)
